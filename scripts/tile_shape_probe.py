#!/usr/bin/env python3
"""Probe: would a squarer pixel->vreg tile mapping tighten slice bounds?

The kernels process one 1024-pixel tile per vreg set; the screen footprint
of that tile is currently 8 (high) x 128 (wide).  The per-(tile, brick)
slice bounds hull the 4 corner rays, so the tile's screen DIAMETER sets
how much the entry/exit slice range is inflated relative to a single ray
(~128 px diagonal today).  This probe recomputes the shipped bounding
algorithm (8x8 block occupancy, 4-slice segments, two-band chord split)
and the per-ray ideal for candidate tile shapes, host-side only.

Marched slice-iterations is the deterministic unit (the kernel retires
~10.7 Gsamples/s = tile_pixels x iters / t on v5e, README).
"""

from __future__ import annotations

import math
import sys
import time

import numpy as np


def build(name):
    from bench import build_shell_scene, build_three_level_scene
    from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer
    from amrvolumerenderer_tpu.types import (
        RenderParameters,
        color_map_from_tuples,
    )

    if name == "shell_tf":
        geom = build_shell_scene()
        fsr = FastSceneRenderer(geom, RenderParameters(width=1024, height=1024))
        fsr.set_transfer_function(color_map=color_map_from_tuples([
            (0.0, 0, 0, 0, 0.0), (0.3, 0, 0, 0, 0.0),
            (0.5, 1.0, 0.5, 0.2, 0.4), (1.0, 1.0, 1.0, 1.0, 0.8),
        ]))
    else:
        geom = build_three_level_scene()
        fsr = FastSceneRenderer(geom, RenderParameters(width=1024, height=1024))
    return fsr


def shipped_iters(fsr, camera, tile_w, tile_h, seg_len=4, min_gap=6):
    """The production bounding pipeline re-run for an arbitrary tile shape:
    worklist -> per-item footprint x block occupancy -> band split."""
    from amrvolumerenderer_tpu.camera import (
        camera_basis,
        compute_box_depth_hints,
    )
    from amrvolumerenderer_tpu.ops import slicemarch as sm
    from amrvolumerenderer_tpu.ops import tilemarch as tm

    width = height = 1024
    forward, right, up = camera_basis(camera)
    axis = sm.choose_march_axis(forward)
    axes = [axis] + [a for a in range(3) if a != axis]
    num = fsr.canonical.shape[0]
    meta = np.zeros((num, 12), np.float64)
    meta[:, 0:3] = fsr.box_min[:, axes]
    meta[:, 3:6] = fsr.box_max[:, axes]
    dw = fsr.dims_world[:, axes].astype(np.float64)
    meta[:, 6:9] = (fsr.box_max[:, axes] - fsr.box_min[:, axes]) / dw
    range_min = fsr.scalar_range[0]
    span_v = fsr.scalar_range[1] - range_min
    inv_range = 1.0 / span_v if span_v != 0.0 else 1.0
    smin, smax = fsr._slice_minmax[axis]
    n_slices = fsr.dims_world[:, axes][:, 0].astype(np.int32)
    brick_bounds = sm.compute_slice_bounds_batch(
        smin, smax, fsr._lut_alpha, range_min, inv_range, n_slices
    )

    # ---- worklist at this tile shape (same bbox rasterization) ----
    lo_x, hi_x, lo_y, hi_y, behind = sm.project_screen_bboxes(
        fsr.box_min, fsr.box_max, np.asarray(camera.eye), forward, right, up,
        camera.fov_y_degrees, width, height,
    )
    tiles_x, tiles_y = width // tile_w, height // tile_h
    tx0 = np.clip((lo_x - 1).astype(np.int64) // tile_w, 0, tiles_x - 1)
    tx1 = np.clip((hi_x + 1).astype(np.int64) // tile_w, 0, tiles_x - 1)
    ty0 = np.clip((lo_y - 1).astype(np.int64) // tile_h, 0, tiles_y - 1)
    ty1 = np.clip((hi_y + 1).astype(np.int64) // tile_h, 0, tiles_y - 1)
    tx0 = np.where(behind, 0, tx0)
    tx1 = np.where(behind, tiles_x - 1, tx1)
    ty0 = np.where(behind, 0, ty0)
    ty1 = np.where(behind, tiles_y - 1, ty1)
    offs = (~behind) & ((hi_x < 0) | (lo_x > width) | (hi_y < 0) | (lo_y > height))
    txg, tyg = np.arange(tiles_x), np.arange(tiles_y)
    in_x = (txg[None] >= tx0[:, None]) & (txg[None] <= tx1[:, None])
    in_y = (tyg[None] >= ty0[:, None]) & (tyg[None] <= ty1[:, None])
    cov = (in_y[:, :, None] & in_x[:, None, :]).reshape(num, -1)
    cov[offs] = False
    wb, wt = np.nonzero(cov)
    keep = fsr.visible[wb]
    wb, wt = wb[keep].astype(np.int64), wt[keep].astype(np.int64)

    # ---- footprints (corner rays of the tile_w x tile_h pixel rect) ----
    tx = wt % tiles_x
    ty = wt // tiles_x
    px = np.stack([tx * tile_w + 0.5, tx * tile_w + tile_w - 0.5], -1)
    py = np.stack([ty * tile_h + 0.5, ty * tile_h + tile_h - 0.5], -1)
    tan_half = math.tan(math.radians(camera.fov_y_degrees) * 0.5)
    aspect = width / height
    plane_x = (px * (2.0 / width) - 1.0) * tan_half * aspect
    plane_y = (py * (2.0 / height) - 1.0) * tan_half
    cx = plane_x[:, [0, 0, 1, 1]]
    cy = plane_y[:, [0, 1, 0, 1]]
    dirs = (np.asarray(forward, np.float64)[None, None]
            + cx[:, :, None] * np.asarray(right, np.float64)
            + cy[:, :, None] * np.asarray(up, np.float64))
    dp = dirs[:, :, list(axes)]
    eye_p = np.asarray(camera.eye, np.float64)[list(axes)]
    pmin = meta[wb, 0:3]
    cell = meta[wb, 6:9]
    d_a = dp[:, :, 0]
    sign_ok = (np.abs(d_a) > 1e-8).all(1) & ((d_a > 0).all(1) | (d_a < 0).all(1))
    cap = fsr._slice_quad_minmax[axis][0].shape[1]
    n_seg = (cap + seg_len - 1) // seg_len
    ks = np.minimum(np.arange(n_seg + 1) * seg_len, cap - 1)
    z = pmin[:, 0:1] + (ks[None] + 0.5) * cell[:, 0:1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (z[:, None, :] - eye_p[0]) / d_a[:, :, None]
        ok = sign_ok & (t > 0).all(axis=(1, 2))
        u_pts = eye_p[1] + t * dp[:, :, 1:2]
        v_pts = eye_p[2] + t * dp[:, :, 2:3]
        cu = (u_pts - pmin[:, 1:2, None]) / cell[:, 1:2, None] + fsr.ghost
        cv = (v_pts - pmin[:, 2:3, None]) / cell[:, 2:3, None] + fsr.ghost
    margin = fsr.ghost + 2.0
    cu_lo = np.minimum(cu.min(1)[:, :-1], cu.min(1)[:, 1:]) - margin
    cu_hi = np.maximum(cu.max(1)[:, :-1], cu.max(1)[:, 1:]) + margin
    cv_lo = np.minimum(cv.min(1)[:, :-1], cv.min(1)[:, 1:]) - margin
    cv_hi = np.maximum(cv.max(1)[:, :-1], cv.max(1)[:, 1:]) + margin

    from amrvolumerenderer_tpu.ops import tilemarch as tm2
    qmin, qmax = fsr._slice_quad_minmax[axis]
    occ_bits = tm2.block_occupancy_bits(
        qmin, qmax, fsr._lut_alpha, range_min, inv_range
    )
    nq = fsr._quad_blocks
    su = float(fsr._quad_split)
    qrange = np.arange(nq)
    eu_lo = (su * qrange)[None, None]
    eu_hi = eu_lo + su
    qu = (cu_lo[..., None] < eu_hi) & (cu_hi[..., None] > eu_lo)
    qv = (cv_lo[..., None] < eu_hi) & (cv_hi[..., None] > eu_lo)
    shift_u = np.arange(nq, dtype=np.uint64) * np.uint64(nq)
    fu = (qu.astype(np.uint64) << shift_u).sum(2, dtype=np.uint64)
    fv = (qv.astype(np.uint64) << np.arange(nq, dtype=np.uint64)).sum(
        2, dtype=np.uint64)
    fmask = fu * fv
    seg_of = np.minimum(np.arange(cap) // seg_len, n_seg - 1)
    sel = (fmask[:, seg_of] & occ_bits[wb]) != 0
    bb = brick_bounds.astype(np.int64)[wb]
    blo, bhi = bb >> 16, bb & 0xFFFF
    s_idx = np.arange(cap)[None]
    sel &= (s_idx >= blo[:, None]) & (s_idx < bhi[:, None])
    any_occ = sel.any(1)
    lo = np.argmax(sel, 1)
    hi = cap - np.argmax(sel[:, ::-1], 1)
    packed = np.where(any_occ, (lo << 16) | hi, (bhi << 16) | bhi)
    bounds = np.where(ok & (bhi > blo), packed, bb).astype(np.int32)
    b1, b2 = tm2.find_second_bands(sel, bounds, ok, min_gap=min_gap)
    fwd = (d_a > 0).all(1)
    _wt2, _wb2, _ow2, ib2 = tm2.expand_bands(wt, wb, wb * 0, b1, b2, fwd)
    ib2 = ib2.astype(np.int64)
    sp = np.maximum((ib2 & 0xFFFF) - (ib2 >> 16), 0)
    return int(sp.sum()), int((sp > 0).sum()), wb, wt, blo, bhi, meta, axes


def ray_exact(fsr, camera, wb, wt, blo, bhi, meta, axes, tile_w, tile_h):
    from amrvolumerenderer_tpu.camera import camera_basis

    width = height = 1024
    forward, right, up = camera_basis(camera)
    axis = axes[0]
    v = np.moveaxis(np.asarray(fsr.canonical, np.float32), 1 + axis, 1)
    g = fsr.ghost
    if g:
        v = v[:, g: v.shape[1] - g]
    range_min = fsr.scalar_range[0]
    span_v = fsr.scalar_range[1] - range_min
    inv_range = 1.0 / span_v if span_v != 0.0 else 1.0
    idx = np.clip((np.clip((v - range_min) * inv_range, 0, 1) * 255)
                  .astype(np.int32), 0, 255)
    occ_cell = fsr._lut_alpha[idx] > 0.0
    L, S, U, V = occ_cell.shape
    tiles_x = width // tile_w
    tan_half = math.tan(math.radians(camera.fov_y_degrees) * 0.5)
    aspect = width / height
    eye_p = np.asarray(camera.eye, np.float64)[list(axes)]
    fvec = np.asarray(forward, np.float64)[list(axes)]
    rvec = np.asarray(right, np.float64)[list(axes)]
    uvec = np.asarray(up, np.float64)[list(axes)]
    total = 0
    for i in range(len(wb)):
        b, t_id = int(wb[i]), int(wt[i])
        tx, ty = t_id % tiles_x, t_id // tiles_x
        pxs = tx * tile_w + np.arange(tile_w) + 0.5
        pys = ty * tile_h + np.arange(tile_h) + 0.5
        plane_x = (pxs * (2.0 / width) - 1.0) * tan_half * aspect
        plane_y = (pys * (2.0 / height) - 1.0) * tan_half
        d = (fvec[None, None] + plane_x[None, :, None] * rvec
             + plane_y[:, None, None] * uvec)
        d_a = d[..., 0]
        if np.any(np.abs(d_a) < 1e-12):
            total += int(bhi[i] - blo[i])
            continue
        pmin, cell = meta[b, 0:3], meta[b, 6:9]
        ks = np.arange(int(blo[i]), int(bhi[i]))
        if not len(ks):
            continue
        z = pmin[0] + (ks + 0.5) * cell[0]
        t = (z[:, None, None] - eye_p[0]) / d_a[None]
        pu = eye_p[1] + t * d[None, ..., 1]
        pv = eye_p[2] + t * d[None, ..., 2]
        iu = np.floor((pu - pmin[1]) / cell[1]).astype(np.int64)
        iv = np.floor((pv - pmin[2]) / cell[2]).astype(np.int64)
        inside = (t > 0) & (iu >= 0) & (iu < U) & (iv >= 0) & (iv < V)
        iu = np.clip(iu, 0, U - 1)
        iv = np.clip(iv, 0, V - 1)
        hit = inside & occ_cell[b][ks[:, None, None], iu, iv]
        occ_s = hit.any(axis=(1, 2))
        occ_pad = occ_s.copy()
        occ_pad[:-1] |= occ_s[1:]
        occ_pad[1:] |= occ_s[:-1]
        total += int(occ_pad.sum())
    return total


def main() -> int:
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from amrvolumerenderer_tpu.camera import auto_orbit_camera

    ghz = 10.7e9
    for scene in ("shell_tf", "dense_3level"):
        fsr = build(scene)
        camera = auto_orbit_camera(fsr.bounds)
        print(f"[{scene}]")
        for tw, th in ((128, 8), (64, 16), (32, 32), (16, 64)):
            t0 = time.perf_counter()
            iters, items, wb, wt, blo, bhi, meta, axes = shipped_iters(
                fsr, camera, tw, th
            )
            host_ms = (time.perf_counter() - t0) * 1e3
            ideal = ray_exact(fsr, camera, wb, wt, blo, bhi, meta, axes,
                              tw, th)
            ms = iters * 1024 / ghz * 1e3
            ims = ideal * 1024 / ghz * 1e3
            print(f"  {tw:3d}x{th:<3d}: shipped {iters:6d} iters ~{ms:5.2f} ms"
                  f" ({items} items, host {host_ms:5.1f} ms)"
                  f" | ray-exact {ideal:6d} ~{ims:5.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
