#!/usr/bin/env python3
"""Hardware smoke suite: run the kernel-correctness checks on a real TPU.

The pytest suite runs on a virtual CPU mesh (Pallas in interpret mode);
this script executes the same validations against compiled kernels on the
attached chip: slice-march vs its NumPy oracle, mega-kernel vs the layered
path, the fused composite, and an end-to-end plotfile render.

Usage: python scripts/tpu_smoke.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name} {detail}")
    return ok


def main() -> int:
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}")
    interp = backend == "cpu"

    from amrvolumerenderer_tpu.camera import auto_orbit_camera, camera_basis
    from amrvolumerenderer_tpu.colormap import build_color_table
    from amrvolumerenderer_tpu.compositor import composite_layers_host
    from amrvolumerenderer_tpu.ops import slicemarch as sm
    from amrvolumerenderer_tpu.ops import tilemarch as tm
    from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry
    from amrvolumerenderer_tpu.types import (
        CameraParameters,
        RenderParameters,
        VolumeBounds,
    )

    ok = True

    # ---- scene ----
    n, box = 32, 16
    coords = np.arange(n) / (n - 1)
    field = (
        coords[:, None, None] ** 2
        + coords[None, :, None] ** 2
        + coords[None, None, :] ** 2
    ).astype(np.float32)
    field /= field.max()
    camera = CameraParameters(
        eye=(2.3, 1.7, 2.9), look_at=(0.5, 0.5, 0.5), up=(0, 1, 0),
    )
    forward, right, up = camera_basis(camera)
    axis = sm.choose_march_axis(forward)
    axes = [axis] + [a for a in range(3) if a != axis]
    lut = build_color_table(1.0, 1.0, (0.0, 1.0), None)
    packed = sm.build_log_lut(lut)
    ref_dist = 0.5 / n
    width = height = 64

    vols, metas, dims_l, hints, bmins, bmaxs = [], [], [], [], [], []
    from amrvolumerenderer_tpu.camera import compute_box_depth_hints

    for i in range(0, n, box):
        for j in range(0, n, box):
            for k in range(0, n, box):
                d = field[i:i + box, j:j + box, k:k + box]
                mn = np.array([i, j, k]) / n
                mx = np.array([i + box, j + box, k + box]) / n
                vol, (ns, nu, nv) = sm.pack_slice_volume(d, axis)
                pmin, pmax = mn[axes], mx[axes]
                m = np.zeros(12, np.float32)
                m[0:3], m[3:6] = pmin, pmax
                m[6:9] = (pmax - pmin) / np.array([ns, nu, nv])
                dd = np.zeros(8, np.int32)
                dd[:3] = (ns, nu, nv)
                dd[3:6] = axes
                vols.append(vol)
                metas.append(m)
                dims_l.append(dd)
                bmins.append(mn)
                bmaxs.append(mx)
    vol = np.stack(vols)
    meta = np.stack(metas)
    dims = np.stack(dims_l)
    num = vol.shape[0]
    hints = compute_box_depth_hints(np.stack(bmins), np.stack(bmaxs), camera)
    owners = np.arange(num, dtype=np.int32)
    cam = sm.pack_camera(
        np.asarray(camera.eye), forward, right, up, camera.fov_y_degrees,
        1.0, 0.0, 1.0, ref_dist,
    )
    luts = np.ascontiguousarray(np.broadcast_to(packed[None], (num,) + packed.shape))

    # ---- slicemarch vs numpy reference on one brick ----
    exp_c, exp_d = sm.slicemarch_reference(
        field[:box, :box, :box], bmins[0], bmaxs[0], axis, lut, ref_dist,
        np.asarray(camera.eye), forward, right, up, camera.fov_y_degrees,
        width, height,
    )
    got_c, got_d = sm.slicemarch_render(
        jnp.asarray(vol[:1]), jnp.asarray(meta[:1]), jnp.asarray(dims[:1]),
        jnp.asarray(luts[:1]), jnp.asarray(cam),
        width=width, height=height, max_slices=int(dims[0, 0]),
        interpret=interp,
    )
    diff = float(np.abs(np.asarray(got_c[0]) - exp_c).max())
    ok &= check("slicemarch vs NumPy oracle", diff < 5e-5, f"max diff {diff:.2e}")

    # ---- mega-kernel vs layered + host fold ----
    offsets, tbricks, towners = tm.build_tile_worklist(
        np.stack(bmins), np.stack(bmaxs), hints, owners,
        np.asarray(camera.eye), forward, right, up, camera.fov_y_degrees,
        width, height,
    )
    out_c, out_d = tm.tilemarch_render(
        jnp.asarray(vol), jnp.asarray(meta), jnp.asarray(dims),
        jnp.asarray(packed), jnp.asarray(cam),
        jnp.asarray(offsets), jnp.asarray(tbricks), jnp.asarray(towners),
        width=width, height=height, max_slices=int(dims[0, 0]),
        interpret=interp,
    )
    tiles = width // tm.TILE_W
    mega_c = (
        np.asarray(out_c)
        .reshape(tiles, tiles, 4, tm.TILE_H, tm.TILE_W)
        .transpose(0, 3, 1, 4, 2)
        .reshape(width * height, 4)
    )
    colors, depths = sm.slicemarch_render(
        jnp.asarray(vol), jnp.asarray(meta), jnp.asarray(dims),
        jnp.asarray(luts), jnp.asarray(cam),
        width=width, height=height, max_slices=int(dims[0, 0]),
        interpret=interp,
    )
    layers = np.concatenate(
        [np.asarray(colors), np.asarray(depths)[..., None]], axis=-1
    )
    expected = composite_layers_host(
        layers, hints, owners, np.zeros(num, np.int32)
    )
    diff = float(np.abs(mega_c - expected[:, :4]).max())
    ok &= check("mega-kernel vs layered fold", diff < 5e-5, f"max diff {diff:.2e}")

    # ---- batched (frame-axis) kernel vs two frameless launches ----
    # the batched kernel carries [F, ...] scalar tables (8-row SMEM
    # padding) while single-frame launches ship 1-D; both must produce
    # identical pixels on compiled Mosaic, not just in interpret mode
    item_bounds = dims[tbricks, 7]
    tile_ids = np.arange(len(offsets) - 1, dtype=np.int32)
    cam2 = np.stack([cam, cam]).astype(np.float32)
    cam2[1, 19] = 1.0  # unused slot: frames must not be CSE'd
    tile2 = lambda a: np.tile(np.asarray(a)[None], (2,) + (1,) * np.ndim(a))
    b_c, b_d = tm.tilemarch_render_batch(
        jnp.asarray(vol), jnp.asarray(meta), jnp.asarray(dims),
        jnp.asarray(packed), jnp.asarray(cam2),
        jnp.asarray(tile2(offsets)), jnp.asarray(tile2(tbricks)),
        jnp.asarray(tile2(towners)), jnp.asarray(tile2(item_bounds)),
        jnp.asarray(tile2(tile_ids)),
        width=width, height=height, max_slices=int(dims[0, 0]),
        interpret=interp,
    )
    bdiff = max(
        float(np.abs(np.asarray(b_c[f]).reshape(-1) -
                     np.asarray(out_c).reshape(-1)).max())
        for f in range(2)
    )
    ok &= check(
        "batched kernel vs frameless launch", bdiff == 0.0,
        f"max diff {bdiff:.2e}",
    )

    # ---- end-to-end plotfile render ----
    import tempfile

    from amrvolumerenderer_tpu.driver import RunOptions, run_options
    from amrvolumerenderer_tpu.plotfile import write_plotfile

    with tempfile.TemporaryDirectory() as tmp:
        boxes = [LevelBox(field, np.zeros(3, dtype=int))]
        geom = LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))
        write_plotfile(f"{tmp}/plt0", [boxes], [geom])
        opts = RunOptions(
            plotfile_path=f"{tmp}/plt0", output_filename=f"{tmp}/out.png"
        )
        opts.parameters.width = 128
        opts.parameters.height = 128
        code = run_options(opts, verbose=False)
        from amrvolumerenderer_tpu.io import load_png

        img, w, h = load_png(f"{tmp}/out.png")
        ok &= check(
            "end-to-end plotfile render", code == 0 and img.max() > 0.1,
            f"{w}x{h} max {img.max():.2f}",
        )

    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
