#!/usr/bin/env python3
"""Measure the slice-bounds empty-space skipping win on a sparse scene.

Builds a shell-like scene (visible values only in a thin band of slices,
transparent elsewhere under a ramp transfer function) and times the
tile-loop mega-kernel with and without the per-brick occupied-slice bounds
(dims[:, 7]).  Dense scenes with all-opaque maps are unaffected by design.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_sparse_probe.py
"""

from __future__ import annotations

import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.camera import camera_basis, compute_box_depth_hints
    from amrvolumerenderer_tpu.ops import slicemarch as sm
    from amrvolumerenderer_tpu.ops import tilemarch as tm
    from amrvolumerenderer_tpu.types import CameraParameters

    interp = jax.default_backend() == "cpu"
    print(f"backend: {jax.default_backend()}")

    # scene: 4x4x4 grid of 32^3 bricks; a thin visible shell in the middle
    # band of each brick's z extent (~12% occupied slices)
    n_grid, cube = 4, 32
    width = height = 1024
    camera = CameraParameters(
        eye=(0.5, 0.6, 3.2), look_at=(0.5, 0.5, 0.5), up=(0, 1, 0)
    )
    forward, right, up = camera_basis(camera)
    axis = sm.choose_march_axis(forward)
    axes = [axis] + [a for a in range(3) if a != axis]

    # ramp transfer function: transparent below 0.5
    lut = np.zeros((256, 4), np.float32)
    ramp = np.linspace(0.0, 1.0, 128)
    lut[128:, 0] = ramp
    lut[128:, 2] = 1.0 - ramp
    lut[128:, 3] = 0.3 * ramp + 0.05
    packed_lut = sm.build_log_lut(lut)

    rng = np.random.default_rng(3)
    vols, metas, dims_l, bmins, bmaxs = [], [], [], [], []
    for gi in range(n_grid):
        for gj in range(n_grid):
            for gk in range(n_grid):
                data = rng.random((cube, cube, cube)).astype(np.float32) * 0.4
                band = slice(14, 18)
                data[:, :, band] = 0.6 + 0.35 * rng.random(
                    (cube, cube, 4)
                ).astype(np.float32)
                mn = np.array([gi, gj, gk]) / n_grid
                mx = mn + 1.0 / n_grid
                vol, (ns, nu, nv) = sm.pack_slice_volume(data, axis)
                m = np.zeros(12, np.float32)
                m[0:3], m[3:6] = mn[axes], mx[axes]
                m[6:9] = (mx[axes] - mn[axes]) / np.array([ns, nu, nv])
                dd = np.zeros(8, np.int32)
                dd[:3] = (ns, nu, nv)
                dd[3:6] = axes
                dd[7] = sm.compute_slice_bounds(vol, lut[:, 3])
                vols.append(vol)
                metas.append(m)
                dims_l.append(dd)
                bmins.append(mn)
                bmaxs.append(mx)

    vol = np.stack(vols)
    meta = np.stack(metas)
    dims = np.stack(dims_l)
    num = vol.shape[0]
    occ = [(d[7] & 0xFFFF) - (d[7] >> 16) for d in dims_l]
    print(f"bricks: {num}, occupied slices/brick: {np.mean(occ):.1f}/{cube}")

    hints = compute_box_depth_hints(np.stack(bmins), np.stack(bmaxs), camera)
    owners = np.arange(num, dtype=np.int32)
    cam = sm.pack_camera(
        np.asarray(camera.eye), forward, right, up, camera.fov_y_degrees,
        1.0, 0.0, 1.0, 0.5 / (n_grid * cube),
    )
    offsets, tbricks, towners = tm.build_tile_worklist(
        np.stack(bmins), np.stack(bmaxs), hints, owners,
        np.asarray(camera.eye), forward, right, up, camera.fov_y_degrees,
        width, height,
    )

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def frames(dims_in, k):
        def body(_, acc):
            c, _d = tm.tilemarch_render(
                jnp.asarray(vol), jnp.asarray(meta), dims_in,
                jnp.asarray(packed_lut), jnp.asarray(cam),
                jnp.asarray(offsets), jnp.asarray(tbricks),
                jnp.asarray(towners),
                width=width, height=height, max_slices=cube,
                interpret=interp,
            )
            return acc + c[0, 0, 0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    k = 5
    for label, d in (
        ("no skipping ", dims.copy() * np.array([1] * 7 + [0], np.int32)),
        ("with bounds ", dims),
    ):
        dj = jnp.asarray(d)
        float(frames(dj, k))  # warm up / compile
        t0 = time.perf_counter()
        sink = float(frames(dj, k))
        ms = (time.perf_counter() - t0) / k * 1e3
        print(f"{label}: {ms:7.2f} ms/frame  (sink {sink:.3f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
