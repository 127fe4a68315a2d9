"""Brick-count scaling of the mega-kernel, slope-method edition.

Replaces the README scaling table's historical-methodology numbers
(~3 ms dispatch bias each) with true per-frame kernel times: the same
turbulence scene as examples/bench_scaling.py at 8 / 64 / 512 bricks,
measured via bench.measure_device_frame_single_launch (batched frames,
two-F slope, anti-hoist perturbation).

Usage: python scripts/measure_scaling.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from amrvolumerenderer_tpu import api  # noqa: E402
from amrvolumerenderer_tpu.camera import auto_orbit_camera  # noqa: E402
from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer  # noqa: E402
from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry  # noqa: E402
from amrvolumerenderer_tpu.types import RenderParameters  # noqa: E402


def turbulence_geometry(n: int, box: int = 32):
    coords = np.arange(n) / n
    x = coords[:, None, None]
    y = coords[None, :, None]
    z = coords[None, None, :]
    field = (
        0.5
        + 0.25 * np.sin(2 * np.pi * 3 * x) * np.cos(2 * np.pi * 5 * y)
        + 0.15 * np.sin(2 * np.pi * 9 * z + 1.0)
        + 0.10 * np.sin(2 * np.pi * 17 * (x + y + z))
    ).astype(np.float32)
    field = np.clip(field, 0.0, 1.0)
    boxes = [
        LevelBox(field[i:i + box, j:j + box, k:k + box],
                 np.array([i, j, k], int))
        for i in range(0, n, box)
        for j in range(0, n, box)
        for k in range(0, n, box)
    ]
    geoms = [LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))]
    data = api.AmrData(level_data=[boxes], level_geometry=geoms)
    return api.load_amr_geometry(data, 0, -1, 0, False, True, verbose=False)


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    for n in (64, 128, 256):
        t0 = time.perf_counter()
        g = turbulence_geometry(n)
        fsr = FastSceneRenderer(g, RenderParameters(width=1024, height=1024))
        cam = auto_orbit_camera(fsr.bounds)
        prep_s = time.perf_counter() - t0
        ms = bench.measure_device_frame_single_launch(fsr, cam)
        bricks = (n // 32) ** 3
        print(
            f"{bricks:4d} bricks ({n}^3): frame {ms:.2f} ms "
            f"(prep {prep_s:.1f} s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
