"""Re-validate the march-loop unroll factor with the slope method.

The round-2 sweep ("unroll 2/4/8 identical") was drawn from the
hoisting-poisoned methodology; this one reuses the benchmark's
single-launch slope harness (bench.measure_device_frame_single_launch)
so any future methodology fix propagates here automatically.

Usage: python scripts/unroll_sweep.py
Result (v5e-lite, 1024^2, 2026-08-17): unroll=2 dense 4.90 / shell_tf
2.68 ms; unroll=4 3.17 / 1.69; unroll=8 3.18 / 1.88 — 4 stands.
"""

import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from amrvolumerenderer_tpu.camera import auto_orbit_camera  # noqa: E402
from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer  # noqa: E402
from amrvolumerenderer_tpu.types import (  # noqa: E402
    RenderParameters,
    color_map_from_tuples,
)


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    width = height = 1024

    geom = bench.build_three_level_scene()
    fsr = FastSceneRenderer(geom, RenderParameters(width=width, height=height))
    cam = auto_orbit_camera(fsr.bounds)

    sgeom = bench.build_shell_scene()
    sfsr = FastSceneRenderer(sgeom, RenderParameters(width=width, height=height))
    scam = auto_orbit_camera(sfsr.bounds)
    sfsr.set_transfer_function(color_map=color_map_from_tuples([
        (0.0, 0, 0, 0, 0.0), (0.3, 0, 0, 0, 0.0),
        (0.5, 1.0, 0.5, 0.2, 0.4), (1.0, 1.0, 1.0, 1.0, 0.8),
    ]))

    for unroll in (2, 4, 8):
        d = bench.measure_device_frame_single_launch(fsr, cam, unroll=unroll)
        s = bench.measure_device_frame_single_launch(sfsr, scam, unroll=unroll)
        print(f"unroll={unroll}: dense {d:.3f} ms  shell_tf {s:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
