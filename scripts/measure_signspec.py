"""Measure the tilemarch sign-specialization change on real TPU.

Runs the bench's slope-method single-launch measurement on the three
bench scenes (dense 3-level, thin shell, shell + transparent-range TF).
Compare against the round-3 pre-change numbers recorded in the memory
file: dense 4.2-4.4 ms, shell 6.2 ms, shell+TF 2.14-2.25 ms.
"""

import sys
import time

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

    t0 = time.perf_counter()
    geom = bench.build_three_level_scene()
    fsr = FastSceneRenderer(geom, RenderParameters(width=width, height=height))
    cam = auto_orbit_camera(fsr.bounds)
    dense_ms = bench.measure_device_frame_single_launch(fsr, cam)
    print(f"dense_frame_ms: {dense_ms:.3f}  (pre-change ~4.2-4.4)", flush=True)

    shell_geom = bench.build_shell_scene()
    sfsr = FastSceneRenderer(
        shell_geom, RenderParameters(width=width, height=height)
    )
    scam = auto_orbit_camera(sfsr.bounds)
    shell_ms = bench.measure_device_frame_single_launch(sfsr, scam)
    print(f"shell_frame_ms: {shell_ms:.3f}  (pre-change ~6.2)", flush=True)

    sfsr.set_transfer_function(color_map=color_map_from_tuples([
        (0.0, 0, 0, 0, 0.0), (0.3, 0, 0, 0, 0.0),
        (0.5, 1.0, 0.5, 0.2, 0.4), (1.0, 1.0, 1.0, 1.0, 0.8),
    ]))
    shell_tf_ms = bench.measure_device_frame_single_launch(sfsr, scam)
    grays = (width * height) / (shell_tf_ms * 1e-3) / 1e9
    print(
        f"shell_tf_frame_ms: {shell_tf_ms:.3f}  grays: {grays:.3f}"
        "  (pre-change ~2.14-2.25 / 0.49)",
        flush=True,
    )
    print(f"total wall: {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
