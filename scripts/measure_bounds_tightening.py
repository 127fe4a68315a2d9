#!/usr/bin/env python3
"""Measure the (seg_len=2, footprint_margin) bounds tightening on real TPU.

Uses bench.py's single-launch slope method (the only methodology that
survives the relay's dispatch latency and XLA's loop hoisting) on the two
headline scenes.  Run before/after toggling the call-site config to get a
paired comparison; the deterministic work-list metric is printed alongside
so wall-clock noise can be cross-checked against real work removed.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from bench import (
        build_shell_scene,
        build_three_level_scene,
        measure_device_frame_single_launch,
    )
    from amrvolumerenderer_tpu.camera import auto_orbit_camera
    from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer
    from amrvolumerenderer_tpu.types import (
        RenderParameters,
        color_map_from_tuples,
    )

    import jax

    print(f"backend: {jax.default_backend()}")
    width = height = 1024 if jax.default_backend() == "tpu" else 128

    shell_tf = color_map_from_tuples([
        (0.0, 0, 0, 0, 0.0), (0.3, 0, 0, 0, 0.0),
        (0.5, 1.0, 0.5, 0.2, 0.4), (1.0, 1.0, 1.0, 1.0, 0.8),
    ])
    for name, builder, cmap in (
        ("dense_3level", build_three_level_scene, None),
        ("shell_default", build_shell_scene, None),
        ("shell_tf", build_shell_scene, shell_tf),
    ):
        fsr = FastSceneRenderer(
            builder(), RenderParameters(width=width, height=height)
        )
        if cmap is not None:
            fsr.set_transfer_function(color_map=cmap)
        camera = auto_orbit_camera(fsr.bounds)
        inputs = fsr.frame_inputs(camera, as_numpy=True)
        ib = inputs["item_bounds"].astype(np.int64)
        iters = int(np.maximum((ib & 0xFFFF) - (ib >> 16), 0).sum())
        best = min(
            measure_device_frame_single_launch(fsr, camera)
            for _ in range(3)
        )
        grays = width * height / (best * 1e-3) / 1e9
        print(f"[{name}] frame {best:.2f} ms  ({grays:.3f} Gray/s, "
              f"{iters} slice-iters, {len(ib)} items)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
