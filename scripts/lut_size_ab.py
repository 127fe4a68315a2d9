#!/usr/bin/env python3
"""Interleaved A/B: lut_size=256 (reference table) vs 128 (1-row fast mode).

The march-loop decomposition (scripts/march_op_probe.py) measured the LUT
gather pipeline at ~16% of a sparse-shell frame and ~16% of the dense
3-level frame (lutzero variant).  A 128-entry table halves the 2-row LUT
walk to a single take_along_axis with no row select and no index div/mod
(ops/vreg.gather_flat fast path), predicting a mid-single-digit-% frame
win.  That is UNDER the relay's session noise (+-20-40% between
back-to-back samples on a bad day, CLAUDE.md), so per the house
measurement discipline this script:

  * runs each measurement in a fresh SUBPROCESS (fresh jit caches; a
    crashed child can't wedge the parent's relay client),
  * INTERLEAVES the two variants A,B,A,B,... so relay-contention drift
    hits both equally,
  * reports per-rep values and the median of each variant.

Usage:
  python scripts/lut_size_ab.py          # parent: interleaved reps
  python scripts/lut_size_ab.py <256|128>  # child: one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 4  # per variant, interleaved


def child(lut_size: int) -> int:
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

    width = height = 1024 if jax.default_backend() == "tpu" else 128
    out = {"lut_size": lut_size}

    shell = FastSceneRenderer(
        build_shell_scene(),
        RenderParameters(width=width, height=height, lut_size=lut_size),
    )
    shell.set_transfer_function(color_map=color_map_from_tuples([
        (0.0, 0, 0, 0, 0.0), (0.3, 0, 0, 0, 0.0),
        (0.5, 1.0, 0.5, 0.2, 0.4), (1.0, 1.0, 1.0, 1.0, 0.8),
    ]))
    cam = auto_orbit_camera(shell.bounds)
    out["shell_tf_ms"] = measure_device_frame_single_launch(shell, cam)

    dense = FastSceneRenderer(
        build_three_level_scene(),
        RenderParameters(width=width, height=height, lut_size=lut_size),
    )
    out["dense_ms"] = measure_device_frame_single_launch(
        dense, auto_orbit_camera(dense.bounds)
    )

    # quality fingerprint: small frame vs the 256-entry rendering of the
    # same scene (the parent prints the cross-size max-channel delta)
    small = FastSceneRenderer(
        build_shell_scene(),
        RenderParameters(width=256, height=256, lut_size=lut_size),
    )
    img = np.asarray(
        small.render(auto_orbit_camera(small.bounds), overlay=False),
        np.float64,
    )
    out["mean_rgb"] = float(img[np.isfinite(img)].mean())
    print(json.dumps(out))
    return 0


def main() -> int:
    if len(sys.argv) > 1:
        return child(int(sys.argv[1]))
    env = {**os.environ,
           "PYTHONPATH": os.path.dirname(os.path.dirname(
               os.path.abspath(__file__)))
           + os.pathsep + os.environ.get("PYTHONPATH", "")}
    samples = {256: [], 128: []}
    for rep in range(REPS):
        for size in (256, 128):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(size)],
                capture_output=True, text=True, timeout=1800, env=env,
            )
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = {}
            if "shell_tf_ms" not in rec:
                print(f"[{size} rep {rep}] FAILED:\n{proc.stdout}\n"
                      f"{proc.stderr[-2000:]}", file=sys.stderr)
                continue
            samples[size].append(rec)
            print(line, flush=True)
    print()
    for size in (256, 128):
        if not samples[size]:
            continue
        shell = sorted(r["shell_tf_ms"] for r in samples[size])
        dense = sorted(r["dense_ms"] for r in samples[size])
        print(f"lut{size}: shell_tf median {shell[len(shell) // 2]:.3f} ms "
              f"(reps {['%.3f' % v for v in shell]}), "
              f"dense median {dense[len(dense) // 2]:.3f} ms "
              f"(reps {['%.3f' % v for v in dense]})")
    if samples[256] and samples[128]:
        d = abs(samples[128][0]["mean_rgb"] - samples[256][0]["mean_rgb"])
        print(f"mean-rgb delta 128 vs 256: {d:.5f} "
              f"(half-resolution classification; nonzero expected)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
