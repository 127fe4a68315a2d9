#!/usr/bin/env python3
"""Interleaved A/B: hoisted in-plane reciprocals vs per-sample division.

The march loop computed ``(pos_u - pmin) / cell`` twice per sample; cell
is loop-invariant, and f32 lane division lowers to a multi-op
reciprocal+refine sequence on the VPU, so the product now hoists
``1 / cell`` to kernel setup (slicemarch.RECIPROCAL_COORDS, the
trace-time hook this script flips).  Per the house measurement
discipline (relay noise +-20-40% between sessions): fresh subprocess per
sample, variants interleaved, medians reported.

Usage:
  python scripts/coord_div_ab.py            # parent: interleaved reps
  python scripts/coord_div_ab.py <recip|div>  # child: one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 4


def child(variant: str) -> int:
    from amrvolumerenderer_tpu.ops import slicemarch as sm

    sm.RECIPROCAL_COORDS = variant == "recip"  # before any trace

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
    out = {"variant": variant}

    shell = FastSceneRenderer(
        build_shell_scene(), RenderParameters(width=width, height=height)
    )
    shell.set_transfer_function(color_map=color_map_from_tuples([
        (0.0, 0, 0, 0, 0.0), (0.3, 0, 0, 0, 0.0),
        (0.5, 1.0, 0.5, 0.2, 0.4), (1.0, 1.0, 1.0, 1.0, 0.8),
    ]))
    cam = auto_orbit_camera(shell.bounds)
    out["shell_tf_ms"] = measure_device_frame_single_launch(shell, cam)

    dense = FastSceneRenderer(
        build_three_level_scene(),
        RenderParameters(width=width, height=height),
    )
    out["dense_ms"] = measure_device_frame_single_launch(
        dense, auto_orbit_camera(dense.bounds)
    )

    # correctness fingerprint: x/c vs x*(1/c) may flip a floor on
    # knife-edge samples, so the checksums may differ at ULP scale —
    # reported for eyeballing, not compared bitwise
    small = FastSceneRenderer(
        build_shell_scene(), RenderParameters(width=256, height=256)
    )
    img = small.render(auto_orbit_camera(small.bounds), overlay=False)
    frame = np.asarray(img, np.float64)
    out["checksum"] = float(frame[np.isfinite(frame)].sum())
    print(json.dumps(out))
    return 0


def main() -> int:
    if len(sys.argv) > 1:
        return child(sys.argv[1])
    env = {**os.environ,
           "PYTHONPATH": os.path.dirname(os.path.dirname(
               os.path.abspath(__file__)))
           + os.pathsep + os.environ.get("PYTHONPATH", "")}
    samples = {"recip": [], "div": []}
    for rep in range(REPS):
        for variant in ("div", "recip"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), variant],
                capture_output=True, text=True, timeout=1800, env=env,
            )
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = {}
            if "shell_tf_ms" not in rec:
                print(f"[{variant} rep {rep}] FAILED:\n{proc.stdout}\n"
                      f"{proc.stderr[-2000:]}", file=sys.stderr)
                continue
            samples[variant].append(rec)
            print(line, flush=True)
    print()
    for variant in ("div", "recip"):
        if not samples[variant]:
            continue
        shell = sorted(r["shell_tf_ms"] for r in samples[variant])
        dense = sorted(r["dense_ms"] for r in samples[variant])
        print(f"{variant:>5}: shell_tf median {shell[len(shell) // 2]:.3f} "
              f"ms (reps {['%.3f' % v for v in shell]}), "
              f"dense median {dense[len(dense) // 2]:.3f} ms "
              f"(reps {['%.3f' % v for v in dense]})")
    if samples["div"] and samples["recip"]:
        d = abs(samples["div"][0]["checksum"] - samples["recip"][0]["checksum"])
        print(f"checksum |div - recip| = {d:.6f} "
              f"(floor flips on knife-edge samples; small expected)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
