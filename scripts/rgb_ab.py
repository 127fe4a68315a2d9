#!/usr/bin/env python3
"""Interleaved A/B: batched e2e readback as rgba bytes vs rgb bytes.

VERDICT r3 #4: README claimed bytes_out="rgb" cut the batched e2e from
204 to 106 ms/frame, while BENCH_r03 recorded rgb SLOWER than rgba
(190.6 vs 160.4).  Neither number followed the house discipline for <2x
claims on this relay (+-20-40% session noise between back-to-back
samples), so this script settles it:

  * each measurement runs in a fresh SUBPROCESS (fresh jit caches; a
    crashed child can't wedge the parent's relay client),
  * the two variants INTERLEAVE A,B,A,B,... so relay-contention drift
    hits both equally,
  * the parent reports per-rep values and the median of each variant.

Usage:
  python scripts/rgb_ab.py            # parent: interleaved reps
  python scripts/rgb_ab.py <rgba|rgb|float>  # child: one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 5  # per variant, interleaved
B = 8  # orbit frames per batch


def child(mode: str) -> int:
    from bench import build_three_level_scene
    from amrvolumerenderer_tpu.camera import (
        auto_orbit_camera,
        orbit_camera_sequence,
    )
    from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer
    from amrvolumerenderer_tpu.types import RenderParameters

    import jax

    width = height = 1024 if jax.default_backend() == "tpu" else 128
    bytes_out = {"rgba": True, "rgb": "rgb", "float": False}[mode]
    fsr = FastSceneRenderer(
        build_three_level_scene(),
        RenderParameters(width=width, height=height),
    )
    orbit = orbit_camera_sequence(auto_orbit_camera(fsr.bounds), B)
    fsr.render_batch(orbit, overlay=False, bytes_out=bytes_out)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fsr.render_batch(orbit, overlay=False, bytes_out=bytes_out)
        best = min(best, time.perf_counter() - t0)
    out = {
        "mode": mode,
        "frame_ms": round(best * 1e3 / B, 2),
        "readback_mb": round(fsr.last_batch_stats["readback_mb"], 1),
        "readback_ms": round(fsr.last_batch_stats["readback_ms"] / B, 2),
        "dispatch_ms": round(fsr.last_batch_stats["dispatch_ms"] / B, 2),
    }
    print(json.dumps(out))
    return 0


def main() -> int:
    if len(sys.argv) > 1:
        return child(sys.argv[1])
    env = {**os.environ,
           "PYTHONPATH": os.path.dirname(os.path.dirname(
               os.path.abspath(__file__)))
           + os.pathsep + os.environ.get("PYTHONPATH", "")}
    modes = ("rgba", "rgb")
    samples = {m: [] for m in modes}
    for rep in range(REPS):
        for mode in modes:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), mode],
                capture_output=True, text=True, timeout=3600, env=env,
            )
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = {}
            if "frame_ms" not in rec:
                print(f"[{mode} rep {rep}] FAILED:\n{proc.stdout}\n"
                      f"{proc.stderr[-2000:]}", file=sys.stderr)
                continue
            samples[mode].append(rec)
            print(line, flush=True)
    print()
    summary = {}
    for mode in modes:
        if not samples[mode]:
            continue
        vals = sorted(r["frame_ms"] for r in samples[mode])
        summary[mode] = {
            "median_frame_ms": vals[len(vals) // 2],
            "all_frame_ms": vals,
            "readback_mb": samples[mode][0]["readback_mb"],
        }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
