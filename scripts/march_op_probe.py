#!/usr/bin/env python3
"""Decompose the tilemarch march loop's per-sample cost on real TPU.

The README's speed-of-light estimate attributes ~70 lane-ops/sample to
the march loop: ~32 to the 8-row volume vreg gather, ~24 to the four
2-row LUT gathers, the rest to position/window math and the exp.  This
script MEASURES that split by swapping the gather implementation via a
monkeypatch and re-timing the two headline scenes with bench.py's
single-launch slope method (the only methodology that survives the
relay's dispatch latency and XLA's loop hoisting):

  base     shipped 8-row select-walk gather (correct)
  tree     bit-select binary tree gather (correct; shorter dependency
           chain: depth log2(rows) instead of rows, and rows-1 selects
           + log2(rows) bit tests instead of rows (compare + select))
  vol1row  volume gather reads row 0 only (WRONG PIXELS — cost probe:
           the upper bound of any volume-gather thinning)
  lutrow0  LUT gathers read row 0 only (WRONG PIXELS — cost probe for
           the 4x2-row LUT walk)

Each variant runs in a SUBPROCESS (fresh jit/pallas caches; a killed or
crashed child can't wedge the parent's relay client).  Usage:

  python scripts/march_op_probe.py            # parent: all variants
  python scripts/march_op_probe.py <variant>  # child: one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = (
    "base", "tree", "vol1row", "lutrow0",
    # full-elimination cost probes: the gather returns a constant, so XLA
    # dead-code-eliminates the feeding index math as well — each measures
    # gather + its index pipeline together (WRONG PIXELS by design)
    "volzero", "lutzero", "bothzero",
)


def make_gather(variant):
    import jax
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.ops.vreg import LANES, SUBLANES
    from amrvolumerenderer_tpu.ops.vreg import gather_rows as base_gather

    def take0(load_row, col):
        bcast = jax.lax.broadcast_in_dim(
            load_row(0), (SUBLANES, LANES), (1,)
        )
        return jnp.take_along_axis(bcast, col, axis=1)

    def tree(load_row, num_rows, row, col):
        vs = [
            jnp.take_along_axis(
                jax.lax.broadcast_in_dim(
                    load_row(r), (SUBLANES, LANES), (1,)
                ),
                col,
                axis=1,
            )
            for r in range(num_rows)
        ]
        level = 0
        while len(vs) > 1:
            bit = ((row >> level) & 1) == 1
            vs = [
                jnp.where(bit, vs[i + 1], vs[i])
                if i + 1 < len(vs)
                else vs[i]
                for i in range(0, len(vs), 2)
            ]
            level += 1
        return vs[0]

    if variant == "base":
        return base_gather
    if variant == "tree":
        return tree
    if variant == "vol1row":
        def g(load_row, num_rows, row, col):
            if num_rows == SUBLANES:
                return take0(load_row, col)
            return base_gather(load_row, num_rows, row, col)
        return g
    if variant == "lutrow0":
        def g(load_row, num_rows, row, col):
            if num_rows != SUBLANES:
                return take0(load_row, col)
            return base_gather(load_row, num_rows, row, col)
        return g

    def const(row, v):
        return row.astype(jnp.float32) * 0.0 + v

    # the LUT constant doubles as r, g, b AND log(1 - alpha): it must be
    # NEGATIVE so alpha stays positive (the bench timer asserts a nonzero
    # frame checksum); rgb accumulate negative and clip to 0 harmlessly
    if variant == "volzero":
        def g(load_row, num_rows, row, col):
            if num_rows == SUBLANES:
                return const(row, 0.5)
            return base_gather(load_row, num_rows, row, col)
        return g
    if variant == "lutzero":
        def g(load_row, num_rows, row, col):
            if num_rows != SUBLANES:
                return const(row, -0.25)
            return base_gather(load_row, num_rows, row, col)
        return g
    if variant == "bothzero":
        def g(load_row, num_rows, row, col):
            if num_rows == SUBLANES:
                return const(row, 0.5)
            return const(row, -0.25)
        return g
    raise SystemExit(f"unknown variant {variant}")


def child(variant: str) -> int:
    from bench import (
        build_shell_scene,
        build_three_level_scene,
        measure_device_frame_single_launch,
    )
    from amrvolumerenderer_tpu.camera import auto_orbit_camera
    from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer
    from amrvolumerenderer_tpu.ops import tilemarch as tm
    from amrvolumerenderer_tpu.types import (
        RenderParameters,
        color_map_from_tuples,
    )

    tm.gather_rows = make_gather(variant)

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

    # correctness fingerprint (tree must MATCH base; the cost probes
    # intentionally won't): checksum of a small rendered frame
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
    results = []
    for v in VARIANTS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), v],
            capture_output=True, text=True, timeout=1800, env=env,
        )
        line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            rec = {}
        if "checksum" not in rec:
            print(f"[{v}] FAILED:\n{proc.stdout}\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        results.append(rec)
        print(line, flush=True)
    base = next((r for r in results if r["variant"] == "base"), None)
    if len(results) >= 2 and base is not None:
        print("\nvariant    shell_tf_ms  dense_ms   match_base")
        for r in results:
            match = "yes" if r["checksum"] == base["checksum"] else "NO"
            print(f"{r['variant']:<10} {r['shell_tf_ms']:>10.2f}"
                  f" {r['dense_ms']:>9.2f}   {match}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
