"""Interleaved A/B of the narrowed volume gather (tm.compute_row_chords +
``narrow_rows``) vs the full 8-row gather chain, on the bench scenes.

Relay contention swings back-to-back wall clocks by +-20-40%, so A and B
slope samples are INTERLEAVED (A B A B ...) and the medians compared —
the same methodology as bench.py measure_device_frame_single_launch
(F-frame single-launch batches, slope over two F values).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/narrow_gather_ab.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer  # noqa: E402
from amrvolumerenderer_tpu.ops import tilemarch as tm  # noqa: E402
from amrvolumerenderer_tpu.types import (  # noqa: E402
    CameraParameters,
    RenderParameters,
    color_map_from_tuples,
)


def make_timers(fsr, camera, narrow_rows):
    import jax
    import jax.numpy as jnp

    fsr.narrow_rows = narrow_rows
    inputs = fsr.frame_inputs(camera, as_numpy=True)
    narrow = inputs.get("row_chords") is not None and narrow_rows
    if narrow:
        rc = inputs["row_chords"]
        elig = float((rc != tm.NARROW_SENTINEL).mean())
    else:
        elig = 0.0
    cap = tm.max_batch_frames(
        len(inputs["tile_ids"]), len(inputs["bricks"]),
        inputs["meta"].shape[0], narrow=bool(narrow),
    )
    f2 = min(16, cap)
    F = (max(1, f2 // 4), f2)

    def make_timer(f):
        cams = np.tile(inputs["cam"], (f, 1)).astype(np.float32)
        cams[:, 19] = np.arange(f)

        @jax.jit
        def frames(vol, meta, dims, lut, cams, offsets, bricks, owners,
                   ibounds, tile_ids, row_chords=None):
            out_c, _ = tm.tilemarch_render_batch(
                vol, meta, dims, lut, cams, offsets, bricks, owners,
                ibounds, tile_ids, row_chords,
                width=fsr.pad_w, height=fsr.pad_h, max_slices=fsr.cube,
                logical_width=fsr.render_width,
                logical_height=fsr.render_height,
                interpret=fsr.interpret, sampling=fsr.parameters.sampling,
                ghost=fsr.ghost, dma_slices=inputs["dma_slices"],
                classification=fsr.parameters.classification,
                narrow_rows=narrow_rows if narrow else None,
            )
            return jnp.sum(out_c[:, ::8])

        tile = lambda a: jnp.asarray(np.tile(a[None], (f,) + (1,) * a.ndim))
        args = (
            fsr._packed_vol, jnp.asarray(inputs["meta"]),
            jnp.asarray(inputs["dims"]), fsr._lut_device,
            jnp.asarray(cams), tile(inputs["offsets"]),
            tile(inputs["bricks"]), tile(inputs["owners"]),
            tile(inputs["item_bounds"]), tile(inputs["tile_ids"]),
        ) + ((tile(inputs["row_chords"]),) if narrow else ())
        checksum = float(frames(*args))
        assert np.isfinite(checksum)

        def timed():
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(frames(*args))
                times.append(time.perf_counter() - t0)
            return min(times) * 1e3

        return timed

    t1, t2 = make_timer(F[0]), make_timer(F[1])

    def slope():
        return (t2() - t1()) / (F[1] - F[0])

    return slope, elig


def ab(fsr, camera, label, reps=5):
    slope_a, elig = make_timers(fsr, camera, 4)
    slope_b, _ = make_timers(fsr, camera, None)
    a_samples, b_samples = [], []
    lo = fsr.render_width * fsr.render_height / 50e9 * 1e3
    for _ in range(reps):
        a = slope_a()
        b = slope_b()
        if a > lo:
            a_samples.append(a)
        if b > lo:
            b_samples.append(b)
    ma = float(np.median(a_samples)) if a_samples else float("nan")
    mb = float(np.median(b_samples)) if b_samples else float("nan")
    print(
        f"{label}: narrow={ma:.3f} ms  full={mb:.3f} ms  "
        f"speedup={mb / ma:.3f}x  eligible={elig:.2f}  "
        f"(narrow samples {sorted(round(x, 3) for x in a_samples)}, "
        f"full {sorted(round(x, 3) for x in b_samples)})",
        flush=True,
    )


def main():
    cam = CameraParameters(
        eye=(0.5, 0.65, 3.4), look_at=(0.5, 0.5, 0.5), up=(0.0, 1.0, 0.0)
    )
    g3 = bench.build_three_level_scene()
    for sampling in ("trilinear", "nearest"):
        fsr = FastSceneRenderer(
            g3, RenderParameters(width=1024, height=1024, sampling=sampling)
        )
        ab(fsr, cam, f"dense3lvl/{sampling}")

    gs = bench.build_shell_scene()
    fsr = FastSceneRenderer(
        gs, RenderParameters(width=1024, height=1024, sampling="nearest")
    )
    ab(fsr, cam, "shell/nearest")
    fsr.set_transfer_function(color_map=color_map_from_tuples([
        (0.0, 0.0, 0.0, 0.0, 0.0), (0.3, 0.0, 0.0, 0.2, 0.0),
        (0.6, 0.9, 0.4, 0.1, 0.35), (1.0, 1.0, 1.0, 1.0, 0.9),
    ]))
    ab(fsr, cam, "shell_tf/nearest")


if __name__ == "__main__":
    main()
