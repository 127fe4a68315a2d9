"""Round-5 arbiter for the shell-TF Gray/s discrepancy (VERDICT r4 #1).

BENCH_r03/r04 recorded 1.28/1.26 ms for the shell+transparent-TF frame
while builder sessions recorded 0.79-0.97 ms — with the DENSE frame
agreeing everywhere (2.85-2.95 ms).  Hypothesis: the shell slope
measurement's signal is 3.6x smaller than the dense one's
(12 frames x ~0.8 ms ~= 10 ms wall-clock difference between two ~40 ms
samples, vs 12 x 2.9 ~= 35 ms for dense), so the same relay jitter that
is invisible on dense lands as a +-0.3-0.5 ms bias on the shell slope —
exactly the observed gap.

This script settles it the house way (interleaved, one session, median):
  * compile FOUR batched launches for the shell+TF scene:
    F in {4, 16} (bench.py's exact config, variant A) and
    F in {8, 32} (full SMEM cap, 2x the slope baseline, variant B);
  * alternate slope samples A,B,A,B,... so relay weather hits both
    variants identically;
  * a dense-scene F=(4,16) control bracket before and after.

If variant B's median is stable across reps while variant A's scatters,
the discrepancy is measurement SNR and bench.py should move to the
F=(cap/4, cap) config.  Reference anchor for the metric itself:
/root/reference/Common/VolumePainter.cpp:837-900 (the per-ray march this
scene exercises in its culled regime).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/shell_ab_r05.py [reps]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from amrvolumerenderer_tpu.camera import auto_orbit_camera  # noqa: E402
from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer  # noqa: E402
from amrvolumerenderer_tpu.types import (  # noqa: E402
    RenderParameters,
    color_map_from_tuples,
)


def make_timer(fsr, inputs, f, unroll=None):
    """bench.measure_device_frame_single_launch's inner timer, verbatim
    semantics: compile the F-frame launch once, return a re-timeable
    min-of-3 thunk."""
    import jax
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.ops import tilemarch as tm

    cams = np.tile(inputs["cam"], (f, 1)).astype(np.float32)
    cams[:, 19] = np.arange(f)  # anti-hoist slot, pixels unchanged

    narrow = inputs.get("row_chords") is not None and fsr.narrow_rows

    @jax.jit
    def frames(vol, meta, dims, lut, cams, offsets, bricks, owners,
               ibounds, tile_ids, row_chords=None):
        out_c, _out_d = tm.tilemarch_render_batch(
            vol, meta, dims, lut, cams, offsets, bricks, owners,
            ibounds, tile_ids, row_chords,
            width=fsr.pad_w, height=fsr.pad_h, max_slices=fsr.cube,
            logical_width=fsr.render_width,
            logical_height=fsr.render_height,
            interpret=fsr.interpret,
            sampling=fsr.parameters.sampling,
            ghost=fsr.ghost, dma_slices=inputs["dma_slices"],
            classification=fsr.parameters.classification,
            unroll=unroll,
            narrow_rows=fsr.narrow_rows if narrow else None,
        )
        return jnp.sum(out_c[:, ::8])

    tile = lambda a: jnp.asarray(np.tile(a[None], (f,) + (1,) * a.ndim))
    args = (
        fsr._packed_vol, jnp.asarray(inputs["meta"]),
        jnp.asarray(inputs["dims"]), fsr._lut_device, jnp.asarray(cams),
        tile(inputs["offsets"]), tile(inputs["bricks"]),
        tile(inputs["owners"]), tile(inputs["item_bounds"]),
        tile(inputs["tile_ids"]),
    ) + ((tile(inputs["row_chords"]),) if narrow else ())
    checksum = float(frames(*args))
    assert np.isfinite(checksum) and checksum > 0.0

    def timed():
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(frames(*args))
            times.append(time.perf_counter() - t0)
        return min(times) * 1e3

    return timed


def main():
    import jax

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    print("backend:", jax.default_backend(), flush=True)
    t_start = time.perf_counter()

    # dense control (bench's exact headline config)
    geom = bench.build_three_level_scene()
    fsr = FastSceneRenderer(geom, RenderParameters(width=1024, height=1024))
    cam = auto_orbit_camera(fsr.bounds)
    dinp = fsr.frame_inputs(cam, as_numpy=True)
    d4, d16 = make_timer(fsr, dinp, 4), make_timer(fsr, dinp, 16)

    # shell + transparent TF, bench's exact scene + TF swap order
    shell_geom = bench.build_shell_scene()
    sfsr = FastSceneRenderer(
        shell_geom, RenderParameters(width=1024, height=1024)
    )
    scam = auto_orbit_camera(sfsr.bounds)
    sfsr.set_transfer_function(color_map=color_map_from_tuples([
        (0.0, 0, 0, 0, 0.0), (0.3, 0, 0, 0, 0.0),
        (0.5, 1.0, 0.5, 0.2, 0.4), (1.0, 1.0, 1.0, 1.0, 0.8),
    ]))
    sinp = sfsr.frame_inputs(scam, as_numpy=True)
    s4, s8 = make_timer(sfsr, sinp, 4), make_timer(sfsr, sinp, 8)
    s16, s32 = make_timer(sfsr, sinp, 16), make_timer(sfsr, sinp, 32)
    print(f"compiles done at {time.perf_counter() - t_start:.0f}s", flush=True)

    dense, shell_a, shell_b = [], [], []
    for i in range(reps):
        dense.append((d16() - d4()) / 12.0)
        shell_a.append((s16() - s4()) / 12.0)   # bench.py's config
        shell_b.append((s32() - s8()) / 24.0)   # full-cap config
        print(
            f"rep {i}: dense {dense[-1]:.3f}  A(4,16) {shell_a[-1]:.3f}"
            f"  B(8,32) {shell_b[-1]:.3f}",
            flush=True,
        )

    out = {
        "reps": reps,
        "dense_ms": dense,
        "shell_a_ms": shell_a,
        "shell_b_ms": shell_b,
        "dense_median": float(np.median(dense)),
        "shell_a_median": float(np.median(shell_a)),
        "shell_b_median": float(np.median(shell_b)),
        "shell_a_spread": float(np.ptp(shell_a)),
        "shell_b_spread": float(np.ptp(shell_b)),
        "shell_b_grays": 1024 * 1024 / (float(np.median(shell_b)) * 1e-3) / 1e9,
        "wall_s": time.perf_counter() - t_start,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
