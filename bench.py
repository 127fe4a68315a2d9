"""Headline benchmark: multi-level AMR frame, full BASELINE.json metric set.

BASELINE.md north-star: a 1024^2 *multi-level* AMR frame rendered AND
composited in under 50 ms per chip, with the declared metric set
"Mrays/s/chip; frame ms; composite exchange GB/s".  This benchmark builds a
genuine 3-level AMR hierarchy (64^3 base + two 2x refinements, flattened by
``convexify`` exactly like the product path, VolumeRenderer.cpp:670) and
renders it through the persistent-scene tile-loop mega-kernel
(fast_scene.FastSceneRenderer -> ops/tilemarch.py).

Reported numbers (all in the one JSON line; "extra" keys):
  value / frame_ms ......... device-only composited frame time (F frames in
                             ONE pallas launch, slope over F — the true
                             kernel time; `frame_ms_launch_chain` is the
                             same frame measured as one launch per
                             fori_loop step, which through this remote-TPU
                             relay adds ~1.3 ms/launch serialization)
  mrays_per_s .............. primary rays retired per second per chip
  host_prep_ms ............. per-frame host work from the persistent-scene
                             path: work list, slice bounds, depth sort,
                             camera packing (FastSceneRenderer.frame_inputs)
  frame_ms_e2e ............. one full render() call: host prep + dispatch +
                             kernel + [W*H,5] f32 readback.  Through the
                             axon relay this is dominated by the ~30 ms
                             dispatch/transfer latency; recorded to bound
                             the end-to-end contract honestly
                             (VolumeRenderer.cpp:1121-1136 times stages the
                             same way: paint + visibility + compositing)
  ici_mb_f32/ubyte ......... per-frame ICI exchange payload of the 8-device
                             depth-contiguous pipeline on THIS scene with
                             the coverage-rect compaction
                             (parallel/directsend.py:479-511) at float32 /
                             ubyte transport
  ici_gbps_to_hide_f32 ..... bandwidth the ICI must sustain for that
                             exchange to hide behind the measured frame
                             time (v4/v5 ICI links sustain O(100) GB/s, so
                             values far below that mean compositing is not
                             the bottleneck)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}
where vs_baseline = 50 ms / frame_ms (>1 means faster than target).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

TARGET_MS = 50.0
EXCHANGE_DEVICES = 8  # payload model for the multi-chip estimate


def radial_field(n: int, lo: float, hi: float) -> np.ndarray:
    """Smooth two-shell density over [lo,hi]^3 cell centers (values ~[0,1]):
    structure at every refinement level, nothing degenerate to cull."""
    c = lo + (np.arange(n) + 0.5) / n * (hi - lo)
    r = np.sqrt(
        (c[:, None, None] - 0.5) ** 2
        + (c[None, :, None] - 0.5) ** 2
        + (c[None, None, :] - 0.5) ** 2
    )
    f = np.exp(-((r - 0.18) / 0.06) ** 2) + 0.7 * np.exp(-((r - 0.38) / 0.05) ** 2)
    return f.astype(np.float64)


def build_three_level_scene():
    """64^3 base over [0,1]^3; 2x refinement over the central half; another
    2x over the central quarter — flattened through the product ingestion
    path (api.load_amr_geometry -> convexify -> build_scene_geometry)."""
    from amrvolumerenderer_tpu import api
    from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry

    n = 64
    level0 = [LevelBox(radial_field(n, 0.0, 1.0), np.zeros(3, dtype=int))]
    # level 1: [0.25, 0.75]^3 = 64^3 cells at 1/128, lo index 32
    level1 = [LevelBox(radial_field(n, 0.25, 0.75), np.full(3, 32, dtype=int))]
    # level 2: [0.375, 0.625]^3 = 64^3 cells at 1/256, lo index 96
    level2 = [LevelBox(radial_field(n, 0.375, 0.625), np.full(3, 96, dtype=int))]
    geoms = [
        LevelGeometry(np.zeros(3), np.full(3, 1.0 / n)),
        LevelGeometry(np.zeros(3), np.full(3, 1.0 / (2 * n))),
        LevelGeometry(np.zeros(3), np.full(3, 1.0 / (4 * n))),
    ]
    data = api.AmrData(
        level_data=[level0, level1, level2],
        level_geometry=geoms,
        refinement_ratios=[(2, 2, 2), (2, 2, 2)],
    )
    return api.load_amr_geometry(data, 0, -1, 0, False, True, verbose=False)


def build_shell_scene():
    """Single-level 128^3 domain (64 bricks of 32^3) holding a thin
    spherical shell: most cubes cull on transparency and the occupied-slice
    bounds trim the rest, so rays retire few samples — the scene class
    where the >=1 Gray/s north star is about ray-setup rate, not sample
    math throughput."""
    from amrvolumerenderer_tpu import api
    from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry

    n = 128
    c = (np.arange(n) + 0.5) / n
    r = np.sqrt(
        (c[:, None, None] - 0.5) ** 2
        + (c[None, :, None] - 0.5) ** 2
        + (c[None, None, :] - 0.5) ** 2
    )
    f = np.exp(-((r - 0.40) / 0.015) ** 2).astype(np.float64)
    boxes = [
        LevelBox(f[i:i + 32, j:j + 32, k:k + 32],
                 np.array([i, j, k], dtype=int))
        for i in range(0, n, 32)
        for j in range(0, n, 32)
        for k in range(0, n, 32)
    ]
    geoms = [LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))]
    data = api.AmrData(level_data=[boxes], level_geometry=geoms)
    return api.load_amr_geometry(data, 0, -1, 0, False, True, verbose=False)


def measure_device_frame(fsr, camera, width, height, K=None):
    """TRUE per-frame device time via the two-K slope method.

    Two invariants of the remote-TPU runtime poison naive measurements
    (both measured, scripts/fixed_cost_probe.py + round-3 controls):

    * every host->device dispatch costs ~26-30 ms, so a single timed call
      measures the link, not the kernel;
    * XLA HOISTS a loop-invariant body out of a ``fori_loop``, so "K
      frames in one loop" silently times ONE frame + K scalar adds — the
      round-2 numbers did exactly this.

    Fix: perturb an unused camera slot per iteration (defeats hoisting
    without changing any rendered pixel) and difference two loop lengths
    so the dispatch intercept cancels:
    frame_ms = (t_K2 - t_K1) / (K2 - K1)."""
    import jax
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.ops import tilemarch as tm

    if K is None:
        K = (10, 50) if jax.default_backend() == "tpu" else (1, 3)
    inputs = fsr.frame_inputs(camera)

    def make_loop_timer(k):
        """Compile the k-iteration launch chain ONCE and return a
        re-timeable thunk (the median sampling below must not pay a
        fresh trace + Mosaic compile per sample)."""
        @jax.jit
        def frames(vol, meta, dims, lut, cam, offsets, bricks, owners,
                   ibounds, tile_ids):
            def body(i, acc):
                # slot 19 of the camera pack is unused padding: varying it
                # defeats loop-invariant hoisting, pixels unchanged
                cam_i = cam.at[19].set(i.astype(jnp.float32))
                out_c, _out_d = tm.tilemarch_render(
                    vol, meta, dims, lut, cam_i, offsets, bricks, owners,
                    ibounds, tile_ids,
                    width=fsr.pad_w, height=fsr.pad_h, max_slices=fsr.cube,
                    logical_width=fsr.render_width,
                    logical_height=fsr.render_height,
                    interpret=fsr.interpret,
                    sampling=fsr.parameters.sampling,
                    ghost=fsr.ghost, dma_slices=inputs["dma_slices"],
                    classification=fsr.parameters.classification,
                )
                # strided checksum: the kernel fully materializes its
                # outputs; a full-frame reduce would add measurement tax
                return acc + jnp.sum(out_c[::8])

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        args = (
            fsr._packed_vol, inputs["meta"], inputs["dims"],
            fsr._lut_device, inputs["cam"], inputs["offsets"],
            inputs["bricks"], inputs["owners"], inputs["item_bounds"],
            inputs["tile_ids"],
        )
        checksum = float(frames(*args))  # compile + warm
        assert np.isfinite(checksum) and checksum > 0.0

        def timed():
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(frames(*args))
                times.append(time.perf_counter() - t0)
            return min(times) * 1e3

        return timed

    k1, k2 = K
    timer1 = make_loop_timer(k1)
    timer2 = make_loop_timer(k2)
    # median of 3 slope samples (execution only — the two launch chains
    # stay compiled): relay contention skews single samples both ways
    # (see measure_device_frame_single_launch)
    slopes = sorted((timer2() - timer1()) / (k2 - k1) for _ in range(3))
    return max(slopes[1], 1e-3)


def measure_device_frame_single_launch(fsr, camera, F=None, unroll=None):
    """TRUE per-frame KERNEL time: F frames in ONE pallas launch, slope
    over two F values.

    ``measure_device_frame``'s fori_loop runs one launch per iteration,
    and the remote-TPU runtime charges ~1.3 ms per serialized program
    step (scripts/fixed_cost_probe.py zero-work controls) — a relay
    artifact that is microseconds on directly attached chips, yet it
    lands on every iteration of the loop and so inflates the slope.
    ``tilemarch_render_batch`` flattens the frame axis into the pallas
    grid, so t(F) = dispatch + launch_tax + F * frame; differencing two
    F values cancels both fixed terms.  Frames differ only in the unused
    camera slot 19 (anti-hoist; pixels identical)."""
    import jax
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.ops import tilemarch as tm

    inputs = fsr.frame_inputs(camera, as_numpy=True)
    if F is None:
        if jax.default_backend() == "tpu":
            # deep-AMR scenes: [F, W] prefetch tables live in scoped SMEM,
            # so the batched frame count is capped per scene (512 bricks
            # at F=16 exhausts it — tm.max_batch_frames)
            cap = tm.max_batch_frames(
                len(inputs["tile_ids"]), len(inputs["bricks"]),
                inputs["meta"].shape[0],
                narrow=inputs.get("row_chords") is not None,
            )
            # f2=32 (not 16): the slope's signal is (f2-f1) x frame_ms
            # against relay jitter of +-2-3 ms per wall sample; at
            # f2=16 a sub-ms frame (the shell scenes) has a ~10 ms
            # signal and the slope scatters +-0.5 ms — the r4 shell
            # discrepancy.  Interleaved A/B (scripts/shell_ab_r05.py):
            # F=(8,32) cuts the spread 3x (0.21 vs 0.67 ms) with the
            # same median.
            f2 = min(32, cap)
            if f2 < 2:
                return measure_device_frame(
                    fsr, camera, fsr.render_width, fsr.render_height
                )
            F = (max(1, f2 // 4), f2)
        else:
            F = (1, 2)

    def make_timer(f):
        """Compile the F-frame launch ONCE and return a re-timeable thunk
        (the retry loop below must not pay a fresh trace + Mosaic compile
        per attempt)."""
        cams = np.tile(inputs["cam"], (f, 1)).astype(np.float32)
        cams[:, 19] = np.arange(f)  # unused slot: defeats CSE across frames

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
            return jnp.sum(out_c[:, ::8])  # strided checksum readback

        tile = lambda a: jnp.asarray(np.tile(a[None], (f,) + (1,) * a.ndim))
        args = (
            fsr._packed_vol, jnp.asarray(inputs["meta"]),
            jnp.asarray(inputs["dims"]), fsr._lut_device, jnp.asarray(cams),
            tile(inputs["offsets"]), tile(inputs["bricks"]),
            tile(inputs["owners"]), tile(inputs["item_bounds"]),
            tile(inputs["tile_ids"]),
        ) + ((tile(inputs["row_chords"]),) if narrow else ())
        checksum = float(frames(*args))  # compile + warm
        assert np.isfinite(checksum) and checksum > 0.0

        def timed():
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(frames(*args))
                times.append(time.perf_counter() - t0)
            return min(times) * 1e3

        return timed

    f1, f2 = F
    timer1 = make_timer(f1)
    timer2 = make_timer(f2)
    # TPU contention makes wall clocks vary run to run — measured up to
    # +-40% between back-to-back reps through the relay on a bad session.
    # Inflated t(F1) pushes the slope DOWN (observed once as a "0.0 ms
    # frame" = 1048 Gray/s), inflated t(F2) pushes it UP, so a best-of
    # pick is biased and a single sample is a lottery: take the MEDIAN
    # of several slope samples, dropping physically impossible ones (no
    # composited frame beats ~50 Gray/s on this chip).  Execution only —
    # the launches above stay compiled.
    min_plausible = (
        fsr.render_width * fsr.render_height / 50e9 * 1e3
    )  # ms
    slopes = []
    for _attempt in range(5):
        s = (timer2() - timer1()) / (f2 - f1)
        if s > min_plausible:
            slopes.append(s)
    if slopes:
        return float(np.median(slopes))
    return min_plausible


def exchange_payload_bytes(fsr, camera, num_devices: int):
    """Static per-frame ICI payload of the depth-contiguous multi-chip
    pipeline on this scene: (D-1) rect-compacted frames cross the links per
    all_to_all round (render_depth_contiguous_slicemarch).  Returns
    (bytes_f32, bytes_ubyte, rect_fraction)."""
    from amrvolumerenderer_tpu.camera import camera_basis
    from amrvolumerenderer_tpu.ops import slicemarch as sm
    from amrvolumerenderer_tpu.parallel.directsend import coverage_rect

    forward, right, up = camera_basis(camera)
    _wb, _wt, coverage = sm.compute_worklist(
        fsr.box_min, fsr.box_max, np.asarray(camera.eye), forward, right, up,
        camera.fov_y_degrees, fsr.pad_w, fsr.pad_h,
        logical_width=fsr.render_width, logical_height=fsr.render_height,
    )
    rect = coverage_rect(
        coverage, fsr.pad_w, fsr.pad_h, sm.TILE_W, sm.TILE_H, num_devices
    )
    rect_px = rect[2] * rect[3] if rect else fsr.pad_w * fsr.pad_h
    frac = rect_px / float(fsr.render_width * fsr.render_height)
    shards = num_devices - 1  # the self-chunk never crosses a link
    bytes_f32 = shards * rect_px * 5 * 4  # rgba + depth, f32
    bytes_ubyte = shards * rect_px * (4 * 1 + 4)  # rgba bytes + f32 depth
    return bytes_f32, bytes_ubyte, frac


def measure_link():
    """Per-run relay calibration (VERDICT r4 #5): raw dispatch latency and
    readback bandwidth via no-kernel controls, so e2e numbers can be
    normalized across rounds instead of tracking relay weather (measured
    32 MB/s in r3 vs 7-9 MB/s in r4 with an unchanged renderer).

    Returns (dispatch_ms, readback_mbps)."""
    import jax
    import jax.numpy as jnp

    tiny = jnp.zeros((1,), jnp.float32)
    bump = jax.jit(lambda a: a + 1.0)
    float(bump(tiny)[0])  # warm/compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(bump(tiny)[0])
        times.append(time.perf_counter() - t0)
    dispatch_ms = min(times) * 1e3

    mb = 16.0
    big = jax.device_put(np.zeros((int(mb * 1e6 / 4),), np.float32))
    add = jax.jit(lambda a, t: a + t)
    np.asarray(add(big, jnp.float32(0.0)))  # warm/compile
    times = []
    for i in range(3):
        # a FRESH result buffer per rep: jax.Array caches its host copy
        # after the first np.asarray, so re-reading the same buffer times
        # a no-op, not the link
        out = add(big, jnp.float32(i + 1))
        t0 = time.perf_counter()
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    readback_mbps = mb / min(times)
    return round(dispatch_ms, 2), round(readback_mbps, 2)


# cross-round e2e numbers are reported normalized to this readback rate
# (the r3 session's measured link) alongside the raw wall clock
NORM_MBPS = 32.0


def measure_config5(geometry, budget_left):
    """BASELINE config 5 (VERDICT r4 #4): 2048^2 AA=4 — a 4096^2
    supersampled render buffer (VolumeRenderer.cpp:1116-1119), 16x the
    headline pixel count.  The SMEM frame-table budget admits NO batched
    frame count at 6144 tiles (tm.max_batch_frames == 0), so the batch
    path chunks to single frames through the frameless kernel — this
    config certifies exactly that regime plus HBM behavior at 335 MB of
    frame buffers.  Returns (frame_ms, batch_split | None)."""
    import dataclasses as dc

    from amrvolumerenderer_tpu.camera import auto_orbit_camera
    from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer
    from amrvolumerenderer_tpu.types import RenderParameters

    fsr = FastSceneRenderer(
        geometry, RenderParameters(width=2048, height=2048, antialiasing=4)
    )
    camera = auto_orbit_camera(fsr.bounds)
    # slope over the fori_loop launch chain: the batched single-launch
    # path is unavailable here by design (cap 0), and at ~16x the 1024^2
    # frame time the ~1.3 ms/launch relay tax is <3% of the slope
    frame_ms = measure_device_frame(
        fsr, camera, fsr.render_width, fsr.render_height, K=(2, 6)
    )

    batch_split = None
    if budget_left():
        B = 4
        center = 0.5 * (fsr.bounds.min_corner + fsr.bounds.max_corner)
        base = np.asarray(camera.eye) - center
        orbit = []
        for k in range(B):
            ang = 2 * np.pi * k / (4 * B)
            c, s = np.cos(ang), np.sin(ang)
            eye = center + np.array([
                c * base[0] + s * base[2], base[1],
                -s * base[0] + c * base[2],
            ])
            orbit.append(dc.replace(camera, eye=(eye[0], eye[1], eye[2])))
        fsr.render_batch(orbit, overlay=False, bytes_out=True)  # warm
        t0 = time.perf_counter()
        fsr.render_batch(orbit, overlay=False, bytes_out=True)
        total_ms = (time.perf_counter() - t0) * 1e3
        batch_split = dict(fsr.last_batch_stats)
        batch_split["wall_ms_per_frame"] = round(total_ms / B, 2)
    return frame_ms, batch_split


def measure_host_prep_512():
    """Cold/warm prepare_slicemarch_scene wall clock on a 512-brick scene
    (256^3 domain in 32^3 bricks) — host-only, no device involvement."""
    from amrvolumerenderer_tpu import api
    from amrvolumerenderer_tpu.camera import auto_orbit_camera
    from amrvolumerenderer_tpu.renderer import (
        compute_global_bounds,
        compute_reference_sample_distance,
    )
    from amrvolumerenderer_tpu.renderer_fast import prepare_slicemarch_scene
    from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry
    from amrvolumerenderer_tpu.types import RenderParameters

    n, bs = 256, 32
    field = radial_field(n, 0.0, 1.0).astype(np.float32)
    boxes = [
        LevelBox(field[i:i + bs, j:j + bs, k:k + bs],
                 np.array([i, j, k], dtype=int))
        for i in range(0, n, bs)
        for j in range(0, n, bs)
        for k in range(0, n, bs)
    ]
    geoms = [LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))]
    data = api.AmrData(level_data=[boxes], level_geometry=geoms)
    geometry = api.load_amr_geometry(data, 0, -1, 0, False, True,
                                     verbose=False)
    params = RenderParameters(width=1024, height=1024)
    bounds = compute_global_bounds(geometry)
    rsd = compute_reference_sample_distance(geometry, bounds)
    camera = auto_orbit_camera(bounds)

    t0 = time.perf_counter()
    prepare_slicemarch_scene(
        geometry, params, camera, (0.0, 1.0), rsd, 1024, 1024, None
    )
    cold = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        prepare_slicemarch_scene(
            geometry, params, camera, (0.0, 1.0), rsd, 1024, 1024, None
        )
    warm = (time.perf_counter() - t0) * 1e3 / reps
    return round(cold, 1), round(warm, 2)


def main() -> None:
    import jax

    platform = os.environ.get("AVR_BENCH_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.camera import auto_orbit_camera
    from amrvolumerenderer_tpu.fast_scene import FastSceneRenderer
    from amrvolumerenderer_tpu.ops import tilemarch as tm
    from amrvolumerenderer_tpu.types import RenderParameters

    from amrvolumerenderer_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()  # relaunches skip remote compiles

    # If the TPU relay is down (axon registration failed / backend init
    # raises), fall back to CPU so the one-line JSON contract still holds;
    # the "platform" extra makes the degraded run unmistakable.
    try:
        backend = jax.default_backend()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        backend = jax.default_backend()
    on_tpu = backend == "tpu"
    width = height = 1024 if on_tpu else 128  # CPU fallback keeps CI fast

    # soft wall-clock budget: the required metrics always complete and the
    # JSON line ALWAYS prints; optional sections (batched orbit, shell
    # scenes) are skipped once the budget is spent or on any error, so a
    # driver-side timeout can't swallow the whole benchmark
    bench_t0 = time.perf_counter()
    budget_s = float(os.environ.get("AVR_BENCH_BUDGET_S", "1300"))

    def budget_left() -> bool:
        return (time.perf_counter() - bench_t0) < budget_s

    geometry = build_three_level_scene()
    parameters = RenderParameters(width=width, height=height)
    fsr = FastSceneRenderer(geometry, parameters)
    camera = auto_orbit_camera(fsr.bounds)

    # ---- per-frame host work (persistent-scene path) --------------------
    inputs = fsr.frame_inputs(camera)  # first call also packs the march axis
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        inputs = fsr.frame_inputs(camera)
    host_prep_ms = (time.perf_counter() - t0) * 1e3 / reps

    # ---- device-only composited frame ----------------------------------
    # Two measurements, both slope-based (dispatch intercept cancelled):
    #   frame_ms_launch_chain: K sequential launches in one fori_loop —
    #     includes the ~1.3 ms/step serialization tax this remote-TPU
    #     runtime charges per launch (a relay artifact, microseconds on
    #     directly attached chips);
    #   frame_ms (headline): F frames flattened into ONE pallas launch
    #     (tilemarch_render_batch) — the true per-frame kernel time, what
    #     direct-attached hardware retires per frame.
    frame_ms_chain = measure_device_frame(fsr, camera, width, height)
    try:
        frame_ms = measure_device_frame_single_launch(fsr, camera)
    except Exception:
        frame_ms = frame_ms_chain
    mrays_per_s = (fsr.render_width * fsr.render_height) / (frame_ms * 1e-3) / 1e6

    # ---- relay link calibration (no-kernel controls) --------------------
    link_dispatch_ms = link_readback_mbps = None
    try:
        link_dispatch_ms, link_readback_mbps = measure_link()
    except Exception:
        pass

    # ---- end-to-end render() wall clock (host + dispatch + readback) ----
    fsr.render(camera, overlay=False)  # warm
    e2e = []
    for _ in range(3):
        t0 = time.perf_counter()
        fsr.render(camera, overlay=False)
        e2e.append(time.perf_counter() - t0)
    frame_ms_e2e = min(e2e) * 1e3

    # ---- batched animation path: B frames per dispatch ------------------
    # render_batch amortizes the dispatch/readback latency that dominates
    # frame_ms_e2e over a whole camera-orbit chunk (one scan dispatch, one
    # readback); this is the per-frame e2e number animation users see.
    B = 8
    center = 0.5 * (fsr.bounds.min_corner + fsr.bounds.max_corner)
    base = np.asarray(camera.eye) - center
    orbit = []
    for k in range(B):
        ang = 2 * np.pi * k / (4 * B)  # stay within one march-axis octant
        c, s = np.cos(ang), np.sin(ang)
        eye = center + np.array(
            [c * base[0] + s * base[2], base[1], -s * base[0] + c * base[2]]
        )
        orbit.append(
            dataclasses.replace(camera, eye=(eye[0], eye[1], eye[2]))
        )
    # bytes_out: frames leave the device already byte-coded (the PPM/PNG
    # consumer's format), shrinking the readback 5x
    frame_ms_e2e_batch = None
    batch_stats = None
    try:
        if budget_left():
            fsr.render_batch(orbit, overlay=False, bytes_out=True)  # warm
            eb = []
            for _ in range(3):
                t0 = time.perf_counter()
                fsr.render_batch(orbit, overlay=False, bytes_out=True)
                eb.append(time.perf_counter() - t0)
                if min(eb) == eb[-1]:
                    batch_stats = dict(fsr.last_batch_stats)
            frame_ms_e2e_batch = min(eb) * 1e3 / B
    except Exception:
        pass

    # ---- kernel sample throughput ---------------------------------------
    # The Gray/s north star is scene-dependent (a ray's cost is its marched
    # samples, and multi-level scenes march several pieces per ray), so
    # also report the scene-independent rate: (tile pixels x occupied
    # slices) summed over the work list, per second.  This is the number
    # the march loop actually retires.
    np_inputs = fsr.frame_inputs(camera, as_numpy=True)
    occ = np_inputs["item_bounds"].astype(np.int64)  # what the kernel marches
    occupied_slices = (occ & 0xFFFF) - (occ >> 16)
    tile_pixels = 8 * 128
    samples_per_frame = float(np.maximum(occupied_slices, 0).sum()) * tile_pixels
    gsamples_per_s = samples_per_frame / (frame_ms * 1e-3) / 1e9

    # ---- sparse-shell scene: the Gray/s regime ---------------------------
    # The dense multi-level frame is samples-bound (each ray retires ~40+
    # samples), so Gray/s there measures sample math, not ray rate.  A thin
    # shell — the common production case for interval/isosurface-like
    # transfer functions — lets transparency culling and occupied-slice
    # bounds cut samples/ray to a handful; this is where the >=1 Gray/s
    # north star lives.
    shell_ms = shell_grays = shell_tf_ms = shell_tf_grays = None
    try:
        if budget_left():
            shell_geom = build_shell_scene()
            shell_fsr = FastSceneRenderer(
                shell_geom, RenderParameters(width=width, height=height)
            )
            shell_cam = auto_orbit_camera(shell_fsr.bounds)
            shell_ms = measure_device_frame_single_launch(shell_fsr, shell_cam)
            shell_grays = (width * height) / (shell_ms * 1e-3) / 1e9

        # same shell under a transfer function with a transparent range
        # (how production shells are actually visualized): the per-(tile,
        # brick) slice bounds + empty-item culling get to cut real work
        if shell_ms is not None and budget_left():
            from amrvolumerenderer_tpu.types import color_map_from_tuples

            shell_fsr.set_transfer_function(color_map=color_map_from_tuples([
                (0.0, 0, 0, 0, 0.0), (0.3, 0, 0, 0, 0.0),
                (0.5, 1.0, 0.5, 0.2, 0.4), (1.0, 1.0, 1.0, 1.0, 0.8),
            ]))
            shell_tf_ms = measure_device_frame_single_launch(
                shell_fsr, shell_cam
            )
            shell_tf_grays = (width * height) / (shell_tf_ms * 1e-3) / 1e9
    except Exception:
        pass

    # ---- BASELINE config 5: 2048^2 AA=4 (4096^2 render buffer) ----------
    cfg5_ms = cfg5_split = None
    try:
        if on_tpu and budget_left():
            cfg5_ms, cfg5_split = measure_config5(geometry, budget_left)
    except Exception:
        pass

    # ---- rgb readback (after the shell sections: this one is the first
    # to sacrifice when the soft budget runs out) -------------------------
    # the batched path is readback-bound on this link (e2e_batch8_split);
    # dropping the alpha byte shrinks the wire 25%, but single-session
    # numbers have disagreed in both directions (r3: README 204 -> 106
    # vs BENCH 160 -> 191) — scripts/rgb_ab.py is the interleaved
    # median-of-5 arbiter; this one-shot sample is recorded for trend
    # only
    frame_ms_e2e_batch_rgb = None
    try:
        if frame_ms_e2e_batch is not None and budget_left():
            fsr.render_batch(orbit, overlay=False, bytes_out="rgb")  # warm
            eb = []
            for _ in range(3):
                t0 = time.perf_counter()
                fsr.render_batch(orbit, overlay=False, bytes_out="rgb")
                eb.append(time.perf_counter() - t0)
            frame_ms_e2e_batch_rgb = min(eb) * 1e3 / B
    except Exception:
        pass

    # ---- multi-chip exchange payload model -------------------------------
    bytes_f32, bytes_ubyte, rect_frac = exchange_payload_bytes(
        fsr, camera, EXCHANGE_DEVICES
    )
    ici_gbps = bytes_f32 / (frame_ms * 1e-3) / 1e9

    # ---- measured exchange (virtual mesh): wall-clocked composite + HLO
    # collective bytes, replacing trust in the hand model (the reference
    # times compositing every run, VolumeRenderer.cpp:1247-1253).  The
    # wall clock is a CPU-mesh regression guard, not a TPU number; the
    # link bytes are exact (from the compiled collectives).
    measured_exchange = None
    try:
        if budget_left():
            import subprocess
            import sys

            rect_px = int(round(bytes_f32 / ((EXCHANGE_DEVICES - 1) * 5 * 4)))
            num_pieces = int(fsr.canonical.shape[0])
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(os.path.dirname(__file__), "scripts",
                                 "measure_exchange.py"),
                    str(rect_px), str(num_pieces), str(EXCHANGE_DEVICES),
                ],
                capture_output=True, text=True, timeout=540,
                env={**os.environ, "JAX_PLATFORMS": "cpu",
                     "PYTHONPATH": os.path.dirname(os.path.abspath(__file__))
                     + os.pathsep + os.environ.get("PYTHONPATH", "")},
            )
            line = proc.stdout.strip().splitlines()[-1]
            measured_exchange = json.loads(line)
    except Exception:
        pass

    # ---- host prep at 512 bricks (one-shot product path) -----------------
    # cold = first render of a new geometry (pack + extrema); warm = every
    # further frame (worklist + per-item bounds only, pack cached)
    prep512_cold_ms = prep512_warm_ms = None
    try:
        if budget_left():
            prep512_cold_ms, prep512_warm_ms = measure_host_prep_512()
    except Exception:
        pass

    def opt(value, digits):
        return round(value, digits) if value is not None else None

    extra = {
        "scene": (
            f"3-level AMR (convexify), {fsr.canonical.shape[0]} "
            f"pieces, {width}x{height}"
        ),
        "mrays_per_s_per_chip": round(mrays_per_s, 1),
        "gsamples_per_s": round(gsamples_per_s, 2),
        "frame_ms_launch_chain": round(frame_ms_chain, 2),
        "sparse_shell_frame_ms": opt(shell_ms, 2),
        "sparse_shell_grays_per_s": opt(shell_grays, 3),
        "sparse_shell_tf_frame_ms": opt(shell_tf_ms, 2),
        "sparse_shell_tf_grays_per_s": opt(shell_tf_grays, 3),
        "host_prep_ms": round(host_prep_ms, 2),
        "host_prep_512_cold_ms": prep512_cold_ms,
        "host_prep_512_warm_ms": prep512_warm_ms,
        "frame_ms_e2e": round(frame_ms_e2e, 2),
        "frame_ms_e2e_batch8": opt(frame_ms_e2e_batch, 2),
        "frame_ms_e2e_batch8_rgb": opt(frame_ms_e2e_batch_rgb, 2),
        "link_dispatch_ms": link_dispatch_ms,
        "link_readback_mbps": link_readback_mbps,
        "frame_ms_2048_aa4": opt(cfg5_ms, 2),
        "ici_exchange_mb_f32": round(bytes_f32 / 1e6, 2),
        "ici_exchange_mb_ubyte": round(bytes_ubyte / 1e6, 2),
        "ici_rect_fraction": round(rect_frac, 3),
        "ici_gbps_to_hide_f32": round(ici_gbps, 2),
        "exchange_devices": EXCHANGE_DEVICES,
        "platform": backend,
    }
    # link-normalized e2e (VERDICT r4 #5): subtract the measured readback
    # and charge it at NORM_MBPS instead, so BENCH_rN e2e lines compare
    # across rounds instead of tracking relay weather
    if link_readback_mbps:
        rb_mb = fsr.render_width * fsr.render_height * 5 * 4 / 1e6
        extra["frame_ms_e2e_at_32mbps"] = round(
            frame_ms_e2e - rb_mb / link_readback_mbps * 1e3
            + rb_mb / NORM_MBPS * 1e3, 2,
        )
    if batch_stats is not None:
        extra["e2e_batch8_split"] = {
            k: round(v, 2) if isinstance(v, float) else v
            for k, v in batch_stats.items()
        }
        if {"total_ms", "readback_ms", "readback_mb", "frames"} <= set(
            batch_stats
        ):
            extra["frame_ms_e2e_batch8_at_32mbps"] = round(
                (batch_stats["total_ms"] - batch_stats["readback_ms"]
                 + batch_stats["readback_mb"] / NORM_MBPS * 1e3)
                / batch_stats["frames"], 2,
            )
    if cfg5_split is not None:
        extra["e2e_2048_aa4_batch4_split"] = {
            k: round(v, 2) if isinstance(v, float) else v
            for k, v in cfg5_split.items()
        }
    if measured_exchange is not None:
        # HLO-derived link bytes (exact) + CPU-mesh composite wall clock
        # (regression guard); *_link_mb_total is directly comparable to
        # the ici_exchange_mb_* model numbers above
        extra["ici_measured"] = measured_exchange
    print(
        json.dumps(
            {
                "metric": "amr_frame_1024_composited",
                "value": round(frame_ms, 2),
                "unit": "ms",
                "vs_baseline": round(TARGET_MS / frame_ms, 3),
                "extra": {k: v for k, v in extra.items() if v is not None},
            }
        )
    )


if __name__ == "__main__":
    main()
