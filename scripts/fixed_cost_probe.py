"""Decomposition experiment: where does the sparse-scene march time go?

BENCH_r02 finding: a thin-shell scene (few samples/ray) renders no faster
than the dense scene — the march loop is bound by per-slice/per-item FIXED
costs, not sample math.  This probe fits the model

    t_frame = a * work_items + b * occupied_slices + c

from K-frame fori_loop wall clocks over SYNTHETIC work lists with
controlled (items/tile, occupied slices/item).  Items and bounds are
runtime data, so one compile per (brick depth, dma window) serves the
whole sweep.  The third axis (brick stored depth S with/without a trimmed
DMA window) separates per-item DMA cost from per-item compute cost:

  * if `a` shrinks when S drops (or when dma_slices trims the copy), the
    per-item cost is DMA-bound -> attack the copy size;
  * if `a` is S-invariant, the cost is issue/setup-bound -> attack the
    loop structure (merge items, batch tiles).

Run on the real TPU:  python scripts/fixed_cost_probe.py
(~3 compiles, ~2-4 min each through the relay; sweep itself is fast).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_synthetic(s_max: int, num_tiles: int, max_items: int):
    """One brick spanning the whole view; CSR lists repeat it per tile."""
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.ops import slicemarch as sm

    rng = np.random.default_rng(0)
    vol = rng.random((1, s_max, sm.SUBLANES, sm.LANES), np.float32)
    # permuted meta: march axis spans [0, 1] with s_max cells; transverse
    # axes huge so every ray stays inside
    meta = np.zeros((1, 12), np.float32)
    meta[0, 0:3] = (0.0, -50.0, -50.0)
    meta[0, 3:6] = (1.0, 50.0, 50.0)
    meta[0, 6:9] = (1.0 / s_max, 100.0 / 32, 100.0 / 32)
    dims = np.zeros((1, 8), np.int32)
    dims[0, :3] = (s_max, 32, 32)
    dims[0, 3:6] = (2, 0, 1)  # march world z
    dims[0, 6] = 32
    dims[0, 7] = s_max  # (0 << 16) | s_max
    lut = np.zeros((256, 4), np.float32)
    lut[:, :3] = 0.5
    lut[:, 3] = 0.02  # low alpha: no early-out, every slice pays
    packed_lut = sm.build_log_lut(lut)
    cam = sm.pack_camera(
        np.array([0.5, 0.5, -3.0]), np.array([0.0, 0.0, 1.0]),
        np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]),
        45.0, 1.0, 0.0, 1.0, 0.5 / s_max,
    )
    return (
        jnp.asarray(vol), jnp.asarray(meta), jnp.asarray(dims),
        jnp.asarray(packed_lut), jnp.asarray(cam),
    )


def csr_for(num_tiles: int, items_per_tile: int, occ_slices: int):
    import jax.numpy as jnp

    w = num_tiles * items_per_tile
    offsets = (np.arange(num_tiles + 1) * items_per_tile).astype(np.int32)
    bricks = np.zeros(w, np.int32)
    owners = np.arange(w, dtype=np.int32) % items_per_tile  # one run each
    ibounds = np.full(w, occ_slices, np.int32)  # (0 << 16) | occ
    if occ_slices == 0:
        ibounds[:] = (1 << 16) | 1  # empty range lo == hi
    return (
        jnp.asarray(offsets), jnp.asarray(bricks), jnp.asarray(owners),
        jnp.asarray(ibounds),
    )


def measure(args, width, height, s_max, dma_slices, K=20):
    import jax
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.ops import tilemarch as tm

    vol, meta, dims, lut, cam, offsets, bricks, owners, ibounds = args

    import os

    interpret = bool(os.environ.get("AVR_PROBE_CPU"))

    @jax.jit
    def frames(vol, meta, dims, lut, cam, offsets, bricks, owners, ibounds):
        def body(_, acc):
            out_c, _ = tm.tilemarch_render(
                vol, meta, dims, lut, cam, offsets, bricks, owners, ibounds,
                width=width, height=height, max_slices=s_max,
                dma_slices=dma_slices, interpret=interpret,
            )
            return acc + jnp.sum(out_c)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    a = (vol, meta, dims, lut, cam, offsets, bricks, owners, ibounds)
    chk = float(frames(*a))
    assert np.isfinite(chk)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(frames(*a))
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3 / K


def main():
    import os

    if os.environ.get("AVR_PROBE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        width = height = 64
    else:
        width = height = 1024
    num_tiles = (width // 32) * (height // 32)
    results = []
    for s_max, dma in [(32, None), (8, None), (32, 8)]:
        scene = build_synthetic(s_max, num_tiles, 8)
        for m in (1, 2, 4, 8):
            for k in (0, 4, 8):
                if k > s_max or (dma is not None and k > dma):
                    continue
                csr = csr_for(num_tiles, m, k)
                ms = measure(
                    scene + csr, width, height, s_max, dma,
                )
                row = dict(s_max=s_max, dma=dma, items_per_tile=m,
                           occ_slices=k, ms=round(ms, 3))
                results.append(row)
                print(json.dumps(row), flush=True)
        # deeper march points for the slice coefficient
        for m, k in ((1, s_max), (4, s_max), (2, s_max // 2)):
            if dma is not None and k > dma:
                continue
            csr = csr_for(num_tiles, m, k)
            ms = measure(scene + csr, width, height, s_max, dma)
            row = dict(s_max=s_max, dma=dma, items_per_tile=m,
                       occ_slices=k, ms=round(ms, 3))
            results.append(row)
            print(json.dumps(row), flush=True)

    # least-squares fit per (s_max, dma): t = a*items + b*slices + c
    print("\n--- fits: t_frame_ms = a*items + b*slices + c ---")
    for s_max, dma in [(32, None), (8, None), (32, 8)]:
        rows = [r for r in results if r["s_max"] == s_max and r["dma"] == dma]
        items = np.array([num_tiles * r["items_per_tile"] for r in rows], float)
        slices = np.array(
            [num_tiles * r["items_per_tile"] * r["occ_slices"] for r in rows],
            float,
        )
        t = np.array([r["ms"] for r in rows])
        A = np.stack([items, slices, np.ones_like(items)], 1)
        coef, res, *_ = np.linalg.lstsq(A, t, rcond=None)
        a_us = coef[0] * 1e3
        b_us = coef[1] * 1e3
        pred = A @ coef
        err = float(np.abs(pred - t).max())
        print(json.dumps(dict(
            s_max=s_max, dma=dma,
            a_us_per_item=round(a_us, 4), b_us_per_slice=round(b_us, 4),
            c_ms=round(float(coef[2]), 4), max_abs_err_ms=round(err, 3),
        )))


if __name__ == "__main__":
    main()
