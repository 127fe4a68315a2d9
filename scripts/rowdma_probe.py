#!/usr/bin/env python3
"""Minimal Mosaic feasibility probe: can a brick DMA window the SUBLANE
dim with a dynamic start?  (pl.ds on the 2nd-minor axis of an HBM->VMEM
async copy, per-grid-step start index from a prefetched scalar table.)

The tilemarch row-window optimization rides on this primitive; run it
standalone BEFORE wiring the kernel so a refusal can't cost a full
build-out (and a tiny shape keeps any Mosaic failure cheap).
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, ROWS, LANES = 3, 4, 8, 128
R = 2  # windowed sublane rows
NS = 2  # windowed slices


def kernel(rb_ref, sb_ref, vol_hbm, out_ref, buf, sem):
    step = pl.program_id(0)
    rb = rb_ref[step]
    sb = sb_ref[step]
    copy = pltpu.make_async_copy(
        vol_hbm.at[step, pl.ds(sb, NS), pl.ds(rb, R)], buf, sem
    )
    copy.start()
    copy.wait()
    out_ref[0] = buf[...]


def main() -> int:
    vol = np.arange(B * S * ROWS * LANES, dtype=np.float32).reshape(
        B, S, ROWS, LANES
    )
    rb = np.array([0, 3, 6], np.int32)
    sb = np.array([1, 0, 2], np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, NS, R, LANES), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        scratch_shapes=[
            pltpu.VMEM((NS, R, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, NS, R, LANES), jnp.float32)],
    )
    (out,) = jax.jit(fn)(jnp.asarray(rb), jnp.asarray(sb), jnp.asarray(vol))
    out = np.asarray(out)
    want = np.stack(
        [vol[i, sb[i]:sb[i] + NS, rb[i]:rb[i] + R] for i in range(B)]
    )
    ok = np.array_equal(out, want)
    print("backend:", jax.default_backend())
    print("match:", ok)
    if not ok:
        print("out[0,0,:, :6]", out[0, 0, :, :6])
        print("want[0,0,:, :6]", want[0, 0, :, :6])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
