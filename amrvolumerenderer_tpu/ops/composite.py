"""Pallas tile-space compositor: fold all brick layers in VMEM per tile.

The XLA fold (`compositor._composite_sorted_runs`) re-reads and re-writes
the [P, 5] accumulator per layer, making the composite HBM-bound.  This
kernel loads *all* layers' pixels for one tile into VMEM (L x 20 KB) and
folds them in registers, so every layer is read exactly once and the
result written once — plus the coverage mask and the depth-hint ordering
are applied inline via scalar-prefetch arrays.

Semantics match ``composeLayered``'s run-grouped depth-sort blend
(DirectSendBase.cpp:378-446 / ImageRGBAFloatColorDepthSort.hpp:13-27).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE_P = LANES * SUBLANES


def _kernel(
    order_ref,  # [L] i32 scalar prefetch: blend order (front first)
    owners_ref,  # [L] i32 scalar prefetch: owner of sorted layer i
    cover_ref,  # [L, T] i32 scalar prefetch: coverage per (layer, tile)
    colors_ref,  # [L, 1, 4, SUBLANES, LANES] VMEM (this tile, all layers)
    depths_ref,  # [L, 1, SUBLANES, LANES] VMEM
    out_color_ref,  # [1, 4, SUBLANES, LANES]
    out_depth_ref,  # [1, SUBLANES, LANES]
    *,
    num_layers: int,
):
    t = pl.program_id(0)
    inf = jnp.float32(np.inf)

    def load(i):
        b = order_ref[i]
        covered = cover_ref[b, t] != 0
        planes = tuple(
            jnp.where(covered, colors_ref[b, 0, ch], 0.0) for ch in range(4)
        )
        d = jnp.where(covered, depths_ref[b, 0], inf)
        return planes, d

    def blend(top_c, top_d, bot_c, bot_d):
        # depth-sorted over blend (ImageRGBAFloatColorDepthSort.hpp:13-27);
        # channels kept as separate [8, 128] planes (Mosaic-friendly selects)
        top_front = top_d <= bot_d
        front_a = jnp.where(top_front, top_c[3], bot_c[3])
        one_minus = 1.0 - front_a
        out_c = tuple(
            jnp.where(top_front, top_c[ch], bot_c[ch])
            + jnp.where(top_front, bot_c[ch], top_c[ch]) * one_minus
            for ch in range(4)
        )
        return out_c, jnp.minimum(top_d, bot_d)

    def select_planes(pred, a, b):
        return tuple(jnp.where(pred, a[ch], b[ch]) for ch in range(4))

    # derive the empty carries from loaded refs so their vector layouts
    # match the loop body's (replicated-constant inits trigger an invalid
    # Mosaic relayout at the loop boundary); sanitize first — unscheduled
    # blocks hold uninitialized memory and NaN * 0 = NaN
    probe = colors_ref[0, 0, 0]
    zero = jnp.where(jnp.isfinite(probe), probe, 0.0) * 0.0
    empty_c = (zero, zero, zero, zero)
    empty_d = zero + inf

    def body(i, carry):
        run_c, run_d, tot_c, tot_d, have_tot = carry
        c, d = load(i)
        same_owner = jnp.logical_and(i > 0, owners_ref[i] == owners_ref[i - 1])

        closed_c, closed_d = blend(tot_c, tot_d, run_c, run_d)
        closed_c = select_planes(have_tot, closed_c, run_c)
        closed_d = jnp.where(have_tot, closed_d, run_d)
        tot_c = select_planes(same_owner, tot_c, closed_c)
        tot_d = jnp.where(same_owner, tot_d, closed_d)
        have_tot = jnp.where(
            same_owner, have_tot, jnp.logical_or(have_tot, i > 0)
        )

        ext_c, ext_d = blend(run_c, run_d, c, d)
        run_c = select_planes(same_owner, ext_c, c)
        run_d = jnp.where(same_owner, ext_d, d)
        return run_c, run_d, tot_c, tot_d, have_tot

    run_c, run_d, tot_c, tot_d, have_tot = jax.lax.fori_loop(
        0, num_layers, body,
        (empty_c, empty_d, empty_c, empty_d, jnp.asarray(False)),
    )
    fin_c, fin_d = blend(tot_c, tot_d, run_c, run_d)
    out_c = select_planes(have_tot, fin_c, run_c)
    for ch in range(4):
        out_color_ref[0, ch] = out_c[ch]
    out_depth_ref[0] = jnp.where(have_tot, fin_d, run_d)


# past this many layers the single-pass kernel's per-tile VMEM block
# (L x 20 KB) no longer fits; stream from HBM instead
VMEM_LAYER_LIMIT = 96


@functools.partial(jax.jit, static_argnames=("interpret",))
def composite_tiles(
    colors: jnp.ndarray,  # [L, T, 4, SUBLANES, LANES] channel-plane layers
    depths: jnp.ndarray,  # [L, T, SUBLANES, LANES]
    order: jnp.ndarray,  # [L] i32 blend order (front first)
    owners_sorted: jnp.ndarray,  # [L] i32 owner of sorted layer i
    coverage: jnp.ndarray,  # [L, T] i32/bool — which (layer, tile) are valid
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite tile-ordered layers; returns ([T, 4, S, L], [T, S, L]).

    Layer counts past ``VMEM_LAYER_LIMIT`` automatically stream through the
    double-buffered HBM variant (``composite_tiles_hbm``)."""
    num_layers, num_tiles = colors.shape[0], colors.shape[1]
    if num_layers > VMEM_LAYER_LIMIT:
        return composite_tiles_hbm(
            colors, depths, order, owners_sorted, coverage,
            interpret=interpret,
        )
    kernel = functools.partial(_kernel, num_layers=num_layers)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (num_layers, 1, 4, SUBLANES, LANES),
                lambda t, *_: (0, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (num_layers, 1, SUBLANES, LANES), lambda t, *_: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, SUBLANES, LANES), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 4, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, SUBLANES, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        order.astype(jnp.int32),
        owners_sorted.astype(jnp.int32),
        coverage.astype(jnp.int32),
        colors,
        depths,
    )


def _kernel_hbm(
    order_ref,  # [L] i32 blend order (front first)
    owners_ref,  # [L] i32 owner of sorted layer i
    cover_ref,  # [L, T] i32 coverage
    colors_hbm,  # [L, T, 4, SUBLANES, LANES] in HBM/ANY
    depths_hbm,  # [L, T, SUBLANES, LANES] in HBM/ANY
    out_color_ref,  # [1, 4, SUBLANES, LANES]
    out_depth_ref,  # [1, SUBLANES, LANES]
    cbuf,  # VMEM [2, 4, SUBLANES, LANES]
    dbuf,  # VMEM [2, SUBLANES, LANES]
    csem,
    dsem,
    *,
    num_layers: int,
):
    """Chunked variant: layers stream through a double-buffered VMEM pair,
    so VMEM use is O(1) in the layer count (the single-pass kernel loads
    all L x 20 KB per tile).  Fold semantics identical to ``_kernel``."""
    t = pl.program_id(0)
    inf = jnp.float32(np.inf)

    def start(i, slot):
        @pl.when(i < num_layers)
        def _():
            b = order_ref[i]
            pltpu.make_async_copy(
                colors_hbm.at[b, t], cbuf.at[slot], csem.at[slot]
            ).start()
            pltpu.make_async_copy(
                depths_hbm.at[b, t], dbuf.at[slot], dsem.at[slot]
            ).start()

    def blend(top_c, top_d, bot_c, bot_d):
        top_front = top_d <= bot_d
        front_a = jnp.where(top_front, top_c[3], bot_c[3])
        one_minus = 1.0 - front_a
        out_c = tuple(
            jnp.where(top_front, top_c[ch], bot_c[ch])
            + jnp.where(top_front, bot_c[ch], top_c[ch]) * one_minus
            for ch in range(4)
        )
        return out_c, jnp.minimum(top_d, bot_d)

    def select_planes(pred, a, b):
        return tuple(jnp.where(pred, a[ch], b[ch]) for ch in range(4))

    # derive the empty carries from a loaded ref so their vector layouts
    # match the loop body's (see _kernel: replicated-constant inits trip an
    # invalid Mosaic relayout at the loop boundary); the scratch buffer is
    # uninitialized here, so sanitize NaNs before multiplying by zero
    probe = cbuf[0, 0]
    zero = jnp.where(jnp.isfinite(probe), probe, 0.0) * 0.0
    empty_c = (zero, zero, zero, zero)
    empty_d = zero + inf

    start(0, jnp.int32(0))

    def body(i, carry):
        run_c, run_d, tot_c, tot_d, have_tot = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)
        start(i + 1, nxt)
        b = order_ref[i]
        pltpu.make_async_copy(
            colors_hbm.at[b, t], cbuf.at[slot], csem.at[slot]
        ).wait()
        pltpu.make_async_copy(
            depths_hbm.at[b, t], dbuf.at[slot], dsem.at[slot]
        ).wait()
        covered = cover_ref[b, t] != 0
        c = tuple(jnp.where(covered, cbuf[slot, ch], 0.0) for ch in range(4))
        d = jnp.where(covered, dbuf[slot], inf)

        same_owner = jnp.logical_and(i > 0, owners_ref[i] == owners_ref[i - 1])
        closed_c, closed_d = blend(tot_c, tot_d, run_c, run_d)
        closed_c = select_planes(have_tot, closed_c, run_c)
        closed_d = jnp.where(have_tot, closed_d, run_d)
        tot_c = select_planes(same_owner, tot_c, closed_c)
        tot_d = jnp.where(same_owner, tot_d, closed_d)
        have_tot = jnp.where(
            same_owner, have_tot, jnp.logical_or(have_tot, i > 0)
        )
        ext_c, ext_d = blend(run_c, run_d, c, d)
        run_c = select_planes(same_owner, ext_c, c)
        run_d = jnp.where(same_owner, ext_d, d)
        return run_c, run_d, tot_c, tot_d, have_tot

    run_c, run_d, tot_c, tot_d, have_tot = jax.lax.fori_loop(
        0, num_layers, body,
        (empty_c, empty_d, empty_c, empty_d, jnp.asarray(False)),
    )
    fin_c, fin_d = blend(tot_c, tot_d, run_c, run_d)
    out_c = select_planes(have_tot, fin_c, run_c)
    for ch in range(4):
        out_color_ref[0, ch] = out_c[ch]
    out_depth_ref[0] = jnp.where(have_tot, fin_d, run_d)


@functools.partial(jax.jit, static_argnames=("interpret",))
def composite_tiles_hbm(
    colors: jnp.ndarray,  # [L, T, 4, SUBLANES, LANES]
    depths: jnp.ndarray,  # [L, T, SUBLANES, LANES]
    order: jnp.ndarray,
    owners_sorted: jnp.ndarray,
    coverage: jnp.ndarray,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HBM-streaming composite for layer counts past the VMEM ceiling."""
    num_layers, num_tiles = colors.shape[0], colors.shape[1]
    kernel = functools.partial(_kernel_hbm, num_layers=num_layers)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, SUBLANES, LANES), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4, SUBLANES, LANES), jnp.float32),
            pltpu.VMEM((2, SUBLANES, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 4, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, SUBLANES, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        order.astype(jnp.int32),
        owners_sorted.astype(jnp.int32),
        coverage.astype(jnp.int32),
        colors,
        depths,
    )
