"""Shared vreg-level primitives for the Pallas kernels.

Mosaic on current TPUs supports exactly one gather form: same-shape
[8, 128] ``take_along_axis`` (axis 0 or 1).  Arbitrary 2D gathers are
decomposed into row broadcasts + lane gathers + selects; these helpers are
shared by the slice-march, tile-march, and composite kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LANES = 128
SUBLANES = 8
TILE_P = LANES * SUBLANES


def gather_rows(load_row, num_rows: int, row: jnp.ndarray, col: jnp.ndarray):
    """out[i,j] = rows[row[i,j]][col[i,j]] via broadcast + lane gather.

    ``load_row(r)`` returns row r as a [LANES] vector (an indexed array or a
    dynamic VMEM ref load); ``row`` in [0, num_rows); ``col`` in [0, LANES).
    Cost: num_rows x (broadcast + take_along_axis + select).  A single-row
    tile (e.g. a 128-entry transfer-function LUT) skips the select chain
    entirely — one broadcast + one take_along_axis; ``row`` is ignored.
    """
    if num_rows == 1:
        bcast = jax.lax.broadcast_in_dim(load_row(0), (SUBLANES, LANES), (1,))
        return jnp.take_along_axis(bcast, col, axis=1)
    out = row.astype(jnp.float32) * 0.0
    for rr in range(num_rows):
        bcast = jax.lax.broadcast_in_dim(load_row(rr), (SUBLANES, LANES), (1,))
        v = jnp.take_along_axis(bcast, col, axis=1)
        out = jnp.where(row == rr, v, out)
    return out


def gather_tile(tile: jnp.ndarray, row: jnp.ndarray, col: jnp.ndarray):
    """Arbitrary 2D gather from an [R, 128] tile held as an array value."""
    return gather_rows(lambda rr: tile[rr, :], tile.shape[0], row, col)


def gather_flat(tile: jnp.ndarray, idx: jnp.ndarray):
    """out[i,j] = tile.reshape(-1)[idx[i,j]] for an [R, 128] tile.

    Single-row tiles skip the row/col decomposition (idx IS the lane
    index), saving the integer div/mod and the row-select chain.
    """
    if tile.shape[0] == 1:
        return gather_rows(lambda rr: tile[0, :], 1, idx, idx)
    return gather_tile(tile, idx // LANES, idx % LANES)
