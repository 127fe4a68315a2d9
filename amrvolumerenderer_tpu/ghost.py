"""Cross-brick ghost-ring filling for seam-free trilinear sampling.

The march kernels interpolate into a per-piece ghost ring
(ops/slicemarch.py `ghost`); intra-brick split boundaries fill the ring
from the same brick's neighbor cells (fast_scene._split_to_cubes,
ops.slicemarch.split_brick_for_slices).  This module extends the fill to
BRICK boundaries: each brick's ring cells whose centers lie inside another
brick take that brick's nearest-cell value, so abutting same-level bricks
(exactly lattice-aligned after ``convexify``) interpolate seam-free, and
coarse/fine level boundaries blend against the neighbor's resolution
instead of clamping.  Ring cells outside every brick (the domain exterior)
stay edge-replicated — the clamp-to-edge semantics of the unsplit kernel.

Beyond reference: the reference samples nearest-cell only (one rank's
VolumePainter never reads another rank's box, Common/VolumePainter.cpp:548)
so it has no cross-box continuity question to answer.

Works for host (np) and device (jnp) brick arrays: only O(surface) index
metadata is computed on the host; device arrays are gathered and updated
with jnp ops, so in-situ data never round-trips through host memory.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _ring_slabs(shape: np.ndarray, ghost: int) -> List[Tuple[slice, ...]]:
    """Decompose the ghost ring of a padded [n + 2g]^3 array into 6 slabs
    covering every ring cell exactly once (corners/edges land in the
    lowest-axis slab that contains them)."""
    g = ghost
    n = shape
    full = [slice(0, int(n[d]) + 2 * g) for d in range(3)]
    core = [slice(g, int(n[d]) + g) for d in range(3)]
    slabs = []
    for d in range(3):
        lo = list(full)
        hi = list(full)
        for dd in range(d):
            lo[dd] = core[dd]
            hi[dd] = core[dd]
        lo[d] = slice(0, g)
        hi[d] = slice(int(n[d]) + g, int(n[d]) + 2 * g)
        slabs.append(tuple(lo))
        slabs.append(tuple(hi))
    return slabs


def ghost_fill(
    pre_bricks: Sequence,  # per brick: (nx, ny, nz) np or jnp PRE-TRANSFORMED
    boxes: Sequence[Tuple[np.ndarray, np.ndarray]],  # (min_corner, max_corner)
    ghost: int = 1,
):
    """Edge-pad every brick by ``ghost`` cells and fill ring cells covered
    by another brick with that brick's nearest-cell value.

    Returns the list of padded arrays (shape + 2*ghost per axis), suitable
    as the ``padded`` input of the piece splitters.  Same-level abutting
    bricks are lattice-aligned, so the nearest sample IS the exact field
    value there; level boundaries nearest-sample the neighbor's grid.
    """
    num = len(pre_bricks)
    mins = np.array([np.asarray(b[0], float) for b in boxes])
    maxs = np.array([np.asarray(b[1], float) for b in boxes])
    shapes = [np.asarray(pre_bricks[i].shape, int) for i in range(num)]
    spans = [
        np.where(shapes[i] > 0, (maxs[i] - mins[i]) / np.maximum(shapes[i], 1), 1.0)
        for i in range(num)
    ]
    # domain bounding box: ring positions clamp into it before the
    # containment test, so a ring cell outside the domain on some axis
    # (an edge/corner of the ring at a domain face) takes the neighbor's
    # EDGE value on that axis — exactly what np.pad(mode="edge") on the
    # unsplit union field would store there.  Positions that still land in
    # no brick (L-shaped unions) keep the edge-replicated fallback.
    dlo = mins.min(axis=0)
    dhi = maxs.max(axis=0)
    # the clamp epsilon must be well below the FINEST cell span (not a
    # fraction of the domain extent): on deep hierarchies a domain-relative
    # epsilon could shift a face ring cell into the wrong source cell
    finest = np.stack(spans).min(axis=0)
    deps = np.minimum(
        1e-3 * np.maximum(finest, 1e-30),
        1e-6 * np.maximum(dhi - dlo, 1e-30),
    )

    # vectorized candidate search: brick j is a candidate for brick i when
    # j's box overlaps i's ghost shell (an O(L^2) matrix op, not a Python
    # double loop — 512-brick scenes stay fast)
    span_arr = np.stack(spans)
    glo_all = mins - ghost * span_arr
    ghi_all = maxs + ghost * span_arr
    eps_all = 1e-9 * np.maximum(np.abs(ghi_all - glo_all), 1.0)
    overlap = np.all(
        (maxs[None, :, :] > (glo_all + eps_all)[:, None, :])
        & (mins[None, :, :] < (ghi_all - eps_all)[:, None, :]),
        axis=-1,
    )
    np.fill_diagonal(overlap, False)

    out = []
    for i in range(num):
        data = pre_bricks[i]
        is_np = isinstance(data, np.ndarray)
        padded = (
            np.pad(data, ghost, mode="edge")
            if is_np
            else jnp.pad(data, ghost, mode="edge")
        )
        cand = np.nonzero(overlap[i])[0]
        if cand.size == 0:
            out.append(padded)
            continue
        for sl in _ring_slabs(shapes[i], ghost):
            axes_idx = [np.arange(s.start, s.stop) for s in sl]
            if any(a.size == 0 for a in axes_idx):
                continue
            idx = np.stack(np.meshgrid(*axes_idx, indexing="ij"), axis=-1)
            pos = mins[i] + (idx - ghost + 0.5) * spans[i]
            pos = np.clip(pos, dlo + deps, dhi - deps)
            for j in cand:
                inside = np.all(
                    (pos >= mins[j]) & (pos < maxs[j]), axis=-1
                )
                if not inside.any():
                    continue
                src = np.floor((pos - mins[j]) / spans[j]).astype(np.int64)
                src = np.clip(src, 0, shapes[j] - 1)
                # guard degenerate indices where the cell is outside j
                src[~inside] = 0
                vals = pre_bricks[j][src[..., 0], src[..., 1], src[..., 2]]
                if is_np:
                    region = padded[sl]
                    region[inside] = np.asarray(vals)[inside]
                    padded[sl] = region
                else:
                    cur = padded[sl]
                    new = jnp.where(jnp.asarray(inside), vals, cur)
                    padded = padded.at[sl].set(new)
        out.append(padded)
    return out
