"""Sort-last compositing: depth-sorted layered blending + direct-send pieces.

Re-implements the reference DirectSend compositor semantics
(``DirectSend/Base/DirectSendBase.cpp``) in the arrays-and-collectives model:

  * **Layered mode** (composeLayered, cpp:316-458): all layers are globally
    sorted by their scalar depth hint (ties: owner rank, local index); runs
    of consecutive same-owner layers are pre-blended, then runs are folded
    front-to-back.  On one device/host this is a sequential fold over a
    gathered ``[L, P, 5]`` stack; the multi-device version shards the pixel
    axis and exchanges layers with an ``all_to_all`` (see
    ``parallel/directsend.py``).
  * **Flat mode** (compose, cpp:257-314): the framebuffer's pixel range is
    split into contiguous per-receiver pieces (``getPieceRange``, cpp:59-74)
    and every rank's piece-slices are blended in *group order* (earlier group
    rank on top, Compositor.hpp:26-29).

The reference's opportunistic Waitany-driven blending (cpp:179-255) is a
latency optimization around MPI arrival order; its *result* is exactly the
ordered fold reproduced here (the order gate at cpp:238-241 guarantees it).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .image import ImageBuffer, blend_depth_sort


def piece_range(image_size: int, piece_index: int, num_pieces: int) -> Tuple[int, int]:
    """Contiguous pixel piece for one receiver (DirectSendBase.cpp:59-74):
    equal sizes, remainder to the last piece."""
    piece_size = image_size // num_pieces
    begin = piece_size * piece_index
    end = begin + piece_size if piece_index < num_pieces - 1 else image_size
    return begin, end


def sort_layers(
    depth_hints: np.ndarray, owners: np.ndarray, local_indices: np.ndarray
) -> np.ndarray:
    """Global layer order: (depth, owner, local index) lexicographic
    (DirectSendBase.cpp:378-388).  Returns the permutation."""
    return np.lexsort((local_indices, owners, depth_hints)).astype(np.int32)


def composite_layers_host(
    layers: np.ndarray,  # [L, P, 5]
    depth_hints: np.ndarray,  # [L]
    owners: np.ndarray,  # [L]
    local_indices: np.ndarray,  # [L]
) -> np.ndarray:
    """Reference-faithful host fold (oracle).

    Reproduces composeLayered's exact blend structure: per-owner runs are
    folded first, then runs are folded in order — this matters because the
    depth-sort blend is not associative in depth-tie cases.
    """
    order = sort_layers(depth_hints, owners, local_indices)
    accumulated: Optional[np.ndarray] = None
    i = 0
    while i < len(order):
        owner = owners[order[i]]
        run = layers[order[i]]
        i += 1
        while i < len(order) and owners[order[i]] == owner:
            run = blend_depth_sort(run, layers[order[i]])
            i += 1
        accumulated = run if accumulated is None else blend_depth_sort(accumulated, run)
    if accumulated is None:
        return np.zeros((layers.shape[1], 5), dtype=np.float32)
    return accumulated


@functools.partial(jax.jit, static_argnames=())
def _composite_sorted_runs(
    sorted_layers: jnp.ndarray,  # [L, P, 5] already in blend order
    sorted_owners: jnp.ndarray,  # [L] int32
) -> jnp.ndarray:
    """Jitted run-grouped fold over pre-sorted layers.

    One ``fori_loop`` carries (run accumulator, total accumulator); when the
    owner changes between consecutive sorted layers, the finished run is
    folded into the total.  Static shape, no data-dependent control flow.
    """
    num_layers, num_pixels, _ = sorted_layers.shape
    # derive carries from the inputs so their varying-axis types match the
    # body outputs under shard_map (see jax shard-map scan-vma docs)
    empty = jnp.zeros_like(sorted_layers[0])
    empty = empty.at[:, 4].set(jnp.inf)
    start_have_total = sorted_owners[0] < jnp.int32(0)  # varying False

    def body(i, carry):
        run_acc, total_acc, have_total = carry
        layer = sorted_layers[i]
        same_owner = jnp.logical_and(i > 0, sorted_owners[i] == sorted_owners[i - 1])

        # close the previous run when the owner changes
        closed_total = jnp.where(
            have_total, blend_depth_sort(total_acc, run_acc), run_acc
        )
        total_acc = jnp.where(same_owner, total_acc, closed_total)
        have_total = jnp.where(same_owner, have_total, jnp.logical_or(have_total, i > 0))

        # extend or restart the run
        extended = blend_depth_sort(run_acc, layer)
        run_acc = jnp.where(same_owner, extended, layer)
        return run_acc, total_acc, have_total

    run_acc, total_acc, have_total = jax.lax.fori_loop(
        0, num_layers, body, (empty, empty, start_have_total)
    )
    final = jnp.where(have_total, blend_depth_sort(total_acc, run_acc), run_acc)
    return final


def composite_layers_device(
    layers: jnp.ndarray,  # [L, P, 5]
    depth_hints: np.ndarray,  # [L] (host)
    owners: np.ndarray,  # [L] (host)
    local_indices: np.ndarray,  # [L] (host)
) -> jnp.ndarray:
    """Single-device layered composite: host-side sort, device-side fold."""
    if layers.shape[0] == 0:
        out = jnp.zeros((layers.shape[1], 5), dtype=jnp.float32)
        return out.at[:, 4].set(jnp.inf)
    order = sort_layers(depth_hints, owners, local_indices)
    sorted_layers = jnp.take(layers, jnp.asarray(order), axis=0)
    sorted_owners = jnp.asarray(owners[order], dtype=jnp.int32)
    return _composite_sorted_runs(sorted_layers, sorted_owners)


# ---------------------------------------------------------------------------
# Flat direct-send mode over explicit per-rank images (host semantics used by
# the compositing-matrix tests; the device path lives in parallel/).
# ---------------------------------------------------------------------------


def compose_flat_host(
    rank_images: Sequence[ImageBuffer],
    group_order: np.ndarray,
    max_image_split: int = 1_000_000,
    compress: bool = False,
) -> List[ImageBuffer]:
    """Flat direct-send compose (DirectSendBase.cpp:257-314) on the host.

    ``rank_images[r]`` is rank r's full local image; ``group_order`` is the
    visibility permutation (group index -> real rank, earlier = on top).
    Returns one composited piece per receiver (receiver i = group member i),
    covering ``piece_range(num_pixels, i, num_receivers)``.

    With ``compress=True`` each sent piece is compacted before "transport"
    and the fold runs entirely in the compact domain (CompactImage.blend):
    payload and blend work are bounded by the union of active ranges, never
    the piece size — the reference's image-compress mode, where RLE images
    travel AND blend compressed and uncompress only at the final gather
    (ImageSparseColorOnly.hpp:98-199 compress on send, 214-382 sparse
    blend).  Color output is identical either way (same blend arithmetic);
    compression additionally applies the reference's background test on
    send — pixels outside the valid viewport, and depth-kind pixels whose
    payload is background-classified (zero alpha / not-closer-than-far
    depth, ImageSparseColorDepth.hpp:89-92), are dropped like the RLE path
    drops them, so such pixels come back as cleared background instead of
    their original bytes."""
    group_size = len(group_order)
    num_receivers = min(max_image_split, group_size)
    assert group_size >= 1
    image_size = rank_images[0].num_pixels

    pieces: List[ImageBuffer] = []
    for recv_idx in range(num_receivers):
        begin, end = piece_range(image_size, recv_idx, num_receivers)
        acc = None
        # blend in group order: first member of the group is on top
        for send_idx in range(group_size):
            real_rank = int(group_order[send_idx])
            piece = rank_images[real_rank].window(begin, end)
            if compress:
                piece = piece.compress()
            acc = piece.deep_copy() if acc is None else acc.blend(piece)
        pieces.append(acc.uncompress() if compress else acc)
    return pieces


def assemble_pieces(pieces: Sequence[ImageBuffer]) -> ImageBuffer:
    """Concatenate per-receiver pieces back into a full-frame image (the
    reference's Gather-to-rank-0, ImageColorOnly.hpp:220-270)."""
    assert pieces
    first = pieces[0]
    total = first.width * first.height
    out = ImageBuffer.create(first.kind, first.width, first.height, 0, total)
    for p in pieces:
        out.pixels[p.region_begin : p.region_end] = np.asarray(p.pixels)
    return out
