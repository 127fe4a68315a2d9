"""Compositor tests: layered depth-sort fold + flat direct-send semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from amrvolumerenderer_tpu.compositor import (
    assemble_pieces,
    compose_flat_host,
    composite_layers_device,
    composite_layers_host,
    piece_range,
    sort_layers,
)
from amrvolumerenderer_tpu.image import ImageBuffer, ImageKind


def random_layers(rng, num_layers, num_pixels, num_owners):
    layers = np.zeros((num_layers, num_pixels, 5), dtype=np.float32)
    rgb = rng.random((num_layers, num_pixels, 3)).astype(np.float32)
    alpha = (rng.random((num_layers, num_pixels)) * 0.8).astype(np.float32)
    layers[..., :3] = rgb * alpha[..., None]  # premultiplied
    layers[..., 3] = alpha
    layers[..., 4] = rng.random((num_layers, num_pixels)).astype(np.float32) * 10
    # some empty pixels with infinite depth
    empty = rng.random((num_layers, num_pixels)) < 0.3
    layers[..., :4][empty] = 0.0
    layers[..., 4][empty] = np.inf
    owners = rng.integers(0, num_owners, num_layers).astype(np.int32)
    hints = (rng.random(num_layers) * 5).astype(np.float32)
    local = np.zeros(num_layers, dtype=np.int32)
    counts = {}
    for i, o in enumerate(owners):
        local[i] = counts.get(int(o), 0)
        counts[int(o)] = local[i] + 1
    return layers, hints, owners, local


def test_piece_range_remainder_to_last():
    # DirectSendBase.cpp:59-74
    assert piece_range(10, 0, 3) == (0, 3)
    assert piece_range(10, 1, 3) == (3, 6)
    assert piece_range(10, 2, 3) == (6, 10)
    assert piece_range(5, 0, 1) == (0, 5)


def test_sort_layers_lexicographic():
    hints = np.array([2.0, 1.0, 1.0, 1.0], dtype=np.float32)
    owners = np.array([0, 1, 0, 1], dtype=np.int32)
    local = np.array([0, 0, 0, 1], dtype=np.int32)
    order = sort_layers(hints, owners, local)
    # depth 1 first; ties by owner (0 before 1), then local index
    assert list(order) == [2, 1, 3, 0]


def test_device_fold_matches_host_oracle(rng):
    layers, hints, owners, local = random_layers(rng, 12, 64, 3)
    expected = composite_layers_host(layers, hints, owners, local)
    got = np.asarray(
        composite_layers_device(jnp.asarray(layers), hints, owners, local)
    )
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_device_fold_single_layer(rng):
    layers, hints, owners, local = random_layers(rng, 1, 16, 1)
    got = np.asarray(
        composite_layers_device(jnp.asarray(layers), hints, owners, local)
    )
    np.testing.assert_allclose(got, layers[0], atol=1e-6)


def test_composite_empty_layers_are_identity(rng):
    layers, hints, owners, local = random_layers(rng, 4, 32, 2)
    # append an empty (cleared) layer: must not change the result
    empty = np.zeros((1, 32, 5), dtype=np.float32)
    empty[..., 4] = np.inf
    layers2 = np.concatenate([layers, empty])
    hints2 = np.concatenate([hints, [np.inf]]).astype(np.float32)
    owners2 = np.concatenate([owners, [2]]).astype(np.int32)
    local2 = np.concatenate([local, [0]]).astype(np.int32)
    a = composite_layers_host(layers, hints, owners, local)
    b = composite_layers_host(layers2, hints2, owners2, local2)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_composite_respects_depth_order(rng):
    # two full-opacity layers: the nearer one must fully win
    p = 8
    near = np.zeros((p, 5), dtype=np.float32)
    near[:, 0] = 1.0
    near[:, 3] = 1.0
    near[:, 4] = 1.0
    far = np.zeros((p, 5), dtype=np.float32)
    far[:, 1] = 1.0
    far[:, 3] = 1.0
    far[:, 4] = 5.0
    layers = np.stack([far, near])  # stored far-first
    out = composite_layers_host(
        layers,
        np.array([5.0, 1.0], np.float32),
        np.array([0, 1], np.int32),
        np.array([0, 0], np.int32),
    )
    np.testing.assert_allclose(out[:, :4], near[:, :4], atol=1e-6)


@pytest.mark.parametrize("kind", [ImageKind.RGBA_F32, ImageKind.RGBA_F32_DEPTH_SORT])
@pytest.mark.parametrize("num_ranks", [1, 2, 4, 7])
def test_flat_compose_matches_sequential_blend(rng, kind, num_ranks):
    """The piece-wise direct-send compose must equal blending all rank
    images in group order over the full frame."""
    w = h = 8
    images = []
    for r in range(num_ranks):
        img = ImageBuffer.create(kind, w, h)
        c = img.pixels.shape[1]
        px = rng.random((w * h, c)).astype(np.float32) * 0.5
        if kind == ImageKind.RGBA_F32_DEPTH_SORT:
            px[:, 4] = rng.random(w * h) * 10
        img.pixels[:] = px
        images.append(img)
    group_order = np.asarray(rng.permutation(num_ranks), dtype=np.int32)

    pieces = compose_flat_host(images, group_order)
    got = assemble_pieces(pieces)

    expected = images[int(group_order[0])].deep_copy()
    for idx in group_order[1:]:
        expected = expected.blend(images[int(idx)])
    np.testing.assert_allclose(got.pixels, expected.pixels, atol=1e-6)


def test_flat_compose_piece_coverage(rng):
    images = [ImageBuffer.create(ImageKind.RGBA_F32, 4, 4) for _ in range(3)]
    pieces = compose_flat_host(images, np.arange(3))
    spans = [(p.region_begin, p.region_end) for p in pieces]
    assert spans == [(0, 5), (5, 10), (10, 16)]


def test_run_grouping_matters_in_tie_cases():
    """Spec test: the per-owner run grouping is not just an optimization —
    with equal depth-hints and interleaved per-pixel depths, the grouped
    fold differs from a plain left fold, and we reproduce the reference's
    grouped structure (DirectSendBase.cpp:400-446)."""
    from amrvolumerenderer_tpu.image import blend_depth_sort

    # three layers, one pixel; owners [0, 1, 1]; depths interleave such
    # that a (b+c) pre-blend changes the result
    a = np.array([[0.2, 0.0, 0.0, 0.2, 2.0]], np.float32)
    b = np.array([[0.0, 0.3, 0.0, 0.3, 3.0]], np.float32)
    c = np.array([[0.0, 0.0, 0.4, 0.4, 1.0]], np.float32)  # nearest pixel
    layers = np.stack([a, b, c])
    hints = np.array([1.0, 1.0, 1.0], np.float32)  # all tie
    owners = np.array([0, 1, 1], np.int32)
    local = np.array([0, 0, 1], np.int32)

    grouped = composite_layers_host(layers, hints, owners, local)
    plain = blend_depth_sort(blend_depth_sort(a, b), c)
    reference_structure = blend_depth_sort(a, blend_depth_sort(b, c))
    np.testing.assert_allclose(grouped, reference_structure, atol=1e-7)
    assert not np.allclose(grouped, plain)


def test_compact_image_reduces_transport_bytes():
    """The compaction preserves the RLE compression's *intent*: images with
    localized content transport fewer bytes."""
    from amrvolumerenderer_tpu.image import ImageBuffer, ImageKind

    img = ImageBuffer.create(ImageKind.RGBA_F32_DEPTH_SORT, 64, 64)
    img.clear()
    for y in range(30, 34):
        for x in range(30, 34):
            img.set_color(x, y, (1, 1, 1, 1))
            img.set_depth(x, y, 1.0)
    compact = img.compress()
    full_bytes = img.pixels.nbytes
    compact_bytes = compact.pixels.nbytes
    assert compact_bytes < full_bytes * 0.1
    np.testing.assert_allclose(
        compact.uncompress().pixels[:, :4], img.pixels[:, :4], atol=1e-6
    )
