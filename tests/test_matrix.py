"""Compositing matrix: rank-count x buffer-format x compression.

The reference auto-registers an {color-ubyte,color-float} x {depth-float,
depth-none} x {+/- image-compress} x rank-count CTest matrix per miniapp
(CMake/amrVolumeRendererMacros.cmake:150-178).  This is the working
equivalent: the flat direct-send compose must produce the same result as a
sequential group-order blend for every image kind, rank count, and with
compression (compaction) round-trips inserted in the transport path.
"""

import numpy as np
import pytest

from amrvolumerenderer_tpu.compositor import (
    assemble_pieces,
    compose_flat_host,
    piece_range,
)
from amrvolumerenderer_tpu.image import ImageBuffer, ImageKind

ALL_KINDS = [
    ImageKind.RGBA_F32,
    ImageKind.RGBA_U8,
    ImageKind.RGBA_F32_DEPTH_SORT,
    ImageKind.RGBA_U8_DEPTH_F32,
    ImageKind.RGB_F32_DEPTH_F32,
]


def make_rank_image(rng, kind, w, h, sparsity=0.5):
    img = ImageBuffer.create(kind, w, h)
    n, c = img.pixels.shape
    if kind == ImageKind.RGBA_U8:
        px = rng.integers(0, 256, (n, c)).astype(np.uint8)
        px[rng.random(n) < sparsity] = 0
    else:
        px = (rng.random((n, c)) * 0.8).astype(np.float32)
        if kind in (ImageKind.RGBA_U8_DEPTH_F32, ImageKind.RGB_F32_DEPTH_F32):
            px[:, -1] = rng.random(n) * 0.9  # depth < 1 (foreground)
            px[rng.random(n) < sparsity, -1] = 1.0  # background depth
        if kind == ImageKind.RGBA_F32_DEPTH_SORT:
            px[:, 4] = rng.random(n) * 10
            empty = rng.random(n) < sparsity
            px[empty, :4] = 0.0
            px[empty, 4] = np.inf
        if kind == ImageKind.RGBA_F32:
            px[rng.random(n) < sparsity] = 0.0
    img.pixels[:] = px
    return img


@pytest.mark.parametrize("kind", ALL_KINDS)
@pytest.mark.parametrize("num_ranks", [2, 4, 8])
def test_compositing_matrix(rng, kind, num_ranks):
    w = h = 8
    images = [make_rank_image(rng, kind, w, h) for _ in range(num_ranks)]
    group_order = np.asarray(rng.permutation(num_ranks), dtype=np.int32)

    pieces = compose_flat_host(images, group_order)
    got = assemble_pieces(pieces)

    expected = images[int(group_order[0])].deep_copy()
    for idx in group_order[1:]:
        expected = expected.blend(images[int(idx)])
    np.testing.assert_allclose(
        np.asarray(got.pixels, dtype=np.float64),
        np.asarray(expected.pixels, dtype=np.float64),
        atol=1e-6,
    )


@pytest.mark.parametrize("kind", [ImageKind.RGBA_F32, ImageKind.RGBA_F32_DEPTH_SORT])
@pytest.mark.parametrize("num_ranks", [2, 4])
def test_compositing_matrix_with_compression(rng, kind, num_ranks):
    """Compression (compact) round-trips in the transport path must not
    change the composited result (the reference's image-compress axis)."""
    w = h = 8
    images = [make_rank_image(rng, kind, w, h) for _ in range(num_ranks)]
    group_order = np.arange(num_ranks, dtype=np.int32)

    # transport-compressed path: compact + uncompress each rank image
    transported = []
    for img in images:
        compact = img.compress()
        restored = compact.uncompress()
        transported.append(restored)

    got = assemble_pieces(compose_flat_host(transported, group_order))
    expected = assemble_pieces(compose_flat_host(images, group_order))
    np.testing.assert_allclose(
        np.asarray(got.pixels, np.float64),
        np.asarray(expected.pixels, np.float64),
        atol=1e-6,
    )


@pytest.mark.parametrize("kind", ALL_KINDS)
@pytest.mark.parametrize("num_ranks", [2, 4, 8])
def test_compositing_matrix_compact_fold(rng, kind, num_ranks):
    """compose_flat_host(compress=True) folds entirely in the compact
    domain (CompactImage.blend) and must match the dense fold — the
    reference's image-compress mode blends RLE images without
    uncompressing (ImageSparseColorOnly.hpp:214-382)."""
    w = h = 8
    images = [make_rank_image(rng, kind, w, h) for _ in range(num_ranks)]
    for img in images:
        # compression treats far-depth pixels as background and drops their
        # color payload (ImageSparseColorDepth.hpp:89-92); clear them so the
        # dense fold sees the same data the compact fold keeps
        if kind in (ImageKind.RGBA_U8_DEPTH_F32, ImageKind.RGB_F32_DEPTH_F32):
            img.pixels[img.pixels[:, -1] >= 1.0, :-1] = 0
    group_order = np.asarray(rng.permutation(num_ranks), dtype=np.int32)

    got = assemble_pieces(compose_flat_host(images, group_order, compress=True))
    expected = assemble_pieces(compose_flat_host(images, group_order))
    np.testing.assert_allclose(
        np.asarray(got.pixels, np.float64),
        np.asarray(expected.pixels, np.float64),
        atol=1e-6,
    )


def test_piece_ranges_partition_pixels():
    for size in (16, 17, 100):
        for n in (1, 2, 3, 7):
            spans = [piece_range(size, i, n) for i in range(n)]
            assert spans[0][0] == 0
            assert spans[-1][1] == size
            for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
                assert a1 == b0


def test_stage_timers(capsys):
    from amrvolumerenderer_tpu.utils.timers import StageTimers

    timers = StageTimers(verbose=True)
    with timers.stage("per-box rendering"):
        pass
    with timers.stage("compositing"):
        pass
    out = capsys.readouterr().out
    assert "Render: per-box rendering took" in out
    assert "Render: compositing took" in out
    report = timers.report()
    assert set(report) == {"per-box rendering", "compositing"}


def test_device_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from amrvolumerenderer_tpu.utils.timers import device_trace

    with device_trace(str(tmp_path / "trace")):
        float(jnp.sum(jnp.ones((64, 64))))
    assert any((tmp_path / "trace").rglob("*"))
    # disabled when no log dir is given
    with device_trace(None):
        pass


def test_package_level_exports():
    import amrvolumerenderer_tpu as avr

    assert callable(avr.render)
    assert callable(avr.compute_histogram)
    assert avr.FastSceneRenderer.__name__ == "FastSceneRenderer"
    assert callable(avr.prepare_device_scene)
