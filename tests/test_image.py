"""Image algebra tests: blend rules, region-window semantics, compaction.

Ports the behavioral contracts of the reference image suites
(Common/Testing/ImageFullTest.cpp and ImageSparseTest.cpp) onto the
array-based design.
"""

import numpy as np
import pytest

from amrvolumerenderer_tpu.image import (
    CompactImage,
    ImageBuffer,
    ImageKind,
    blend_depth_sort,
    blend_over,
    blend_over_bytes,
    blend_z_compare,
    byte_to_color,
    color_to_byte,
)


def test_byte_codec_roundtrip():
    # Color.hpp:36-91: byte -> float -> byte must be the identity
    for b in range(256):
        c = byte_to_color(np.uint8(b))
        assert int(color_to_byte(c)) == b


def test_byte_codec_mesa_rule():
    assert int(color_to_byte(np.float32(1.0))) == 255
    assert int(color_to_byte(np.float32(0.0))) == 0
    # int(c * 256) truncation rule
    assert int(color_to_byte(np.float32(0.5))) == 128


def test_blend_over_premultiplied():
    top = np.array([[0.5, 0.0, 0.0, 0.5]], dtype=np.float32)
    bottom = np.array([[0.0, 1.0, 0.0, 1.0]], dtype=np.float32)
    out = blend_over(top, bottom)
    np.testing.assert_allclose(out, [[0.5, 0.5, 0.0, 1.0]], atol=1e-6)


def test_blend_depth_sort_picks_nearer_front():
    near = np.array([[0.5, 0.0, 0.0, 0.5, 1.0]], dtype=np.float32)
    far = np.array([[0.0, 0.8, 0.0, 0.8, 3.0]], dtype=np.float32)
    # regardless of argument order, the nearer layer must end up in front
    out1 = blend_depth_sort(near, far)
    out2 = blend_depth_sort(far, near)
    np.testing.assert_allclose(out1, out2, atol=1e-6)
    np.testing.assert_allclose(out1[0, :4], [0.5, 0.4, 0.0, 0.9], atol=1e-6)
    assert out1[0, 4] == 1.0  # depth propagates as min


def test_blend_z_compare():
    a = np.array([[1.0, 0.0, 0.0, 0.5]], dtype=np.float32)
    b = np.array([[0.0, 1.0, 0.0, 0.4]], dtype=np.float32)
    out = blend_z_compare(a, b)
    np.testing.assert_allclose(out, b)
    out = blend_z_compare(b, a)
    np.testing.assert_allclose(out, b)


def test_blend_over_bytes():
    top = np.array([[255, 0, 0, 128]], dtype=np.uint8)
    bottom = np.array([[0, 255, 0, 255]], dtype=np.uint8)
    out = blend_over_bytes(top, bottom)
    assert out[0, 0] == 255
    assert out[0, 1] == (255 * (255 - 128)) // 255
    assert out[0, 3] == 128 + (255 * 127) // 255


@pytest.mark.parametrize(
    "kind",
    [
        ImageKind.RGBA_F32,
        ImageKind.RGBA_U8,
        ImageKind.RGBA_F32_DEPTH_SORT,
        ImageKind.RGB_F32_DEPTH_F32,
    ],
)
def test_window_is_shallow(kind):
    img = ImageBuffer.create(kind, 10, 10)
    img.clear()
    win = img.window(20, 50)
    assert win.region_begin == 20
    assert win.region_end == 50
    assert win.num_pixels == 30
    # shallow: writes through the window are visible in the parent
    win.pixels[:] = win.pixels  # no-op sanity
    x, y = 5, 2  # flat index 25, inside the window
    img.set_color(x, y, (1.0, 0.0, 0.0, 1.0))
    np.testing.assert_allclose(win.get_color(x, y)[:3], [1.0, 0.0, 0.0], atol=0.005)


def test_window_of_window():
    # ImageFullTest.cpp:446-485 semantics
    img = ImageBuffer.create(ImageKind.RGBA_F32, 10, 10)
    win = img.window(20, 80)
    sub = win.window(10, 30)
    assert sub.region_begin == 30
    assert sub.region_end == 50


def test_copy_subrange_offsets():
    # Image.hpp copySubrange doc: offsets are relative to the current region
    img = ImageBuffer.create(ImageKind.RGBA_F32, 10, 10, 100, 200)
    img.pixels[:] = np.arange(100 * 4, dtype=np.float32).reshape(100, 4)
    sub = img.copy_subrange(50, 100)
    assert sub.region_begin == 150
    assert sub.region_end == 200
    np.testing.assert_array_equal(sub.pixels, img.pixels[50:100])
    # deep: mutating the copy leaves the parent untouched
    sub.pixels[:] = 0
    assert img.pixels[50:100].sum() > 0


def test_blend_aligned_regions():
    top = ImageBuffer.create(ImageKind.RGBA_F32, 4, 4)
    bottom = ImageBuffer.create(ImageKind.RGBA_F32, 4, 4)
    top.pixels[:] = [0.25, 0.0, 0.0, 0.25]
    bottom.pixels[:] = [0.0, 0.5, 0.0, 0.5]
    out = top.blend(bottom)
    assert out.region_begin == 0 and out.region_end == 16
    np.testing.assert_allclose(
        out.pixels, np.tile([0.25, 0.375, 0.0, 0.625], (16, 1)), atol=1e-6
    )


def test_blend_unaligned_regions():
    # ImageColorOnly.hpp:148-194: non-overlap head/tail copied through
    top = ImageBuffer.create(ImageKind.RGBA_F32, 4, 4, 0, 10)
    bottom = ImageBuffer.create(ImageKind.RGBA_F32, 4, 4, 5, 16)
    top.pixels[:] = [1.0, 0.0, 0.0, 1.0]
    bottom.pixels[:] = [0.0, 1.0, 0.0, 1.0]
    out = top.blend(bottom)
    assert out.region_begin == 0 and out.region_end == 16
    np.testing.assert_allclose(out.pixels[0:5], np.tile([1, 0, 0, 1], (5, 1)))
    # overlap: top over bottom -> top wins with alpha 1
    np.testing.assert_allclose(out.pixels[5:10], np.tile([1, 0, 0, 1], (5, 1)))
    np.testing.assert_allclose(out.pixels[10:16], np.tile([0, 1, 0, 1], (6, 1)))


def test_blend_region_gap_asserts():
    top = ImageBuffer.create(ImageKind.RGBA_F32, 4, 4, 0, 4)
    bottom = ImageBuffer.create(ImageKind.RGBA_F32, 4, 4, 8, 16)
    with pytest.raises(AssertionError):
        top.blend(bottom)


def test_compact_image_roundtrip():
    img = ImageBuffer.create(ImageKind.RGBA_F32_DEPTH_SORT, 8, 8)
    img.clear()
    img.set_color(3, 4, (1.0, 0.5, 0.25, 1.0))
    img.set_depth(3, 4, 2.0)
    compact = img.compress()
    assert isinstance(compact, CompactImage)
    assert len(compact.pixels) < img.num_pixels
    restored = compact.uncompress()
    np.testing.assert_allclose(restored.pixels[:, :4], img.pixels[:, :4], atol=1e-6)


def test_compact_image_respects_viewport():
    # ImageSparseTest.cpp:327-364: pixels outside the valid viewport are
    # treated as background
    from amrvolumerenderer_tpu.image import Viewport

    img = ImageBuffer.create(ImageKind.RGBA_F32, 8, 8)
    img.pixels[:] = [1.0, 1.0, 1.0, 1.0]
    img.valid_viewport = Viewport(2, 2, 5, 5)
    compact = img.compress()
    restored = compact.uncompress()
    # outside the viewport everything is background
    assert restored.get_color(0, 0)[3] == 0.0
    assert restored.get_color(3, 3)[3] == 1.0


def test_clear_depth_sort_sets_infinite_depth():
    img = ImageBuffer.create(ImageKind.RGBA_F32_DEPTH_SORT, 2, 2)
    img.clear((0, 0, 0, 0))
    assert np.all(np.isinf(img.pixels[:, 4]))


# -- compact-domain image algebra (ImageSparseColorOnly.hpp:214-442) --------


def _sparse_buffer(kind, w=8, h=8, region=(0, None), lo=20, hi=40, seed=0):
    """Buffer that is background outside flat-pixel [lo, hi)."""
    rng = np.random.default_rng(seed)
    img = ImageBuffer.create(kind, w, h, region[0], region[1])
    img.clear()
    n = img.num_pixels
    a = max(lo - img.region_begin, 0)
    b = min(hi - img.region_begin, n)
    if b > a:
        if kind == ImageKind.RGBA_U8:
            img.pixels[a:b] = rng.integers(1, 256, (b - a, 4)).astype(np.uint8)
        else:
            px = (rng.random((b - a, img.pixels.shape[1])) * 0.8 + 0.1).astype(
                np.float32
            )
            if kind in (ImageKind.RGBA_U8_DEPTH_F32, ImageKind.RGB_F32_DEPTH_F32):
                px[:, -1] = rng.random(b - a) * 0.9
            if kind == ImageKind.RGBA_F32_DEPTH_SORT:
                px[:, 4] = rng.random(b - a) * 10
            img.pixels[a:b] = px
    return img


ALL_KINDS = [
    ImageKind.RGBA_F32,
    ImageKind.RGBA_U8,
    ImageKind.RGBA_F32_DEPTH_SORT,
    ImageKind.RGBA_U8_DEPTH_F32,
    ImageKind.RGB_F32_DEPTH_F32,
]


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_compact_window_matches_buffer_window(kind):
    img = _sparse_buffer(kind, lo=20, hi=40)
    compact = img.compress()
    for sub in [(0, 64), (10, 30), (25, 35), (45, 64), (0, 10), (30, 30)]:
        got = compact.window(*sub)
        want = img.window(*sub).compress()
        assert got.region_begin == want.region_begin
        assert got.region_end == want.region_end
        assert got.active_begin == want.active_begin
        np.testing.assert_array_equal(got.pixels, want.pixels)
        # window is a view into the parent's pixel block
        if len(got.pixels):
            assert np.shares_memory(got.pixels, compact.pixels)


def test_compact_window_of_window():
    img = _sparse_buffer(ImageKind.RGBA_F32, lo=20, hi=40)
    compact = img.compress()
    w1 = compact.window(10, 50)  # region [10, 50)
    w2 = w1.window(5, 25)        # region [15, 35) absolute
    want = img.window(15, 35).compress()
    assert (w2.region_begin, w2.region_end) == (15, 35)
    assert w2.active_begin == want.active_begin
    np.testing.assert_array_equal(w2.pixels, want.pixels)


def test_compact_copy_subrange_is_independent():
    img = _sparse_buffer(ImageKind.RGBA_F32, lo=20, hi=40)
    compact = img.compress()
    cp = compact.copy_subrange(0, compact.num_pixels)
    cp.pixels[:] = -1.0
    assert not np.any(compact.pixels == -1.0)


@pytest.mark.parametrize("kind", ALL_KINDS)
@pytest.mark.parametrize(
    "regions",
    [((0, 64), (0, 64)), ((0, 40), (24, 64)), ((16, 64), (0, 48))],
)
def test_compact_blend_matches_buffer_blend(kind, regions):
    """Compact-domain blend == dense union-region blend, for every kind and
    for unaligned regions (the 4-case runlength-walk semantics of
    ImageSparseColorOnly.hpp:214-382, expressed on bounding ranges)."""
    (tb, te), (bb, be) = regions
    top = _sparse_buffer(kind, region=(tb, te), lo=tb + 4, hi=tb + 20, seed=1)
    bot = _sparse_buffer(kind, region=(bb, be), lo=bb + 10, hi=bb + 30, seed=2)
    got = top.compress().blend(bot.compress())
    want = top.blend(bot)
    assert (got.region_begin, got.region_end) == (want.region_begin, want.region_end)
    np.testing.assert_allclose(
        np.asarray(got.uncompress().pixels, np.float64),
        np.asarray(want.pixels, np.float64),
        atol=1e-6,
    )


def test_compact_blend_work_is_bounded_by_active_union():
    """Two small blobs in a huge region blend in O(blob) — the result's
    stored pixel block covers exactly the union of the active ranges."""
    w = h = 128
    top = _sparse_buffer(ImageKind.RGBA_F32, w, h, lo=1000, hi=1020, seed=3)
    bot = _sparse_buffer(ImageKind.RGBA_F32, w, h, lo=1010, hi=1050, seed=4)
    out = top.compress().blend(bot.compress())
    assert out.active_begin == 1000
    assert out.active_end == 1050
    assert len(out.pixels) == 50  # not 128*128
    np.testing.assert_allclose(
        np.asarray(out.uncompress().pixels, np.float64),
        np.asarray(top.blend(bot).pixels, np.float64),
        atol=1e-6,
    )


def test_compact_blend_both_empty():
    top = _sparse_buffer(ImageKind.RGBA_F32, lo=0, hi=0)
    bot = _sparse_buffer(ImageKind.RGBA_F32, lo=0, hi=0)
    out = top.compress().blend(bot.compress())
    assert len(out.pixels) == 0
    assert np.all(out.uncompress().pixels == 0.0)
