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
