"""PPM/PNG writer tests: byte parity and row order."""

import numpy as np
import pytest

from amrvolumerenderer_tpu.image import ImageBuffer, ImageKind
from amrvolumerenderer_tpu.io import load_png, load_ppm, save_png, save_ppm


def checkerboard(w=8, h=6):
    img = ImageBuffer.create(ImageKind.RGBA_F32_DEPTH_SORT, w, h)
    for y in range(h):
        for x in range(w):
            v = 1.0 if (x + y) % 2 == 0 else 0.25
            img.set_color(x, y, (v, 0.5 * v, 1.0 - v, 1.0))
    return img


def test_ppm_roundtrip(tmp_path):
    img = checkerboard()
    path = str(tmp_path / "out.ppm")
    assert save_ppm(img, path)
    data, w, h = load_ppm(path)
    assert (w, h) == (8, 6)
    expected = img.pixels[:, :3].reshape(6, 8, 3)
    # byte codec: int(c*256) clamp, then /255 on read
    expected_bytes = np.clip((expected * 256).astype(int), 0, 255) / 255.0
    np.testing.assert_allclose(data, expected_bytes, atol=1e-6)


def test_ppm_bottom_up_rows(tmp_path):
    # red bottom row, blue top row; the *file* must start with the top row
    img = ImageBuffer.create(ImageKind.RGBA_F32, 2, 2)
    img.set_color(0, 0, (1, 0, 0, 1))
    img.set_color(1, 0, (1, 0, 0, 1))
    img.set_color(0, 1, (0, 0, 1, 1))
    img.set_color(1, 1, (0, 0, 1, 1))
    path = str(tmp_path / "rows.ppm")
    save_ppm(img, path)
    raw = open(path, "rb").read()
    pixels = raw.split(b"255\n", 1)[1]
    assert pixels[:3] == bytes([0, 0, 255])  # blue (row y=1) first in file
    assert pixels[6:9] == bytes([255, 0, 0])  # red (row y=0) last


def test_png_roundtrip(tmp_path):
    img = checkerboard()
    path = str(tmp_path / "out.png")
    assert save_png(img, path)
    data, w, h = load_png(path)
    assert (w, h) == (8, 6)
    expected = np.clip((img.pixels[:, :3].reshape(6, 8, 3) * 256).astype(int), 0, 255)
    np.testing.assert_allclose(data * 255, expected, atol=0.5)


def test_partial_region_blended_onto_blank(tmp_path):
    # SavePPM.cpp:52-64: a region-windowed image is composited over a
    # cleared frame before writing
    img = ImageBuffer.create(ImageKind.RGBA_F32, 4, 4, 4, 12)
    img.pixels[:] = [1.0, 1.0, 1.0, 1.0]
    path = str(tmp_path / "partial.ppm")
    assert save_ppm(img, path)
    data, w, h = load_ppm(path)
    assert data[0].sum() == 0.0  # first row empty
    assert data[1].min() == 1.0  # middle rows white
    assert data[3].sum() == 0.0


def test_load_rejects_malformed_files(tmp_path):
    bad = tmp_path / "bad.ppm"
    bad.write_bytes(b"P3\n# not binary\n")
    with pytest.raises(Exception):
        load_ppm(str(bad))

    not_png = tmp_path / "bad.png"
    not_png.write_bytes(b"\x89PNJUNK\r\n\x1a\n")
    with pytest.raises(Exception):
        load_png(str(not_png))

    truncated = tmp_path / "trunc.png"
    # valid signature, truncated stream
    truncated.write_bytes(b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR")
    with pytest.raises(Exception):
        load_png(str(truncated))


def test_png_all_filter_types(tmp_path):
    """The reader must decode every PNG filter (0 none, 1 sub, 2 up,
    3 average, 4 paeth) — external encoders (the reference-golden hook's
    images) pick filters per row, unlike our writer's 0/2."""
    import struct
    import zlib

    from amrvolumerenderer_tpu.io import _png_chunk

    rng = np.random.default_rng(9)
    w, h = 7, 5
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)

    def paeth(a, b, c):
        p = int(a) + int(b) - int(c)
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    # forward-filter each row with a DIFFERENT filter type, cycling 0-4
    raw = bytearray()
    stride = w * 3
    flat = img.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for row in range(h):
        ftype = row % 5
        line = flat[row]
        enc = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            left = line[i - 3] if i >= 3 else 0
            up = prev[i]
            ul = prev[i - 3] if i >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                pred = paeth(left, up, ul)
            enc[i] = (line[i] - pred) % 256
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    path = str(tmp_path / "filters.png")
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(_png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
        f.write(_png_chunk(b"IDAT", zlib.compress(bytes(raw))))
        f.write(_png_chunk(b"IEND", b""))

    data, gw, gh = load_png(path)
    assert (gw, gh) == (w, h)
    # load_png returns bottom-up rows in [0, 1]
    got = (data[::-1] * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(got, img)
