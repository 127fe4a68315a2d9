"""Image file output with byte-exact parity to the reference writers.

PPM: binary P6, rows written bottom-to-top, bytes via the Mesa-compatible
``clamp(int(c * 256))`` codec (``Common/SavePPM.cpp:17-36``,
``Common/Color.hpp:66-91``).  PNG: 8-bit RGB (alpha discarded), same row
order (``Common/SavePNG.cpp``), emitted with zlib directly — no external
imaging dependency.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np

from .image import ImageBuffer, color_to_byte


def _rgb_bytes_bottom_up(image: ImageBuffer) -> np.ndarray:
    """[H, W, 3] uint8 with row 0 = top of the file (image row height-1)."""
    assert image.region_begin == 0 and image.region_end == image.width * image.height
    w, h = image.width, image.height
    if image.kind.name.startswith("RGBA_U8"):
        rgb = image.pixels[:, :3].astype(np.uint8).reshape(h, w, 3)
    else:
        rgb = color_to_byte(image.pixels[:, :3]).reshape(h, w, 3)
    return rgb[::-1]  # bottom-up row order (SavePPM.cpp:25)


def _full_frame(image: ImageBuffer) -> ImageBuffer:
    """Blend a partial-region image onto a cleared frame (SavePPM.cpp:52-64)."""
    total = image.width * image.height
    if image.region_begin == 0 and image.region_end == total:
        return image
    blank = ImageBuffer.create(image.kind, image.width, image.height)
    blank.clear()
    return image.blend(blank)


def save_ppm(image: ImageBuffer, filename: str) -> bool:
    image = _full_frame(image)
    payload = None
    if not image.kind.name.startswith("RGBA_U8"):
        from . import native

        payload = native.encode_ppm_pixels(
            np.asarray(image.pixels, dtype=np.float32), image.width, image.height
        )
    if payload is None:
        payload = _rgb_bytes_bottom_up(image).tobytes()
    try:
        with open(filename, "wb") as f:
            f.write(f"P6\n{image.width} {image.height}\n255\n".encode())
            f.write(payload)
        return True
    except OSError:
        return False


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    chunk = tag + payload
    return struct.pack(">I", len(payload)) + chunk + struct.pack(
        ">I", zlib.crc32(chunk) & 0xFFFFFFFF
    )


def save_png(image: ImageBuffer, filename: str) -> bool:
    image = _full_frame(image)
    data = _rgb_bytes_bottom_up(image)
    h, w, _ = data.shape
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), data.reshape(h, -1)], axis=1
    ).tobytes()  # filter type 0 per row
    try:
        with open(filename, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\n")
            f.write(
                _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            )
            f.write(_png_chunk(b"IDAT", zlib.compress(raw, 6)))
            f.write(_png_chunk(b"IEND", b""))
        return True
    except OSError:
        return False


def save_image(image: ImageBuffer, filename: str) -> bool:
    """Dispatch on extension; unknown extensions default to PPM
    (VolumeRenderer.cpp:1316-1327)."""
    lower = filename.lower()
    if lower.endswith(".png"):
        return save_png(image, filename)
    return save_ppm(image, filename)


def load_ppm(filename: str) -> Tuple[np.ndarray, int, int]:
    """Read a binary P6 file back into a top-origin [H, W, 3] float array in
    [0, 1] with row 0 = image row 0 (bottom).  For tests."""
    with open(filename, "rb") as f:
        magic = f.readline().strip()
        assert magic == b"P6", magic
        line = f.readline()
        while line.startswith(b"#"):
            line = f.readline()
        w, h = [int(t) for t in line.split()]
        maxval = int(f.readline())
        data = np.frombuffer(f.read(w * h * 3), dtype=np.uint8).reshape(h, w, 3)
    # file rows are top-of-frame first == image row h-1 first; flip back
    return data[::-1].astype(np.float32) / float(maxval), w, h


def load_png(filename: str) -> Tuple[np.ndarray, int, int]:
    """Minimal PNG reader: 8-bit RGB with the full filter set (0 none,
    1 sub, 2 up, 3 average, 4 paeth).  Our own writer emits only 0/2, but
    the reference-golden drop-in hook (tests/golden/reference/, PARITY.md)
    must be able to load externally-encoded images, whose encoders pick
    filters per row.  For tests and golden comparison."""
    with open(filename, "rb") as f:
        sig = f.read(8)
        assert sig == b"\x89PNG\r\n\x1a\n"
        idat = b""
        w = h = None
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack(">I", header[:4])
            tag = header[4:]
            payload = f.read(length)
            f.read(4)  # crc
            if tag == b"IHDR":
                (w, h, bit_depth, color_type, compression, filter_method,
                 interlace) = struct.unpack(">IIBBBBB", payload[:13])
                # this reader walks full-width scanlines: an Adam7-
                # interlaced file has sub-image scanlines of different
                # widths and would silently decode to garbage, so refuse
                # anything but the baseline 8-bit RGB layout
                if bit_depth != 8 or color_type != 2:
                    raise ValueError(
                        f"unsupported PNG: bit depth {bit_depth}, color "
                        f"type {color_type} (need 8-bit RGB)"
                    )
                if compression != 0 or filter_method != 0 or interlace != 0:
                    raise ValueError(
                        "unsupported PNG: compression/filter/interlace = "
                        f"{compression}/{filter_method}/{interlace} "
                        "(need 0/0/0 — non-interlaced baseline)"
                    )
            elif tag == b"IDAT":
                idat += payload
            elif tag == b"IEND":
                break
    raw = zlib.decompress(idat)
    stride = w * 3
    rows = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for row in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8).astype(
            np.int32
        )
        pos += 1 + stride
        if ftype == 0:
            out = line
        elif ftype == 1:  # sub: add the pixel 3 bytes left; mod-256
            # addition is associative, so each byte lane is a cumsum
            out = line.reshape(-1, 3).cumsum(axis=0).reshape(-1) % 256
        elif ftype == 2:  # up
            out = (line + prev) % 256
        elif ftype == 3:  # average of left and up (floor)
            out = line.copy()
            for i in range(stride):
                left = out[i - 3] if i >= 3 else 0
                out[i] = (out[i] + (left + prev[i]) // 2) % 256
        elif ftype == 4:  # paeth predictor (RFC 2083 section 6.6)
            out = line.copy()
            for i in range(stride):
                a = out[i - 3] if i >= 3 else 0  # left
                b = prev[i]  # up
                c = prev[i - 3] if i >= 3 else 0  # upper-left
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                out[i] = (out[i] + pred) % 256
        else:
            raise NotImplementedError(f"PNG filter {ftype}")
        rows[row] = out.astype(np.uint8)
        prev = rows[row].astype(np.int32)
    img = rows.reshape(h, w, 3)
    return img[::-1].astype(np.float32) / 255.0, w, h
