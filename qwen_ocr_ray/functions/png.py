"""Pure-python PNG codec (zlib is in the stdlib; PNG needs nothing else).

Restores output-format parity with the reference, which emits PNG page
images and ``{page}_fig{n}.png`` crops (``/root/reference/src/pdf_handler.py:67-71``,
``/root/reference/src/models/extracted_image.py:33-43``) — and gives the
multimodal stages one REAL codec in this sandbox (no PIL): 8-bit RGB /
RGBA / grayscale decode with all five scanline filters, filter-0 RGB
encode. Vectorized with numpy per scanline; fine for figure-crop-sized
images (the hot page path stays raw-RGB in Arrow).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(rgb: bytes, width: int, height: int) -> bytes:
    """Raw RGB bytes (h*w*3) -> 8-bit truecolor PNG (filter 0 scanlines)."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"payload is {len(rgb)} bytes, expected {width}x{height}x3"
        )
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width * 3)
    raw = np.empty((height, 1 + width * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = arr
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4) -> (height, stride) samples."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """PNG -> (width, height, raw RGB bytes). Supports 8-bit RGB (2),
    RGBA (6, alpha dropped), grayscale (0) and gray+alpha (4), non-interlaced."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported color type {color_type}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG data length mismatch")
    samples = _unfilter(raw, height, stride, channels).reshape(
        height, width, channels
    )
    if color_type == 2:
        rgb = samples
    elif color_type == 6:
        rgb = samples[:, :, :3]
    elif color_type == 0:
        rgb = np.repeat(samples, 3, axis=2)
    else:  # gray + alpha
        rgb = np.repeat(samples[:, :, :1], 3, axis=2)
    return width, height, np.ascontiguousarray(rgb).tobytes()
