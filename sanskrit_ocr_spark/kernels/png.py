"""Minimal real PNG codec — struct + zlib (+ numpy for bulk row moves),
no image libraries.

The reference pipeline's multimodal artifact is a real PNG per document
(``/root/reference/datagen/augmentations/render_text.py:148,276`` renders
and ``generate_dataset.py:37-39`` saves them). This container ships no
codec libraries, so the multimodal operators use this spec-compliant
subset instead of a stub:

* **encode**: 8-bit grayscale (color type 0) or RGB (color type 2),
  filter 0 rows, zlib-compressed IDAT, CRC-correct chunks;
* **decode**: signature + chunk walk, IHDR geometry, multi-IDAT concat,
  full de-filtering (types 0–4 incl. Paeth) — so it also reads PNGs
  produced by standard encoders within this subset (no palette, no
  interlace, no 16-bit).

Everything is deterministic bytes-in/bytes-out; the Spark operators call
these from Arrow-batched UDFs (`ops/multimodal.py`).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(pixels: bytes, width: int, height: int,
               channels: int = 1) -> bytes:
    """Row-major 8-bit pixels (len == width*height*channels) → PNG bytes.
    channels: 1 = grayscale, 3 = RGB."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size does not match geometry")
    color_type = 0 if channels == 1 else 2
    # one numpy column insert builds every "filter 0" scanline at once
    rows = np.empty((height, stride + 1), dtype=np.uint8)
    rows[:, 0] = 0
    rows[:, 1:] = np.frombuffer(pixels, np.uint8).reshape(height, stride)
    raw = rows.tobytes()
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes → (width, height, channels, row-major 8-bit pixels).
    Supports the encode subset plus all five scanline filters."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            if length != 13:
                raise ValueError("malformed IHDR")
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color == 0:
                channels = 1
            elif color == 2:
                channels = 3
            else:
                raise ValueError(f"unsupported color type {color}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size does not match geometry")
    # fast path: all scanlines filter 0 (our encoder's output) → one bulk
    # numpy column drop instead of a per-row Python de-filter loop
    if height and stride:
        arr = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
        if not arr[:, 0].any():
            return width, height, channels, arr[:, 1:].tobytes()
    out = bytearray(stride * height)
    prev_row_start = None
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for x in range(channels, stride):
                row[x] = (row[x] + row[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            if prev_row_start is not None:
                for x in range(stride):
                    row[x] = (row[x] + out[prev_row_start + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - channels] if x >= channels else 0
                up = out[prev_row_start + x] if prev_row_start is not None else 0
                row[x] = (row[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = row[x - channels] if x >= channels else 0
                up = out[prev_row_start + x] if prev_row_start is not None else 0
                ul = (out[prev_row_start + x - channels]
                      if prev_row_start is not None and x >= channels else 0)
                row[x] = (row[x] + _paeth(left, up, ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out[y * stride:(y + 1) * stride] = row
        prev_row_start = y * stride
    return width, height, channels, bytes(out)


def png_geometry(data: bytes) -> tuple[int, int, int]:
    """Cheap header-only read: (width, height, channels) from IHDR."""
    if data[:8] != PNG_SIG or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    width, height, depth, color = struct.unpack(">IIBB", data[16:26])
    return width, height, 1 if color == 0 else 3
