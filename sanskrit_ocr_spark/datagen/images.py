"""Deterministic synthetic document images — real PNGs, seeded by content.

The reference rasterizes text onto noisy canvases and saves real PNG files
(``render_text.py:150-265`` layout + ``generate_dataset.py:37-39`` save).
This is the rebuild's miniature analog: a fake 5×7 bitmap "font" (glyph
pattern derived from the character code), greedy left-to-right placement
with wrapping (render_text.py:163-189's wrap in miniature), over a lightly
textured background — emitted through the real PNG encoder
(``kernels/png.py``), so the decode side of the multimodal operators
exercises a genuine codec path, not a digest stub.

Everything derives from the text alone (no global RNG), so images are
identical regardless of partitioning or executor count.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from sanskrit_ocr_spark.kernels.png import encode_png

GLYPH_W, GLYPH_H = 5, 7
CELL_W, CELL_H = 6, 9          # glyph + spacing advance
MARGIN = 4
CANVAS_W = 96                  # wraps after (96-8)//6 = 14 glyphs per line
MAX_CHARS = 64                 # bound render cost for pathological docs
INK = 32


def _seed(text: str) -> int:
    return int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8],
                          "big")


_GLYPH_CACHE: dict[str, np.ndarray] = {}


def _glyph(ch: str) -> np.ndarray:
    """Fake font: a deterministic 5×7 bit pattern per character code.
    Cached per worker — the md5+unpackbits ran once per character
    OCCURRENCE and dominated the render profile."""
    g = _GLYPH_CACHE.get(ch)
    if g is None:
        h = hashlib.md5(struct.pack(">I", ord(ch))).digest()
        bits = np.unpackbits(
            np.frombuffer(h[:5], dtype=np.uint8))[:GLYPH_W * GLYPH_H - 5]
        bits = np.concatenate([bits, np.ones(5, dtype=np.uint8)])
        g = _GLYPH_CACHE[ch] = bits.reshape(GLYPH_H, GLYPH_W)
    return g


def render_text_png(text: str) -> bytes:
    """Text → real grayscale PNG: textured background + fake-font glyphs,
    greedy-wrapped. Deterministic function of the text."""
    chars = [c for c in text if not c.isspace()][:MAX_CHARS] or [" "]
    per_line = (CANVAS_W - 2 * MARGIN) // CELL_W
    n_lines = (len(chars) + per_line - 1) // per_line
    height = 2 * MARGIN + n_lines * CELL_H
    rng = np.random.default_rng(_seed(text))
    canvas = (200 + rng.integers(0, 24, size=(height, CANVAS_W))
              ).astype(np.uint8)
    for i, ch in enumerate(chars):
        row, col = divmod(i, per_line)
        y = MARGIN + row * CELL_H
        x = MARGIN + col * CELL_W
        patch = canvas[y:y + GLYPH_H, x:x + GLYPH_W]
        patch[_glyph(ch) == 1] = INK
    return encode_png(canvas.tobytes(), CANVAS_W, height, channels=1)


# --- multi-frame container (the "video" payload) -----------------------------

MOVF_MAGIC = b"MOVF"


def encode_frames(frames: list[bytes]) -> bytes:
    """Length-prefixed PNG frames behind a 4-byte magic + frame count."""
    out = bytearray(MOVF_MAGIC + struct.pack(">I", len(frames)))
    for f in frames:
        out += struct.pack(">I", len(f)) + f
    return bytes(out)


def decode_frames(data: bytes) -> list[bytes]:
    if data[:4] != MOVF_MAGIC:
        raise ValueError("not a MOVF container")
    (n,) = struct.unpack(">I", data[4:8])
    frames, pos = [], 8
    for _ in range(n):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        frames.append(data[pos + 4:pos + 4 + ln])
        pos += 4 + ln
    return frames


def render_clip(text: str, n_frames: int) -> bytes:
    """A short synthetic 'clip': each frame is the rendered page with a
    frame-indexed exposure shift — deterministic, decodable, real PNGs."""
    chars = [c for c in text if not c.isspace()][:MAX_CHARS] or [" "]
    per_line = (CANVAS_W - 2 * MARGIN) // CELL_W
    n_lines = (len(chars) + per_line - 1) // per_line
    height = 2 * MARGIN + n_lines * CELL_H
    rng = np.random.default_rng(_seed(text))
    base = (200 + rng.integers(0, 24, size=(height, CANVAS_W))).astype(np.int16)
    ink_mask = np.zeros((height, CANVAS_W), dtype=bool)
    for i, ch in enumerate(chars):
        row, col = divmod(i, per_line)
        y = MARGIN + row * CELL_H
        x = MARGIN + col * CELL_W
        ink_mask[y:y + GLYPH_H, x:x + GLYPH_W] |= _glyph(ch) == 1
    frames = []
    for k in range(n_frames):
        frame = base - 8 * k  # exposure drift per frame
        frame[ink_mask] = INK
        pix = np.clip(frame, 0, 255).astype(np.uint8)
        frames.append(encode_png(pix.tobytes(), CANVAS_W, height, channels=1))
    return encode_frames(frames)
