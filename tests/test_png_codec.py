"""The pure-stdlib PNG codec: spec-level structure, roundtrips, all five
scanline filters on decode, and the deterministic renderer's geometry."""

import struct
import zlib

import numpy as np
import pytest

from sanskrit_ocr_spark.datagen.images import (
    decode_frames,
    encode_frames,
    render_clip,
    render_text_png,
)
from sanskrit_ocr_spark.kernels.png import (
    PNG_SIG,
    decode_png,
    encode_png,
    png_geometry,
)


def test_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(42)
    for ch in (1, 3):
        pix = rng.integers(0, 256, size=11 * 7 * ch, dtype=np.uint8).tobytes()
        data = encode_png(pix, 11, 7, channels=ch)
        assert data[:8] == PNG_SIG
        w, h, c, out = decode_png(data)
        assert (w, h, c) == (11, 7, ch)
        assert out == pix
        assert png_geometry(data) == (11, 7, ch)


def test_spec_structure_and_crc():
    data = encode_png(bytes(range(12)), 4, 3, channels=1)
    # IHDR directly after signature, correct geometry fields
    assert data[8:16] == struct.pack(">I", 13) + b"IHDR"
    w, h, depth, color = struct.unpack(">IIBB", data[16:26])
    assert (w, h, depth, color) == (4, 3, 8, 0)
    # every chunk CRC must validate
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        assert crc == (zlib.crc32(tag + body) & 0xFFFFFFFF), tag
        pos += 12 + length
    assert tag == b"IEND"


def _png_with_filters(width, height, channels, pixels, ftypes):
    """Hand-build a PNG whose scanlines use the given filter types —
    exercises the decoder against externally-encoded filter modes."""
    stride = width * channels
    arr = np.frombuffer(pixels, np.uint8).reshape(height, stride).astype(int)
    raw = bytearray()
    prev = np.zeros(stride, dtype=int)
    for y, ft in enumerate(ftypes):
        row = arr[y]
        left = np.concatenate([np.zeros(channels, int), row[:-channels]])
        uleft = np.concatenate([np.zeros(channels, int), prev[:-channels]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - left
        elif ft == 2:
            enc = row - prev
        elif ft == 3:
            enc = row - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - uleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - uleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, uleft))
            enc = row - pred
        raw.append(ft)
        raw += (enc % 256).astype(np.uint8).tobytes()
        prev = row

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8,
                       0 if channels == 1 else 2, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("channels", [1, 3])
def test_decode_all_filter_types(channels):
    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, size=6 * 5 * channels, dtype=np.uint8).tobytes()
    data = _png_with_filters(6, 5, channels, pix, [0, 1, 2, 3, 4])
    w, h, c, out = decode_png(data)
    assert (w, h, c) == (6, 5, channels)
    assert out == pix


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        decode_png(PNG_SIG + b"\x00\x00\x00\x01IHDRx")


def test_renderer_geometry_and_ink():
    data = render_text_png("hello world this is a doc")
    w, h, c, pix = decode_png(data)
    arr = np.frombuffer(pix, np.uint8).reshape(h, w)
    assert w == 96 and c == 1
    # 22 non-space chars, 14 per line → 2 lines → 8 + 2*9 = 26 rows
    assert h == 26
    assert (arr == 32).sum() > 50          # ink pixels present
    assert arr.max() >= 200                # textured background present
    assert render_text_png("hello world this is a doc") == data  # determinism
    assert render_text_png("different text") != data


def test_clip_container_roundtrip():
    clip = render_clip("some document text", 4)
    frames = decode_frames(clip)
    assert len(frames) == 4
    geoms = {decode_png(f)[:2] for f in frames}
    assert len(geoms) == 1  # constant geometry across frames
    # exposure drift: later frames darker on background pixels
    m0 = np.frombuffer(decode_png(frames[0])[3], np.uint8).mean()
    m3 = np.frombuffer(decode_png(frames[3])[3], np.uint8).mean()
    assert m3 < m0
    assert encode_frames(frames) == clip


def test_decode_externally_encoded_pngs():
    """Cross-codec pin (r2 VERDICT #6): decode PNGs produced by a STANDARD
    external encoder, not this repo's own — the reference's artifact is
    real PIL-rendered PNGs (render_text.py:148,276). Fixtures: the Sphinx
    basic-theme 11x11 grayscale icons shipped with the Python docs
    (BSD-licensed, 90 bytes each), committed verbatim."""
    import hashlib
    import os

    import numpy as np

    fx = os.path.join(os.path.dirname(__file__), "fixtures")
    out = {}
    for name in ("minus.png", "plus.png"):
        with open(os.path.join(fx, name), "rb") as f:
            w, h, ch, pix = decode_png(f.read())
        assert (w, h, ch) == (11, 11, 1)
        out[name] = np.frombuffer(pix, np.uint8).reshape(11, 11)

    minus, plus = out["minus.png"], out["plus.png"]
    # semantic content, not just a hash: border ring, horizontal bar dark
    assert (minus[0] == 204).all() and (minus[:, 0] == 204).all()
    assert (minus[5, 2:9] == 41).all()       # the minus stroke
    assert (plus[5, 2:9] == 41).all()        # plus shares the h-bar
    assert (plus[2:9, 5] == 41).all()        # ... and adds the v-bar
    # the two icons differ EXACTLY in the vertical bar of the plus
    diff = np.argwhere(minus != plus)
    assert set(map(tuple, diff)) == {(r, 5) for r in (2, 3, 4, 6, 7, 8)}
    # full-buffer regression pins
    assert hashlib.md5(minus.tobytes()).hexdigest() == \
        "3da05aab5eba05e1489618c6ff5db2ad"
    assert hashlib.md5(plus.tobytes()).hexdigest() == \
        "e733e2d69715323d82c1246516be8351"


def test_roundtrip_property_random_images():
    """Hypothesis: encode→decode is the identity for arbitrary pixel
    content and geometry (gray + RGB), including dimensions that stress
    filter heuristics and scanline boundaries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(1, 40), st.integers(1, 40), st.sampled_from([1, 3]),
           st.integers(0, 2**32 - 1))
    @settings(max_examples=60, deadline=None)
    def check(w, h, channels, seed):
        rng = np.random.default_rng(seed)
        pix = rng.integers(0, 256, size=h * w * channels,
                           dtype=np.uint8).tobytes()
        enc = encode_png(pix, w, h, channels=channels)
        w2, h2, ch2, out = decode_png(enc)
        assert (w2, h2, ch2) == (w, h, channels)
        assert out == pix

    check()
