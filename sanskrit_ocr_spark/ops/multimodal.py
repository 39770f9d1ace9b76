"""Multimodal columns: real PNG payloads + typed metadata, Arrow-batched.

The reference's multimodal artifact is a real PNG per document plus a
caption record (``render_text.py:148,276``, ``generate_dataset.py:36-42``).
Spark-native shape: an opaque ``binary`` column processed by vectorized
``mapInPandas`` UDFs. Since round 2 the decode path is REAL — a pure-stdlib
PNG codec (``kernels/png.py``) and a deterministic renderer
(``datagen/images.py``) replace the round-1 digest stubs:

* ``mm_binary_meta``     — JVM-side byte metadata (SQL oracle);
* ``mm_feature_extract`` — render → decode → true geometry + pixel mean;
* ``mm_resize``          — decode → nearest-neighbor resample → re-encode;
* ``mm_frame_sample``    — multi-frame container → every-Nth real frame
  (explode-shaped output: rows out ≠ rows in).

The three decode queries are pinned by committed golden fixtures (the
DuckDB oracle side reads the expected parquet — a regression pin like
``golden_x1_500``, regenerated via ``tools/regen_fixtures.py``), and by
pytest checks against independent numpy computations.

Scale notes: one render stage and one decode stage, both Arrow-batched
maps with no shuffle between them; at 100 TB the payload column arrives
from storage instead of the render stage and the decode plan is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sanskrit_ocr_spark.conf import FIXTURES_DIR
from sanskrit_ocr_spark.datagen.images import (
    decode_frames,
    render_clip,
    render_text_png,
)
from sanskrit_ocr_spark.kernels.png import decode_png, encode_png
from sanskrit_ocr_spark.ops.relational import t
from sanskrit_ocr_spark.ops.util import spread as _spread


# --- oracle-checkable byte metadata ----------------------------------------------

def mm_binary_meta(spark, sf):
    docs = t(spark, sf, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


META_SQL = """
SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS content_md5
FROM documents
"""


# --- render stage (datagen analog: text → real PNG payload column) --------------

def render_page_images(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, text) → (id, image:binary) — a real PNG per row."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "image": [render_text_png(s) for s in pdf[text_col]],
            })

    return df.select(id_col, text_col).mapInPandas(
        body, schema=f"{id_col} long, image binary")


# --- real decode / feature extraction ---------------------------------------------

def feature_extract(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Arrow-batched REAL decode of a PNG binary column: geometry from
    IHDR, mean luma from the decoded pixel buffer."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, lumas = [], [], []
            for p in pdf[binary_col]:
                w, h, _, pix = decode_png(bytes(p))
                ws.append(w)
                hs.append(h)
                lumas.append(round(float(np.frombuffer(pix, np.uint8).mean())
                                   / 255.0, 4))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "mean_luma": lumas,
            })

    return df.select(id_col, binary_col).mapInPandas(
        body, schema=f"{id_col} long, width int, height int, mean_luma double")



def mm_feature_extract(spark, sf):
    docs = _spread(t(spark, sf, "documents").select("doc_id", "text"))
    return feature_extract(render_page_images(docs, "text", "doc_id"),
                           "image", "doc_id")


# --- real resize (decode → nearest-neighbor resample → re-encode) ----------------

def resize(df: DataFrame, binary_col: str, id_col: str,
           target_w: int = 24, target_h: int = 16) -> DataFrame:
    """Decode each PNG, nearest-neighbor resample to the target geometry,
    re-encode as a real PNG thumbnail. ``pixel_md5`` digests the DECODED
    pixel buffer of the freshly encoded thumbnail (an encode→decode
    roundtrip), not the compressed bytes: zlib stream output is not stable
    across zlib builds, pixel content is."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs, pix_md5 = [], []
            for p in pdf[binary_col]:
                w, h, ch, pix = decode_png(bytes(p))
                arr = np.frombuffer(pix, np.uint8).reshape(h, w * ch)
                if ch > 1:
                    arr = arr.reshape(h, w, ch)
                ys = (np.arange(target_h) * h) // target_h
                xs = (np.arange(target_w) * w) // target_w
                small = arr[ys][:, xs]
                enc = encode_png(small.tobytes(), target_w, target_h,
                                 channels=ch)
                thumbs.append(enc)
                _, _, _, out_pix = decode_png(enc)
                pix_md5.append(hashlib.md5(out_pix).hexdigest())
            yield pd.DataFrame({
                id_col: pdf[id_col], "thumb": thumbs,
                "pixel_md5": pix_md5,
                "width": pd.array([target_w] * len(thumbs), dtype="int32"),
                "height": pd.array([target_h] * len(thumbs), dtype="int32"),
            })

    return df.select(id_col, binary_col).mapInPandas(
        body, schema=f"{id_col} long, thumb binary, pixel_md5 string,"
                     " width int, height int")


def mm_resize(spark, sf):
    docs = _spread(t(spark, sf, "documents").select("doc_id", "text"))
    thumbs = resize(render_page_images(docs, "text", "doc_id"),
                    "image", "doc_id")
    # decoded-pixel digest: driver-hashable AND zlib-build-independent
    # (md5 of the compressed thumb would pin this container's zlib)
    return thumbs.select("doc_id", "width", "height", "pixel_md5")


# --- real frame sampling (explode-shaped: rows out ≠ rows in) ---------------------

def frame_sample(df: DataFrame, binary_col: str, id_col: str,
                 every_n: int = 3) -> DataFrame:
    """MOVF multi-frame container → one output row per sampled frame,
    each a real decoded-and-verified PNG."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, ws, hs, pmd5 = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                all_frames = decode_frames(bytes(p))
                for k in range(0, len(all_frames), every_n):
                    w, h, _, pix = decode_png(all_frames[k])
                    ids.append(i)
                    idxs.append(k)
                    frames.append(all_frames[k])
                    ws.append(w)
                    hs.append(h)
                    # decoded-pixel digest (zlib-build-independent; see
                    # resize())
                    pmd5.append(hashlib.md5(pix).hexdigest())
            yield pd.DataFrame({
                id_col: pd.array(ids, dtype="int64"),
                "frame_idx": pd.array(idxs, dtype="int32"),
                "frame": frames,
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "pixel_md5": pmd5,
            })

    return df.select(id_col, binary_col).mapInPandas(
        body,
        schema=f"{id_col} long, frame_idx int, frame binary,"
               " width int, height int, pixel_md5 string")


def render_clips(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, text) → (id, clip:binary): a MOVF container of real PNG frames;
    frame count varies deterministically with the text length."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "clip": [render_clip(s, 2 + len(s) % 9)
                         for s in pdf[text_col]],
            })

    return df.select(id_col, text_col).mapInPandas(
        body, schema=f"{id_col} long, clip binary")


def mm_frame_sample(spark, sf):
    docs = _spread(t(spark, sf, "documents").select("doc_id", "text"))
    sampled = frame_sample(render_clips(docs, "text", "doc_id"),
                           "clip", "doc_id")
    return sampled.select("doc_id", "frame_idx", "width", "height",
                          "pixel_md5")


# --- perceptual-hash image near-dup detection (pHash + banded Hamming join) -----

PHASH_GRID = 32        # resample size before the DCT
PHASH_BLOCK = 8        # low-frequency block kept (8×8 → 64 bits)
PHASH_MAX_HAMMING = 3  # candidate index: ops.dedup.hamming_candidates


def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (float64, deterministic)."""
    k = np.arange(n)[:, None].astype(np.float64)
    m = np.arange(n)[None, :].astype(np.float64)
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    c[0] *= 1.0 / np.sqrt(2.0)
    return c


_DCT32 = _dct_basis(PHASH_GRID)


def phash64(png_bytes: bytes) -> int:
    """64-bit perceptual hash of a PNG: decode → grayscale → 32×32
    nearest-neighbor resample → 2-D DCT-II → 8×8 low-frequency block →
    threshold at the median of the AC coefficients. The standard pHash
    construction; robust to resizing/small pixel changes, so near-dup
    IMAGES (not just byte-identical files) land within a few bits."""
    w, h, ch, pix = decode_png(png_bytes)
    arr = np.frombuffer(pix, np.uint8).reshape(h, w * ch)
    if ch > 1:
        arr = arr.reshape(h, w, ch).astype(np.float64).mean(axis=2)
    else:
        arr = arr.astype(np.float64)
    ys = (np.arange(PHASH_GRID) * h) // PHASH_GRID
    xs = (np.arange(PHASH_GRID) * w) // PHASH_GRID
    small = arr[ys][:, xs]
    coeffs = (_DCT32 @ small @ _DCT32.T)[:PHASH_BLOCK, :PHASH_BLOCK].ravel()
    med = float(np.median(coeffs[1:]))  # AC median; DC excluded
    val = 0
    for i, c in enumerate(coeffs):
        if c > med:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def mm_phash_dedup(spark, sf):
    """Image near-duplicate pairs by perceptual hash — the multimodal arm
    of the dedup family (training pipelines dedup images the same way
    SimHash dedups text). One Arrow-batched map computes the 64-bit pHash
    per image; candidates come from the shared Manku permuted-block
    index (``ops.dedup.hamming_candidates`` — full recall for Hamming ≤
    ``PHASH_MAX_HAMMING`` with ~32-bit table keys, so the candidate join
    stays linear at web scale); the exact Hamming verify is JVM
    ``bit_count(xor)`` on candidates only. Scale shape: narrow map →
    shuffle on an 8-byte table key → bounded verify; never all-pairs."""
    from sanskrit_ocr_spark.ops.dedup import hamming_candidates

    docs = _spread(t(spark, sf, "documents").select("doc_id", "text"))
    imgs = render_page_images(docs, "text", "doc_id")

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "ph": [phash64(bytes(p)) for p in pdf["image"]],
            })

    hashed = imgs.mapInPandas(body, schema="doc_id long, ph long")
    cand = hamming_candidates(hashed, "ph",
                              max_hamming=PHASH_MAX_HAMMING)
    return (cand
            .select("a_id", "b_id",
                    F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                    .alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= PHASH_MAX_HAMMING))


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_feature_extract": mm_feature_extract,
    "mm_resize": mm_resize,
    "mm_frame_sample": mm_frame_sample,
    "mm_phash_dedup": mm_phash_dedup,
}

# fixtures dir derived from the package location so the oracle SQL works
# for any checkout root / --py-files deployment (not just /root/repo)
_FX = FIXTURES_DIR

ORACLES = {
    "mm_binary_meta": META_SQL,
    # Golden-fixture oracles (regression pins — the fixtures are committed
    # outputs of this code over the sf0.01 documents table; regenerate via
    # tools/regen_fixtures.py with any intentional semantics change):
    "mm_feature_extract":
        f"SELECT * FROM read_parquet('{_FX}/golden_mm_features_sf001.parquet')",
    "mm_resize":
        f"SELECT * FROM read_parquet('{_FX}/golden_mm_resize_sf001.parquet')",
    "mm_frame_sample":
        f"SELECT * FROM read_parquet('{_FX}/golden_mm_frames_sf001.parquet')",
    # deterministic end-to-end (seeded renderer → stdlib codec → float64
    # DCT → fixed banding), so pinnable exactly like the other mm queries
    "mm_phash_dedup":
        f"SELECT * FROM read_parquet('{_FX}/golden_mm_phash_sf001.parquet')",
}
