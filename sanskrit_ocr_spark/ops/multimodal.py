"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The reference stores document images as PNG files on disk next to a JSONL
caption table (``generate_dataset.py:36-42``); the Spark-native shape is a
``binary`` column with typed metadata columns, processed by Arrow-batched
``mapInPandas`` UDFs. The image/audio codec libraries are NOT installed in
this container, so the decode step is a clearly-marked STUB behind an
import-try (deterministic fake features from the payload bytes); the
Spark-side plumbing — schema, batch shape, partitioning — is real and tested.

``mm_binary_meta`` is the oracle-checkable slice (pure byte metadata);
``mm_feature_extract`` exercises the full stub-decode UDF (rows-only).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sanskrit_ocr_spark.ops.relational import t

try:  # real decoder, if ever available in the runtime image
    import PIL.Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


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


# --- stub decode / feature extraction ---------------------------------------------

def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """STUB: deterministic fake (width, height, mean_luma) from the payload
    digest. Replace with a real codec (PIL/ffmpeg) on a runtime image that
    ships one — the UDF signature, schema and batch shape stay identical."""
    if _HAVE_PIL:
        # Real path intentionally unimplemented in this sandbox: the synthetic
        # payloads are not real images. Kept as the seam for production.
        raise NotImplementedError("real image decode not wired in sandbox")
    d = hashlib.md5(payload).digest()
    width = 64 + d[0]            # 64..319 px
    height = 64 + d[1]
    mean_luma = round(d[2] / 255.0, 4)
    return width, height, mean_luma


def feature_extract(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Arrow-batched stub feature extraction over an opaque binary column."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf[binary_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": pd.array([f[0] for f in feats], dtype="int32"),
                "height": pd.array([f[1] for f in feats], dtype="int32"),
                "mean_luma": [f[2] for f in feats],
            })

    return df.select(id_col, binary_col).mapInPandas(
        body, schema=f"{id_col} long, width int, height int, mean_luma double")


def mm_feature_extract(spark, sf):
    docs = (t(spark, sf, "documents")
            .select("doc_id", F.encode("text", "UTF-8").alias("payload")))
    return feature_extract(docs, "payload", "doc_id")


# --- stub resize / frame-sample (typed plumbing for image & video columns) -----

def resize(df: DataFrame, binary_col: str, id_col: str,
           target_w: int = 224, target_h: int = 224) -> DataFrame:
    """STUB resize: emits a deterministic fake thumbnail payload of the
    target geometry (md5-keyed) plus the typed metadata a real codec path
    would produce. Schema/batching identical to a production PIL resize."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs, ws, hs = [], [], []
            for p in pdf[binary_col]:
                d = hashlib.md5(bytes(p)).digest()
                # fake thumbnail: digest tiled to target_w*target_h/64 bytes
                thumbs.append((d * (target_w * target_h // (64 * len(d)) + 1)
                               )[: target_w * target_h // 64])
                ws.append(target_w)
                hs.append(target_h)
            yield pd.DataFrame({
                id_col: pdf[id_col], "thumb": thumbs,
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
            })

    return df.select(id_col, binary_col).mapInPandas(
        body, schema=f"{id_col} long, thumb binary, width int, height int")


def frame_sample(df: DataFrame, binary_col: str, id_col: str,
                 every_n: int = 10) -> DataFrame:
    """STUB video frame sampling: one output row per sampled frame index
    (explode-shaped UDF output — rows out ≠ rows in, the mapInPandas
    contract a real ffmpeg frame sampler needs)."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(p)
                n_frames = 1 + len(payload) % 50  # fake stream length
                for k in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(hashlib.md5(payload + bytes([k % 256]))
                                  .digest())
            yield pd.DataFrame({
                id_col: pd.array(ids, dtype="int64"),
                "frame_idx": pd.array(idxs, dtype="int32"),
                "frame": frames,
            })

    return df.select(id_col, binary_col).mapInPandas(
        body, schema=f"{id_col} long, frame_idx int, frame binary")


def mm_resize(spark, sf):
    docs = (t(spark, sf, "documents")
            .select("doc_id", F.encode("text", "UTF-8").alias("payload")))
    return resize(docs, "payload", "doc_id")


def mm_frame_sample(spark, sf):
    docs = (t(spark, sf, "documents")
            .select("doc_id", F.encode("text", "UTF-8").alias("payload")))
    return frame_sample(docs, "payload", "doc_id")


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_feature_extract": mm_feature_extract,
    "mm_resize": mm_resize,
    "mm_frame_sample": mm_frame_sample,
}

ORACLES = {
    "mm_binary_meta": META_SQL,
    # mm_feature_extract: stub decode is not SQL-expressible — rows-only.
}
