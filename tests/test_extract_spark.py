"""Golden byte-identity: the Spark pipeline's output must equal the pure
kernels' output byte-for-byte per url (BASELINE.json input_hint contract)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_df, pages_pandas
from sanskrit_ocr_spark.extract.pipeline import N_BUCKETS, extract_pages, lineage_rows
from sanskrit_ocr_spark.kernels.page import extract_page

N = 300


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(pages_pandas(0, N), schema=PAGES_SCHEMA).cache()


def _goldens() -> dict[str, tuple]:
    """url → (text, spans, n_graphemes, status), pure-kernel computed.
    Duplicate urls: keep the first (lowest warc_ts) — merge semantics."""
    out = {}
    for _, row in pages_pandas(0, N).iterrows():
        if row["url"] not in out:
            out[row["url"]] = extract_page(row["html"])
    return out


def _first_wins(df):
    """Deterministic first-wins per url (D1 semantics — NOT dropDuplicates,
    which keeps an arbitrary row)."""
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def test_byte_identity_per_url(spark, pages):
    got = {
        r["url"]: (r["text"],
                   [(s["start"], s["end"]) for s in r["sentences"]],
                   r["n_graphemes"], r["status"])
        for r in _first_wins(extract_pages(pages)).collect()
    }
    golden = _goldens()
    assert set(got) == set(golden)
    for url, g in golden.items():
        r = got[url]
        assert r[0] == g[0], f"text mismatch for {url}"
        assert r[1] == g[1], f"spans mismatch for {url}"
        assert r[2] == g[2], f"grapheme count mismatch for {url}"
        assert r[3] == g[3], f"status mismatch for {url}"


def test_salted_repartition_same_result(spark, pages):
    a = {r["url"]: r["text"]
         for r in _first_wins(extract_pages(pages)).collect()}
    b = {r["url"]: r["text"]
         for r in _first_wins(extract_pages(pages, salt_partitions=16)).collect()}
    assert a == b


def test_distributed_datagen_matches_local(spark):
    # sort by warc_ts (unique per row; url has deliberate duplicates)
    dist = pages_df(spark, 120, n_partitions=7).orderBy("warc_ts").toPandas()
    local = pages_pandas(0, 120).sort_values("warc_ts").reset_index(drop=True)
    assert dist["url"].tolist() == local["url"].tolist()
    assert [bytes(b) for b in dist["html"]] == local["html"].tolist()
    assert dist["text"].tolist() == local["text"].tolist()


def test_part_hash_is_bucket(spark, pages):
    rows = extract_pages(pages).select("part_hash").distinct().collect()
    assert all(0 <= r["part_hash"] < N_BUCKETS for r in rows)


def test_lineage_counts(spark, pages):
    ext = extract_pages(pages).cache()
    try:
        lin = lineage_rows(ext, snapshot_id=1,
                           committed_at=pd.Timestamp("2025-07-04")).cache()
        total = lin.groupBy().agg(
            F.sum("fail_count").alias("n")).collect()[0]["n"]
        assert total == N
        by_code = {r["fail_code"]: r["n"] for r in
                   lin.groupBy("fail_code")
                   .agg(F.sum("fail_count").alias("n")).collect()}
        # inventory per 100-row block: 1 DECODE_FAIL, 3 PARSE_FAIL (corrupt
        # JSON + washboard + cylinder warp), 3 EMPTY
        assert by_code["DECODE_FAIL"] == 3
        assert by_code["PARSE_FAIL"] == 9
        assert by_code["EMPTY"] == 9
        assert by_code["OK"] == N - 21
        # per-partition doc_count equals the sum of its fail_counts
        per_part = (lin.groupBy("partition_hash", "doc_count")
                    .agg(F.sum("fail_count").alias("s")).collect())
        assert all(r["doc_count"] == r["s"] for r in per_part)
    finally:
        ext.unpersist()


def test_x_fixture_oracles_are_fresh(spark):
    """The committed golden_x1_500/golden_x2_500 fixtures (the DuckDB oracle
    side of x1_extract_pages / x2_lineage) must match what the pipeline
    produces today — regenerate via tools/regen_fixtures.py in the same
    commit as any intentional semantics change."""
    import os

    import __spark_entry__ as entrymod

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    q = entrymod.queries()
    for name, fname, key in [
            ("x1_extract_pages", "golden_x1_500.parquet", ["url"]),
            ("x2_lineage", "golden_x2_500.parquet",
             ["partition_hash", "fail_code"])]:
        got = (q[name](spark, "unused").toPandas()
               .sort_values(key).reset_index(drop=True))
        want = (pd.read_parquet(os.path.join(fixdir, fname))
                .sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_k4_jsonl_caption_sink(spark, pages, tmp_path):
    """K4 (reference generate_dataset.py:41-42): captions written as JSON
    lines with raw UTF-8 (the ensure_ascii=False analog is Spark's default
    JSON writer behavior) and lossless on re-read."""
    import glob

    ext = extract_pages(pages)
    captions = ext.filter(F.col("status") == "OK").select("url", "text")
    out = str(tmp_path / "captions_jsonl")
    captions.coalesce(2).write.mode("overwrite").json(out)

    back = spark.read.schema("url string, text string").json(out)
    got = sorted((r["url"], r["text"]) for r in back.collect())
    want = sorted((r["url"], r["text"]) for r in captions.collect())
    assert got == want and len(got) > 0

    raw = b"".join(open(p, "rb").read()
                   for p in glob.glob(f"{out}/part-*.json"))
    # one JSON object per line, Devanagari as raw UTF-8 bytes (no \uXXXX)
    assert "क".encode() in raw or "त".encode() in raw
    assert b"\\u09" not in raw
