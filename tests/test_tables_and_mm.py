"""Time travel / history on icelite, salting skew-spread, and multimodal
stub plumbing."""

from datetime import datetime

from pyspark.sql import functions as F

from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
from sanskrit_ocr_spark.extract.job import extracted_table, run_extraction
from sanskrit_ocr_spark.extract.pipeline import extract_pages
from sanskrit_ocr_spark.ops.multimodal import frame_sample, resize

TS = datetime(2025, 7, 4)


def _pages(spark, lo, hi):
    return spark.createDataFrame(pages_pandas(lo, hi - lo), schema=PAGES_SCHEMA)


def test_time_travel_read(spark, tmp_path):
    root = str(tmp_path / "tt")
    run_extraction(spark, _pages(spark, 0, 100), root, committed_at=TS)
    t = extracted_table(spark, root)
    n1 = t.read().count()
    run_extraction(spark, _pages(spark, 0, 200), root, committed_at=TS)
    # HEAD grew; snapshot 1 still reads exactly the old rows
    assert t.read().count() > n1
    assert t.read(snapshot_id=1).count() == n1
    hist = t.history()
    assert [h["snapshot_id"] for h in hist] == [1, 2]
    assert hist[0]["parent"] == 0


def test_salting_spreads_mega_host(spark):
    """The Zipf mega-host (~30% of rows on site0) must not concentrate in
    few tasks after the salted repartition."""
    pages = _pages(spark, 0, 400).filter(F.col("url").contains("//site0."))
    ext = extract_pages(pages, salt_partitions=16)
    sizes = (ext.withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().collect())
    counts = [r["count"] for r in sizes]
    assert len(counts) >= 8  # spread over many partitions
    assert max(counts) <= 4 * (sum(counts) / len(counts))


def test_resize_stub_schema_and_determinism(spark):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
            .limit(50))
    out = resize(docs, "payload", "doc_id", target_w=64, target_h=64)
    rows = {r["doc_id"]: bytes(r["thumb"]) for r in out.collect()}
    rows2 = {r["doc_id"]: bytes(r["thumb"]) for r in out.collect()}
    assert rows == rows2 and len(rows) == 50
    assert all(len(v) == 64 * 64 // 64 for v in rows.values())


def test_frame_sample_explodes_rows(spark):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
            .limit(20))
    out = frame_sample(docs, "payload", "doc_id", every_n=5).collect()
    assert len(out) >= 20  # at least one frame per doc
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for idxs in per_doc.values():
        assert sorted(idxs) == idxs or sorted(idxs) == sorted(set(idxs))
        assert all(i % 5 == 0 for i in idxs)
