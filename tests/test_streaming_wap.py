"""r6: per-micro-batch write-audit-publish in the streaming ingest — a
poisoned landing file is rolled back and quarantined (tallies in the
``rejected`` sidecar table), never published, never redelivered; clean
batches publish by fast-forwarding the branch ref."""

import os

from pyspark.sql import functions as F

from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
from sanskrit_ocr_spark.extract.job import extracted_table
from sanskrit_ocr_spark.extract.pipeline import extract_pages
from sanskrit_ocr_spark.streaming.ingest import rejected_table, start_ingest


def _pages_df(spark, lo, hi):
    return (spark.createDataFrame(pages_pandas(lo, hi - lo),
                                  schema=PAGES_SCHEMA)
            .select("url", "warc_ts", "html"))


def _failing_urls(spark, lo, hi):
    """The urls in [lo, hi) whose extraction deterministically fails —
    the seeded inventory plants 7 per 100-row block."""
    df = extract_pages(_pages_df(spark, lo, hi))
    return [r["url"] for r in
            df.filter(F.col("status") != "OK").select("url").collect()]


def test_stream_rejects_poisoned_batch_and_quarantines(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # file A: a normal 100-page block (7% failure — under the gate);
    # file B: ONLY the failing pages of the NEXT block (100% failure)
    _pages_df(spark, 0, 100).coalesce(1) \
        .write.parquet(pages_dir)
    bad = _failing_urls(spark, 100, 200)
    assert len(bad) == 7
    _pages_df(spark, 100, 200).filter(F.col("url").isin(bad)) \
        .coalesce(1).write.mode("append").parquet(pages_dir)

    q = start_ingest(spark, pages_dir, root, ckpt, available_now=True,
                     max_files_per_trigger=1,
                     audit_max_fail_rate=0.2,
                     publish_branch="published")
    q.awaitTermination(300)

    ext = extracted_table(spark, root)
    t = ext.read()
    # batch A landed (98 distinct urls, failures included as rows);
    # batch B was rolled back — none of its urls exist
    assert t.count() == 98
    assert t.filter(F.col("url").isin(bad)).count() == 0
    # published branch tracks the last ACCEPTED snapshot == HEAD
    assert ext.branches()["published"] == ext.snapshot_id()
    assert ext.read(branch="published").count() == 98
    # quarantine log: one rejected batch, its 7 failures tallied
    rej = rejected_table(spark, root).read()
    assert rej.select("batch_id").distinct().count() == 1
    assert rej.agg(F.sum("fail_count")).collect()[0][0] == 7
    assert rej.filter(F.col("fail_rate") < 0.99).count() == 0

    # the rejected batch is CONSUMED: a re-drain redelivers nothing,
    # the table and the quarantine log are unchanged
    q = start_ingest(spark, pages_dir, root, ckpt, available_now=True,
                     max_files_per_trigger=1,
                     audit_max_fail_rate=0.2,
                     publish_branch="published")
    q.awaitTermination(300)
    assert extracted_table(spark, root).read().count() == 98
    assert rejected_table(spark, root).read() \
        .select("batch_id").distinct().count() == 1


def test_stream_accepts_clean_batches_and_publishes(spark, tmp_path):
    pages_dir = str(tmp_path / "pages2")
    root = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    _pages_df(spark, 0, 100).coalesce(1).write.parquet(pages_dir)
    _pages_df(spark, 100, 200).coalesce(1) \
        .write.mode("append").parquet(pages_dir)

    q = start_ingest(spark, pages_dir, root, ckpt, available_now=True,
                     max_files_per_trigger=1,
                     audit_max_fail_rate=0.2,
                     publish_branch="published")
    q.awaitTermination(300)

    ext = extracted_table(spark, root)
    assert ext.read().count() == 196
    assert ext.branches()["published"] == ext.snapshot_id()
    # nothing quarantined: the sidecar table was never even created
    assert not os.path.isdir(
        os.path.join(root, "rejected", "_icelite", "commits")) or \
        rejected_table(spark, root).read().count() == 0
