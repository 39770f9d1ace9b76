"""Table maintenance: compaction + snapshot expiry (Iceberg
rewrite_data_files / expire_snapshots analogs)."""

from datetime import datetime

from pyspark.sql import functions as F

from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
from sanskrit_ocr_spark.extract.job import extracted_table, run_extraction

TS = datetime(2025, 7, 4)


def _pages(spark, lo, hi):
    return spark.createDataFrame(pages_pandas(lo, hi - lo), schema=PAGES_SCHEMA)


def test_compact_preserves_data_and_shrinks_files(spark, tmp_path):
    root = str(tmp_path / "c")
    for lo in (0, 100, 200, 300):
        run_extraction(spark, _pages(spark, lo, lo + 100), root,
                       committed_at=TS)
    t = extracted_table(spark, root)
    before_files = len(t.committed_files())
    before = {(r["url"], r["text"]) for r in t.read().collect()}

    sid = t.compact(target_partitions=2)
    after_files = len(t.committed_files())
    after = {(r["url"], r["text"]) for r in t.read().collect()}

    assert after == before
    assert after_files < before_files
    assert after_files <= 2
    # pre-compaction snapshot still time-travels
    assert t.read(snapshot_id=sid - 1).count() == len(before)


def test_expire_snapshots(spark, tmp_path):
    root = str(tmp_path / "e")
    for lo in (0, 100, 200):
        run_extraction(spark, _pages(spark, lo, lo + 100), root,
                       committed_at=TS)
    t = extracted_table(spark, root)
    head = t.snapshot_id()
    n = t.read().count()

    expired = t.expire_snapshots(keep_last=1)
    assert expired == list(range(1, head))
    # HEAD unaffected; its (cumulative) files all survive expiry
    assert t.read().count() == n
    # expired snapshot manifests are gone
    import pytest
    with pytest.raises(FileNotFoundError):
        t.read(snapshot_id=1)


def test_expire_after_compact_removes_old_files(spark, tmp_path):
    import os
    root = str(tmp_path / "ec")
    for lo in (0, 100):
        run_extraction(spark, _pages(spark, lo, lo + 100), root,
                       committed_at=TS)
    t = extracted_table(spark, root)
    old_files = set(t.committed_files())
    n = t.read().count()
    t.compact(target_partitions=1)
    t.expire_snapshots(keep_last=1)
    # compacted table intact; every pre-compaction data file physically gone
    assert t.read().count() == n
    assert all(not os.path.exists(f) for f in old_files)
