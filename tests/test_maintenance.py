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


def test_remove_orphans(spark, tmp_path):
    """Iceberg remove_orphan_files analog: staging dirs left by crashed or
    race-losing writers are reclaimed; every dir referenced by ANY
    surviving manifest survives (not just HEAD's)."""
    import os

    root = str(tmp_path / "orph")
    for lo in (0, 100):
        run_extraction(spark, _pages(spark, lo, lo + 100), root,
                       committed_at=TS)
    t = extracted_table(spark, root)
    n = t.read().count()

    # a crashed writer: staged data, never committed
    from sanskrit_ocr_spark.extract.pipeline import extract_pages
    orphan_dir, _ = t._stage_data(
        extract_pages(_pages(spark, 200, 250)), t.snapshot_id() + 1)
    assert os.path.isdir(orphan_dir)

    removed = t.remove_orphans()
    assert [os.path.basename(d) for d in removed] == \
        [os.path.basename(orphan_dir)]
    assert not os.path.exists(orphan_dir)
    # both committed snapshots still read intact
    assert t.read().count() == n
    assert t.read(snapshot_id=1).count() < n


def test_row_count_metadata_tracks_merges(spark, tmp_path):
    """merge_on_key records cumulative row counts in the manifest; compact
    and expire preserve them — the zero-job job summary's source."""
    root = str(tmp_path / "rc")
    run_extraction(spark, _pages(spark, 0, 100), root, committed_at=TS)
    t = extracted_table(spark, root)
    assert t.row_count() == 98  # 2 dup urls per 100-row block
    run_extraction(spark, _pages(spark, 0, 200), root, committed_at=TS)
    assert t.row_count() == 196
    t.compact(target_partitions=1)
    assert t.row_count() == 196
    t.expire_snapshots(keep_last=1)
    assert t.row_count() == 196
    assert t.read().count() == 196


def test_expire_widening_window_after_deeper_expiry(spark, tmp_path):
    """r3 ADVICE (low): expire(keep_last=1) followed by expire(keep_last=3)
    with no intervening commits must not crash reading already-expired
    manifests — the retention window clamps to the oldest retained one."""
    root = str(tmp_path / "ew")
    for lo in (0, 100, 200):
        run_extraction(spark, _pages(spark, lo, lo + 100), root,
                       committed_at=TS)
    t = extracted_table(spark, root)
    n = t.read().count()
    t.expire_snapshots(keep_last=1)
    # widening the window reaches below sealed history: a clean no-op
    assert t.expire_snapshots(keep_last=3) == []
    assert t.read().count() == n
    # the table still moves forward: new commit, then expiry works again
    run_extraction(spark, _pages(spark, 300, 400), root, committed_at=TS)
    t2 = extracted_table(spark, root)
    n2 = t2.read().count()
    assert t2.expire_snapshots(keep_last=1) != []
    assert t2.read().count() == n2


def test_history_reports_kinds_and_bookkeeping(spark, tmp_path):
    """r5: history() is the Iceberg snapshots-metadata analog — newest
    first, commit kinds classified, merge bookkeeping carried, zero
    Spark jobs (works without touching the session)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    from sanskrit_ocr_spark.tables.icelite import IceliteTable

    schema = StructType([
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("text", StringType(), False)])

    def batch(lo, hi, tag, day=1):
        return spark.createDataFrame(
            [(f"https://e.org/{i}", f"2025-07-0{day} 00:00:00",
              f"{tag}-{i}") for i in range(lo, hi)],
            "url string, warc_ts string, text string") \
            .withColumn("warc_ts", F.to_timestamp("warc_ts"))

    t = IceliteTable(spark, str(tmp_path / "hist"), schema)
    t.merge_on_key(batch(0, 20, "v1"), "url", order_col="warc_ts")
    t.merge_upsert_mor(batch(0, 5, "v2", day=2), "url")
    t.compact(target_partitions=1)

    h = t.history()
    assert [r["kind"] for r in h] == ["compact", "upsert", "append"]
    assert [r["snapshot_id"] for r in h] == [3, 2, 1]
    assert h[2]["inserted"] == 20
    assert h[0]["total_rows"] == 20

    # zero-Spark path: history() works on a handle that never touches
    # the session (the CLI --history fast path)
    t2 = IceliteTable.__new__(IceliteTable)
    t2.root = str(tmp_path / "hist")
    assert t2.history() == h


def test_expire_older_than(spark, tmp_path):
    """r6: time-based expiry (Iceberg expireOlderThan + retainLast):
    only snapshots committed before the cutoff are eligible, the
    keep_last floor survives even a future cutoff, and a quiet table
    expires nothing."""
    import time
    from datetime import datetime, timedelta

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from sanskrit_ocr_spark.tables.icelite import IceliteTable

    schema = StructType([
        StructField("k", LongType(), False),
        StructField("v", StringType(), False),
    ])
    t = IceliteTable(spark, str(tmp_path / "ot"), schema)
    t.append(spark.createDataFrame([(1, "a")], schema))   # 1
    time.sleep(0.05)
    mid = datetime.now()
    time.sleep(0.05)
    t.append(spark.createDataFrame([(2, "b")], schema))   # 2
    t.append(spark.createDataFrame([(3, "c")], schema))   # 3
    t.append(spark.createDataFrame([(4, "d")], schema))   # 4

    # a cutoff far in the past expires nothing, whatever keep_last says
    assert t.expire_snapshots(keep_last=1,
                              older_than=mid - timedelta(days=1)) == []

    # only snapshot 1 predates mid; 2-4 survive despite keep_last=1
    assert t.expire_snapshots(keep_last=1, older_than=mid) == [1]
    assert t.read(2).count() == 2          # time travel above the cut
    assert t.read().count() == 4

    # future cutoff: everything is "older", the retainLast floor holds
    assert t.expire_snapshots(
        keep_last=2, older_than=datetime.now() + timedelta(hours=1)) \
        == [2]
    assert t.read(3).count() == 3
    assert t.read().count() == 4
