"""r6: copy-on-write DELETE FROM with manifest-level file pruning.
The scale property under test: on a range-clustered table, a range
purge rewrites ONLY the files whose stat bounds overlap the range —
every other file is carried into the new snapshot untouched (same
path, zero bytes moved), which is what makes an id/ts-range purge on
a 10^12-row table O(matching files) instead of O(table)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA = StructType([
    StructField("k", LongType(), False),
    StructField("v", StringType(), False),
])


def _batch(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v-{i}") for i in range(lo, hi)], SCHEMA)


def _clustered(spark, tmp_path, name="t", files=8, rows=800):
    t = IceliteTable(spark, str(tmp_path / name), SCHEMA,
                     stat_cols=["k"], sort_cols=["k"])
    t.append(_batch(spark, 0, rows).repartition(files, "k"))
    return t


def test_range_purge_rewrites_only_overlapping_files(spark, tmp_path):
    t = _clustered(spark, tmp_path)
    before = set(t.committed_files())
    assert len(before) == 8

    sid, deleted = t.delete_where(F.col("k").between(100, 199),
                                  prune={"k": (100, 199)})
    assert (sid, deleted) == (2, 100)
    after = set(t.committed_files())
    # the range-clustered layout puts [100, 199] in 1-2 files: all the
    # others survive BY PATH (pure metadata carry-over)
    assert len(before & after) >= 6
    got = sorted(r["k"] for r in t.read().collect())
    assert got == [k for k in range(800) if not 100 <= k <= 199]
    assert t.history()[0]["kind"] == "delete"
    # time travel still sees the pre-delete rows
    assert t.read(1).count() == 800


def test_stats_survive_and_keep_pruning(spark, tmp_path):
    t = _clustered(spark, tmp_path)
    t.delete_where(F.col("k").between(100, 199), prune={"k": (100, 199)})
    # data skipping still bites on the carried-over entries
    probe = t.read(prune={"k": (700, 750)})
    assert len(probe.inputFiles()) <= 2
    assert probe.filter(F.col("k").between(700, 750)).count() == 51
    # and the deleted range now scans at most the rewritten files
    hole = t.read(prune={"k": (100, 199)})
    assert hole.filter(F.col("k").between(100, 199)).count() == 0


def test_no_prune_is_correct_but_full_rewrite(spark, tmp_path):
    t = _clustered(spark, tmp_path, "full")
    before = set(t.committed_files())
    sid, deleted = t.delete_where("k % 2 = 0")
    assert deleted == 400
    assert not (before & set(t.committed_files()))  # all rewritten
    assert sorted(r["k"] for r in t.read().collect()) == \
        list(range(1, 800, 2))
    assert t._manifest(sid)["deleted"] == 400


def test_nothing_matches_commits_nothing(spark, tmp_path):
    t = _clustered(spark, tmp_path, "noop")
    head = t.snapshot_id()
    # prune eliminates every file: no read, no commit
    sid, deleted = t.delete_where(F.col("k") > 10**9,
                                  prune={"k": (10**9, None)})
    assert (sid, deleted) == (head, 0)
    # predicate matches nothing but files were read: still no commit
    sid2, deleted2 = t.delete_where(F.col("v") == "absent")
    assert (sid2, deleted2) == (head, 0)
    assert t.snapshot_id() == head
    assert t.read().count() == 800


def test_null_predicate_rows_are_kept(spark, tmp_path):
    schema = StructType([
        StructField("k", LongType(), False),
        StructField("n", LongType(), True),
    ])
    t = IceliteTable(spark, str(tmp_path / "nulls"), schema)
    t.append(spark.createDataFrame(
        [(0, 5), (1, None), (2, 50)], schema))
    _, deleted = t.delete_where(F.col("n") > 10)
    assert deleted == 1
    assert sorted(r["k"] for r in t.read().collect()) == [0, 1]


def test_pending_mor_deletes_refused(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "mor"), SCHEMA)
    t.append(_batch(spark, 0, 50))
    t.merge_upsert_mor(_batch(spark, 0, 5), "k")
    with pytest.raises(ValueError, match="compact"):
        t.delete_where(F.col("k") < 10)
    # after compaction the delete proceeds
    t.compact(target_partitions=2)
    _, deleted = t.delete_where(F.col("k") < 10)
    assert deleted == 10
    assert t.read().count() == 40


def test_carries_watermark_bookkeeping(spark, tmp_path):
    t = _clustered(spark, tmp_path, "wm")
    t.commit_meta({"extracted_watermark": 7})
    t.delete_where(F.col("k") < 100, prune={"k": (None, 99)})
    assert t._manifest(t.snapshot_id())["extracted_watermark"] == 7


def test_cli_retention_purge(tmp_path):
    """--maintain --purge-before: retention purge at the CLI surface,
    checked against an independent pyarrow count of the pre-purge
    files, idempotent on re-run, visible in --history as a delete."""
    import glob
    import json
    import subprocess
    import sys

    import pyarrow.dataset as pads
    import datetime as dt

    root = str(tmp_path / "ret")
    run = subprocess.run(
        [sys.executable, "-m", "sanskrit_ocr_spark.extract",
         "--rows", "300", "--root", root, "--master", "local[8]"],
        capture_output=True, text=True)
    assert run.returncode == 0, run.stderr
    assert json.loads(run.stdout)["inserted"] == 294

    cutoff = dt.datetime(2025, 7, 4, 1, 40)
    files = glob.glob(f"{root}/extracted/data/**/*.parquet",
                      recursive=True)
    pre = pads.dataset(files).to_table(columns=["warc_ts"])
    cutoff_utc = cutoff.replace(tzinfo=dt.timezone.utc)
    want_purged = sum(v < cutoff_utc for v in pre["warc_ts"].to_pylist())

    m1 = subprocess.run(
        [sys.executable, "-m", "sanskrit_ocr_spark.extract",
         "--maintain", "--root", root, "--master", "local[8]",
         "--purge-before", cutoff.isoformat()],
        capture_output=True, text=True)
    assert m1.returncode == 0, m1.stderr
    out = json.loads(m1.stdout)
    assert out["purged_rows"] == want_purged > 0
    assert out["rows"] == 294 - want_purged

    # idempotent: a second purge at the same cutoff removes nothing
    m2 = subprocess.run(
        [sys.executable, "-m", "sanskrit_ocr_spark.extract",
         "--maintain", "--root", root, "--master", "local[8]",
         "--purge-before", cutoff.isoformat()],
        capture_output=True, text=True)
    assert m2.returncode == 0, m2.stderr
    out2 = json.loads(m2.stdout)
    assert out2["purged_rows"] == 0
    assert out2["rows"] == 294 - want_purged

    # argparse guards, both metadata-only (no Spark)
    bad1 = subprocess.run(
        [sys.executable, "-m", "sanskrit_ocr_spark.extract",
         "--rows", "10", "--root", root, "--purge-before", "2025-01-01"],
        capture_output=True, text=True)
    assert bad1.returncode == 2
    bad2 = subprocess.run(
        [sys.executable, "-m", "sanskrit_ocr_spark.extract",
         "--maintain", "--root", root, "--purge-before", "not-a-ts"],
        capture_output=True, text=True)
    assert bad2.returncode == 2


def test_delete_where_on_partitioned_and_bucketed_layouts(
        spark, tmp_path):
    """delete_where rewrites through each physical layout: hive
    partition dirs are re-staged under the same spec (no
    __HIVE_DEFAULT_PARTITION__), bucket layouts re-bucket the
    survivors, and results match the flat table."""
    from pyspark.sql.types import StringType

    hive_schema = StructType([
        StructField("k", LongType(), False),
        StructField("day", StringType(), False),
        StructField("v", StringType(), False),
    ])

    def hbatch(lo, hi):
        return spark.createDataFrame(
            [(i, f"d{i % 3}", f"v-{i}") for i in range(lo, hi)],
            hive_schema)

    hive = IceliteTable(spark, str(tmp_path / "hive"), hive_schema,
                        partition_cols=["day"])
    hive.append(hbatch(0, 300))
    sid, deleted = hive.delete_where(F.col("k") < 100)
    assert deleted == 100
    got = {(r["k"], r["day"]) for r in hive.read().collect()}
    assert got == {(i, f"d{i % 3}") for i in range(100, 300)}
    # the rewrite landed in proper hive dirs
    import glob
    assert not glob.glob(str(tmp_path / "hive") +
                         "/**/__HIVE_DEFAULT_PARTITION__*",
                         recursive=True)
    assert hive.read().filter(F.col("day") == "d1").count() == 67

    bkt = IceliteTable(spark, str(tmp_path / "bkt"), SCHEMA,
                       bucket=("v", 4))
    bkt.append(_batch(spark, 0, 300))
    _, deleted_b = bkt.delete_where(F.col("k") < 100)
    assert deleted_b == 100
    assert sorted(r["k"] for r in bkt.read().collect()) == \
        list(range(100, 300))
    # survivors re-bucketed: pruned reads still partition the table
    per = [bkt.read(buckets=[b]).count() for b in range(4)]
    assert sum(per) == 200


def test_delete_where_lost_commit_race_cleans_staging(spark, tmp_path):
    """A writer that loses the optimistic-commit race must remove its
    staged rewrite and leave the winner's table untouched (the
    rewrite is re-derivable; retrying is the caller's call)."""
    import glob

    from sanskrit_ocr_spark.tables.icelite import ConcurrentCommitError

    root = str(tmp_path / "race")
    t1 = IceliteTable(spark, root, SCHEMA)
    t2 = IceliteTable(spark, root, SCHEMA)
    t1.append(_batch(spark, 0, 100))

    orig = t1._commit_manifest

    def race(sid, manifest):
        t2.append(_batch(spark, 100, 110))  # steals snapshot 2
        orig(sid, manifest)

    t1._commit_manifest = race
    with pytest.raises(ConcurrentCommitError):
        t1.delete_where(F.col("k") < 50)
    # exactly ONE commit-2 staging dir survives: the winner's
    assert len(glob.glob(f"{root}/data/commit-2-*")) == 1
    fresh = IceliteTable(spark, root, SCHEMA)
    assert fresh.snapshot_id() == 2
    assert fresh.read().count() == 110  # nothing deleted, nothing lost
