"""r6: metadata inspection tables — Iceberg's ``files`` / ``partitions``
/ ``snapshots`` / ``refs`` metadata-table analogs on IceliteTable, plus
the no-Spark CLI ``--inspect`` surface. Everything here is manifest +
parquet-footer metadata: O(live files), independent of row count —
what makes "how big is each partition / which files does commit 3 own /
what deletes are pending" answerable at 10^12 rows without a scan.
"""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA = StructType([
    StructField("k", LongType(), False),
    StructField("day", StringType(), False),
    StructField("v", StringType(), False),
])


def _batch(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"d{i % 3}", f"v-{i}") for i in range(lo, hi)], SCHEMA)


def test_inspect_files_provenance_counts_and_bounds(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "t"), SCHEMA, stat_cols=["k"])
    t.append(_batch(spark, 0, 100))
    t.append(_batch(spark, 100, 250))

    files = t.inspect_files().collect()
    assert {r["content"] for r in files} == {"data"}
    # exact footer row counts sum to the table total, attributed to the
    # right commits
    by_commit = {}
    for r in files:
        by_commit[r["commit_sid"]] = (
            by_commit.get(r["commit_sid"], 0) + r["record_count"])
    assert by_commit == {1: 100, 2: 150}
    assert all(r["file_size_bytes"] > 0 for r in files)
    # per-file stat bounds are present for the declared stat column and
    # bracket the data
    ks = [(int(r["lower_bounds"]["k"]), int(r["upper_bounds"]["k"]))
          for r in files]
    assert min(lo for lo, _ in ks) == 0
    assert max(hi for _, hi in ks) == 249
    # time travel: the files table at snapshot 1 shows only commit 1
    old = t.inspect_files(snapshot_id=1).collect()
    assert {r["commit_sid"] for r in old} == {1}
    assert sum(r["record_count"] for r in old) == 100


def test_inspect_files_shows_pending_equality_deletes(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "mor"), SCHEMA)
    t.append(_batch(spark, 0, 50))
    t.merge_upsert_mor(_batch(spark, 0, 10), "k")

    files = t.inspect_files().collect()
    dels = [r for r in files if r["content"] != "data"]
    assert len(dels) >= 1
    assert all(r["content"] == "equality_deletes(k)" for r in dels)
    assert sum(r["record_count"] for r in dels) == 10
    # compaction applies the deletes: the delete files disappear
    t.compact(target_partitions=2)
    after = t.inspect_files().collect()
    assert {r["content"] for r in after} == {"data"}
    assert sum(r["record_count"] for r in after) == 50


def test_inspect_partitions_matches_real_read(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "p"), SCHEMA,
                     partition_cols=["day"])
    t.append(_batch(spark, 0, 90))
    t.append(_batch(spark, 90, 120))

    parts = {r["partition"]: r for r in t.inspect_partitions().collect()}
    truth = {f"day={r['day']}": r["n"] for r in
             t.read().groupBy("day").agg(
                 F.count(F.lit(1)).alias("n")).collect()}
    assert {p: r["record_count"] for p, r in parts.items()} == truth
    assert all(r["n_files"] >= 1 and r["file_size_bytes"] > 0
               for r in parts.values())


def test_inspect_snapshots_and_refs(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "s"), SCHEMA)
    t.append(_batch(spark, 0, 10))
    t.append(_batch(spark, 10, 20))
    t.tag("v1", 1)
    t.set_branch("published", 2)

    snaps = t.inspect_snapshots().collect()
    assert [r["snapshot_id"] for r in snaps] == [2, 1]
    assert all(r["kind"] == "append" for r in snaps)
    assert int(snaps[0]["summary"]["committed_at_ms"]) > 0

    refs = {(r["name"], r["kind"]): r["snapshot_id"]
            for r in t.inspect_refs().collect()}
    assert refs == {("v1", "tag"): 1, ("published", "branch"): 2}

    # empty table: all inspection surfaces return cleanly
    empty = IceliteTable(spark, str(tmp_path / "e"), SCHEMA)
    assert empty.inspect_files().count() == 0
    assert empty.inspect_snapshots().count() == 0
    assert empty.inspect_refs().count() == 0


@pytest.fixture(scope="module")
def cli_root(tmp_path_factory):
    """One 100-row extraction root shared by every CLI probe below."""
    root = str(tmp_path_factory.mktemp("inspect_cli") / "cli")
    run = subprocess.run(
        [sys.executable, "-m", "sanskrit_ocr_spark.extract",
         "--rows", "100", "--root", root, "--master", "local[4]"],
        capture_output=True, text=True)
    assert run.returncode == 0, run.stderr
    return root


@pytest.mark.parametrize("kind,check", [
    ("files", lambda b: sum(r["record_count"] for r in b) == 98),
    ("partitions", lambda b: b[0]["record_count"] == 98),
    ("snapshots", lambda b: b[0]["kind"] == "append"),
    ("refs", lambda b: b == []),
])
def test_cli_inspect_no_spark(cli_root, tmp_path, kind, check):
    out = subprocess.run(
        [sys.executable, "-m", "sanskrit_ocr_spark.extract",
         "--inspect", kind, "--root", cli_root],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    payload = json.loads(out.stdout)
    assert payload["snapshot_id"] == 1
    assert check(payload[kind])
    # metadata-only path must not have spun up a JVM
    assert "SparkContext" not in out.stderr

    missing = subprocess.run(
        [sys.executable, "-m", "sanskrit_ocr_spark.extract",
         "--inspect", kind, "--root", str(tmp_path / "nope")],
        capture_output=True, text=True)
    assert missing.returncode == 2
    assert "no icelite table" in missing.stderr


def test_history_reports_upsert_and_delete_counts(spark, tmp_path):
    """r6: MOR upserts record updated_rows/inserted and equality
    deletes record deleted in their manifests, so history() — and the
    snapshots metadata table's summary — answer "what did that commit
    do" without reading any data."""
    t = IceliteTable(spark, str(tmp_path / "hc"), SCHEMA)
    t.append(_batch(spark, 0, 50))
    t.merge_upsert_mor(_batch(spark, 0, 10), "k")
    t.delete_keys(
        spark.createDataFrame([(k,) for k in range(5)], "k long"), "k")

    by_sid = {h["snapshot_id"]: h for h in t.history()}
    assert by_sid[2]["kind"] == "upsert"
    assert by_sid[2]["updated_rows"] == 10
    assert by_sid[2]["inserted"] == 10
    assert by_sid[3]["kind"] == "delete"
    assert by_sid[3]["deleted"] == 5
    snaps = {r["snapshot_id"]: r for r in t.inspect_snapshots().collect()}
    assert snaps[2]["summary"]["updated_rows"] == "10"
    assert snaps[3]["summary"]["deleted"] == "5"


def test_cli_inspect_corpus_table(cli_root, tmp_path):
    """--inspect --curate-table points the inspection at the curation
    corpus root instead of ROOT/extracted."""
    import subprocess
    import sys

    corpus = str(tmp_path / "corpus")
    run = subprocess.run(
        [sys.executable, "-m", "sanskrit_ocr_spark.extract",
         "--rows", "100", "--root", cli_root, "--master", "local[4]",
         "--curate-table", corpus],
        capture_output=True, text=True)
    assert run.returncode == 0, run.stderr
    out = subprocess.run(
        [sys.executable, "-m", "sanskrit_ocr_spark.extract",
         "--inspect", "files", "--root", cli_root,
         "--curate-table", corpus],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    payload = json.loads(out.stdout)
    # 100 rows -> 79 curated docs (the x-table fixture arithmetic)
    assert sum(r["record_count"] for r in payload["files"]) == \
        json.loads(run.stdout)["corpus_incremental"]["corpus_total"]
