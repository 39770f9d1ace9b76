"""r6: row-level changelog (Iceberg ``create_changelog_view`` / Delta
CDF analog). The exactness contract under test: for any commit range,

    alive(since) + inserts(range) - deletes(range) == alive(to)

as multisets — which is what lets an incremental downstream consumer
(an aggregate, a mirror table) stay exact under merge-on-read
re-crawls, where ``read_changes``'s net-additions view cannot retract
pre-range state."""

import pytest
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA = StructType([
    StructField("k", LongType(), False),
    StructField("v", StringType(), False),
])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df, cols=("k", "v")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _events(df):
    return sorted(tuple(r[c] for c in
                        ("k", "v", "_change_type", "_commit_sid"))
                  for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    """Four commits: append, recrawl-upsert, append, recrawl-upsert —
    k=0 lives three versions, k=1 two."""
    t = IceliteTable(spark, str(tmp_path / "cdc"), SCHEMA)
    t.append(_df(spark, [(0, "a0"), (1, "b0"), (2, "c0")]))      # 1
    t.merge_upsert_mor(_df(spark, [(0, "a1"), (1, "b1")]), "k")  # 2
    t.append(_df(spark, [(3, "d0")]))                            # 3
    t.merge_upsert_mor(_df(spark, [(0, "a2")]), "k")             # 4
    return t


def test_full_range_events(spark, table):
    got = _events(table.read_changelog(0))
    assert got == sorted([
        (0, "a0", "insert", 1), (1, "b0", "insert", 1),
        (2, "c0", "insert", 1),
        (0, "a0", "delete", 2), (1, "b0", "delete", 2),
        (0, "a1", "insert", 2), (1, "b1", "insert", 2),
        (3, "d0", "insert", 3),
        (0, "a1", "delete", 4), (0, "a2", "insert", 4),
    ])


def test_partial_range_skips_pre_range_deaths(spark, table):
    # (2, 4]: a0/b0 died at 2 (outside) — no events for them; a1's
    # death IS in range and carries the full pre-image
    got = _events(table.read_changelog(2, 4))
    assert got == sorted([
        (3, "d0", "insert", 3),
        (0, "a1", "delete", 4), (0, "a2", "insert", 4),
    ])
    # (3, 4]: just the last recrawl
    assert _events(table.read_changelog(3)) == sorted([
        (0, "a1", "delete", 4), (0, "a2", "insert", 4)])


def test_fold_reproduces_every_snapshot(spark, table):
    # the pinned contract, checked across ALL (since, to) pairs
    for since in range(0, 5):
        for to in range(since, 5):
            log = table.read_changelog(since, to).collect()
            ins = sorted((r["k"], r["v"]) for r in log
                         if r["_change_type"] == "insert")
            dels = [(r["k"], r["v"]) for r in log
                    if r["_change_type"] == "delete"]
            alive = _rows(table.read(since)) if since else []
            folded = list(alive) + ins
            for d in dels:
                folded.remove(d)
            assert sorted(folded) == _rows(table.read(to)), (since, to)


def test_empty_range_and_schema(spark, table):
    log = table.read_changelog(4, 4)
    assert log.columns == ["k", "v", "_change_type", "_commit_sid"]
    assert log.count() == 0


def test_compaction_breaks_provenance(spark, table):
    table.compact(target_partitions=2)  # snapshot 5
    with pytest.raises(ValueError):
        table.read_changelog(1)
    # ranges entirely above the compaction still work
    table.merge_upsert_mor(_df(spark, [(2, "c1")]), "k")  # 6
    assert _events(table.read_changelog(5)) == sorted([
        (2, "c0", "delete", 6), (2, "c1", "insert", 6)])


def test_multiple_deletes_same_key_single_death(spark, tmp_path):
    # three recrawls of one url: each version dies exactly once, at
    # the EARLIEST delete newer than its insert
    t = IceliteTable(spark, str(tmp_path / "multi"), SCHEMA)
    t.append(_df(spark, [(7, "v0")]))                      # 1
    t.merge_upsert_mor(_df(spark, [(7, "v1")]), "k")       # 2
    t.merge_upsert_mor(_df(spark, [(7, "v2")]), "k")       # 3
    assert _events(t.read_changelog(0)) == sorted([
        (7, "v0", "insert", 1), (7, "v0", "delete", 2),
        (7, "v1", "insert", 2), (7, "v1", "delete", 3),
        (7, "v2", "insert", 3),
    ])


def test_changelog_plan_broadcasts_schedule_no_window(spark, table):
    """Plan pin (100x lens): the delete-fate resolution is ONE
    broadcast join against the per-key schedule — no sort-merge join,
    no window, no per-delete-commit join stack; and Catalyst
    constant-folds pre-range groups out of an inserts-only range."""
    p = (table.read_changelog(0)
         ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Window" not in p
    # one join per delete KEY COLUMN (here: one), not per delete commit
    assert p.count("BroadcastHashJoin") == 1

    # inserts-only range (above the last delete at 4): the pre-range
    # file groups fold away — the scan reads no commit-1/2 files
    table.append(_df(spark, [(9, "z0")]))                        # 5
    files = table.read_changelog(4).inputFiles()
    assert files
    assert all("commit-5-" in f or "commit-3-" in f or "commit-4-" in f
               for f in files)
    assert not any("commit-1-" in f or "commit-2-" in f for f in files)
