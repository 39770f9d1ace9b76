"""r6: declared write sort order (Iceberg ``write.sort-order`` analog) —
appends range-cluster their staged files on the declared columns, so
file-level min/max data skipping prunes INSIDE a commit (a hash-spread
batch writes files that each span the whole value range, making every
range probe scan all of them), and rows inside each file are sorted so
parquet row-group stats prune within files too."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA = StructType([
    StructField("k", LongType(), False),
    StructField("v", StringType(), False),
])


def _batch(spark, lo, hi, parts=8):
    # hash-spread across ``parts`` partitions: without a sort order each
    # staged file covers nearly the full [lo, hi) range
    return (spark.createDataFrame([(i, f"v-{i}") for i in range(lo, hi)],
                                  SCHEMA)
            .repartition(parts, "k"))


def test_sorted_commit_prunes_within_commit(spark, tmp_path):
    sorted_t = IceliteTable(spark, str(tmp_path / "sorted"), SCHEMA,
                            stat_cols=["k"], sort_cols=["k"])
    plain_t = IceliteTable(spark, str(tmp_path / "plain"), SCHEMA,
                           stat_cols=["k"])
    sorted_t.append(_batch(spark, 0, 800))
    plain_t.append(_batch(spark, 0, 800))
    assert len(sorted_t.committed_files()) == 8  # parallelism preserved
    assert len(plain_t.committed_files()) == 8

    want = {(i, f"v-{i}") for i in range(100, 151)}
    got_sorted = sorted_t.read(prune={"k": (100, 150)})
    got_plain = plain_t.read(prune={"k": (100, 150)})
    rows = lambda df: {(r["k"], r["v"]) for r in df
                       .filter(F.col("k").between(100, 150)).collect()}
    assert rows(got_sorted) == rows(got_plain) == want
    # range-clustered files: the 51-key probe touches ~1 of 8 files;
    # the hash-spread table cannot skip anything
    assert len(got_sorted.inputFiles()) <= 2
    assert len(got_plain.inputFiles()) == 8


def test_sort_order_spec_persists_across_handles(spark, tmp_path):
    root = str(tmp_path / "persist")
    IceliteTable(spark, root, SCHEMA, stat_cols=["k"],
                 sort_cols=["k"]).append(_batch(spark, 0, 400))
    # reopened flagless handle loads the persisted order and keeps
    # clustering new commits
    t2 = IceliteTable(spark, root, SCHEMA)
    assert t2.sort_cols == ["k"] and t2.stat_cols == ["k"]
    t2.append(_batch(spark, 400, 800))
    probe = t2.read(prune={"k": (500, 520)})
    assert probe.filter(F.col("k").between(500, 520)).count() == 21
    assert len(probe.inputFiles()) <= 2
    assert t2.read().count() == 800


def test_rows_sorted_inside_each_file(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "infile"), SCHEMA,
                     sort_cols=["k"])
    t.append(_batch(spark, 0, 500))
    for f in t.committed_files():
        ks = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks)


def test_sort_order_composes_with_bucket_layout(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "bsort"), SCHEMA,
                     bucket=("v", 4), sort_cols=["k"])
    t.merge_on_key(_batch(spark, 0, 300), "v")
    # hash write-distribution unchanged: one file per present bucket,
    # rows inside each bucket file sorted by k (bucket layouts track
    # whole commit DIRS in the manifest — glob the actual files)
    import glob
    import os
    files = [f for d in t.committed_files() for f in glob.glob(
        os.path.join(d, "**", "*.parquet"), recursive=True)]
    assert files and all("__bucket=" in f for f in files)
    for f in files:
        ks = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks)
    assert t.read().count() == 300


def test_sort_order_survives_merge_and_maintenance(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "life"), SCHEMA,
                     stat_cols=["k"], sort_cols=["k"])
    t.merge_on_key(_batch(spark, 0, 400), "v")
    t.merge_on_key(_batch(spark, 200, 600), "v")  # 200 overlap, 200 new
    assert t.read().count() == 600
    # MOR upsert stages clustered too (footer-derived counts are immune
    # to the range-sampling double pass)
    sid, updated = t.merge_upsert_mor(
        spark.createDataFrame([(10_000 + i, f"v-{i}") for i in range(5)],
                              SCHEMA), "v")
    assert updated == 5
    # equality-delete key files don't carry k: staged unsorted, no crash
    t.delete_keys(spark.createDataFrame([("v-599",)], "v string"), "v")
    assert t.read().count() == 599
    # compaction re-clusters on the sort order and keeps results
    t.compact(target_partitions=4)
    t.expire_snapshots(keep_last=1)
    assert t.read().count() == 599
    probe = t.read(prune={"k": (300, 310)})
    assert probe.filter(F.col("k").between(300, 310)).count() == 11
    assert len(probe.inputFiles()) < len(t.committed_files()) or \
        len(t.committed_files()) == 1
    for f in t.committed_files():
        ks = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks)


def test_run_extraction_sort_ts_end_to_end(spark, tmp_path):
    """CLI/job wiring: `--sort-ts` range-clusters extracted commits on
    warc_ts; table contents byte-match an unsorted root."""
    from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
    from sanskrit_ocr_spark.extract.job import (
        extracted_table, run_extraction,
    )

    def pages(lo, hi):
        return spark.createDataFrame(pages_pandas(lo, hi - lo),
                                     schema=PAGES_SCHEMA)

    plain, srt = str(tmp_path / "plain"), str(tmp_path / "srt")
    run_extraction(spark, pages(0, 200), srt, sort_ts=True)
    run_extraction(spark, pages(0, 200), plain)
    # flagless delta run loads the persisted order
    run_extraction(spark, pages(200, 300), srt)
    run_extraction(spark, pages(200, 300), plain)

    ts = extracted_table(spark, srt)
    assert ts.sort_cols == ["warc_ts"]
    for f in ts.committed_files():
        col = pq.read_table(f, columns=["warc_ts"])["warc_ts"].to_pylist()
        assert col == sorted(col)
    a = ts.read()
    b = extracted_table(spark, plain).read()
    assert a.columns == b.columns
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_replace_sort_order(spark, tmp_path):
    """r6: Iceberg replaceSortOrder — metadata-only set/clear of the
    write sort order; new commits cluster by the ACTIVE order, old
    files keep theirs, compaction re-clusters everything."""
    import os

    import pytest

    root = str(tmp_path / "rso")
    t = IceliteTable(spark, root, SCHEMA, stat_cols=["k"])
    t.append(_batch(spark, 0, 800))                 # unsorted commit 1
    sid = t.replace_sort_order(["k"])               # meta commit 2
    assert t.history()[0]["snapshot_id"] == sid
    t.append(_batch(spark, 800, 1600))              # sorted commit 3

    def span(f):
        col = pq.read_table(f, columns=["k"])["k"].to_pylist()
        return min(col), max(col)

    # post-order commit is range-clustered: each file covers a narrow
    # slice of [800, 1600), not the whole batch
    new_files = [f for f in t.committed_files() if "commit-3-" in f]
    assert new_files
    assert all(hi - lo < 400 for lo, hi in map(span, new_files))
    # the pre-order commit keeps its hash-spread files (metadata-only
    # change): every file still spans nearly the full [0, 800) range,
    # so range probes on it cannot skip anything
    old_files = [f for f in t.committed_files() if "commit-1-" in f]
    assert old_files
    assert all(lo < 100 and hi > 700 for lo, hi in map(span, old_files))

    # a fresh handle picks the order up from the persisted spec
    t2 = IceliteTable(spark, root, SCHEMA)
    assert t2.sort_cols == ["k"]

    # compact re-clusters EVERYTHING by the active order: the old
    # hash-spread rows land in narrow range slices too
    t.compact(target_partitions=4)
    assert all(hi - lo < 800 for lo, hi in map(span, t.committed_files()))
    assert t.read().count() == 1600

    # clear: later handles stop paying the range shuffle
    t.replace_sort_order([])
    assert not os.path.exists(
        os.path.join(root, "_icelite", "sort_cols.json"))
    t3 = IceliteTable(spark, root, SCHEMA)
    assert t3.sort_cols == []

    with pytest.raises(ValueError):
        t.replace_sort_order([])                 # already cleared
    with pytest.raises(ValueError):
        t.replace_sort_order(["nope"])           # not in schema
