"""r6 icelite metadata work: O(1) head-manifest bookkeeping lookup
(inherited extra_meta), metadata-only commits, equality-delete-only
commits, seal/kind classification, and the partition-spec creation
guard."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType, StructField, StructType, TimestampType,
)

SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("text", StringType(), False),
])


def _batch(spark, lo, hi, text, day=1):
    rows = [(f"https://ex.org/{i}",
             f"2025-07-0{day} 00:00:00", f"{text}-{i}")
            for i in range(lo, hi)]
    return spark.createDataFrame(rows, "url string, warc_ts string,"
                                 " text string") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _table(spark, tmp_path, name="t", **kw):
    from sanskrit_ocr_spark.tables.icelite import IceliteTable
    return IceliteTable(spark, str(tmp_path / name), SCHEMA, **kw)


def test_extra_meta_is_inherited_to_head_manifest(spark, tmp_path):
    """Every commit folds the parent's caller bookkeeping forward, so the
    HEAD manifest always carries the newest watermark — the O(1) lookup
    curate_table/export_wet_incremental now rely on (r5 VERDICT #7),
    even when foreign appends interleave."""
    t = _table(spark, tmp_path)
    t.merge_on_key(_batch(spark, 0, 10, "v1"), "url", order_col="warc_ts",
                   extra_meta={"extracted_watermark": 7})
    # three FOREIGN commits (no watermark of their own)
    t.append(_batch(spark, 10, 12, "x"))
    t.add_columns([StructField("lang", StringType(), True)])
    t.merge_upsert_mor(_batch(spark, 0, 2, "v2", day=2).withColumn(
        "lang", F.lit(None).cast("string")), "url", order_col="warc_ts")
    head = t._manifest(t.snapshot_id())
    assert head["extracted_watermark"] == 7
    # a newer watermark overrides the inherited one
    t.merge_on_key(_batch(spark, 20, 22, "v1").withColumn(
        "lang", F.lit(None).cast("string")), "url", order_col="warc_ts",
        extra_meta={"extracted_watermark": 9})
    assert t._manifest(t.snapshot_id())["extracted_watermark"] == 9
    # per-commit counters do NOT travel: the inherited keys are caller
    # bookkeeping only
    t.append(_batch(spark, 30, 31, "y").withColumn(
        "lang", F.lit(None).cast("string")))
    head = t._manifest(t.snapshot_id())
    assert head["extracted_watermark"] == 9
    assert "inserted" not in head


def test_commit_meta_advances_snapshot_without_data(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_on_key(_batch(spark, 0, 10, "v1"), "url", order_col="warc_ts")
    before_files = t.committed_files()
    sid = t.commit_meta({"wet_watermark": 3})
    assert sid == t.snapshot_id()
    assert t.committed_files() == before_files
    assert t.row_count() == 10
    assert t._manifest(sid)["wet_watermark"] == 3
    assert t.history()[0]["kind"] == "meta"
    # read is unaffected; time travel to the data commit still works
    assert t.read().count() == 10
    assert t.read(sid - 1).count() == 10


def test_delete_keys_is_mor_and_idempotent(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_on_key(_batch(spark, 0, 100, "v1"), "url", order_col="warc_ts")
    keys = spark.createDataFrame(
        [(f"https://ex.org/{i}",) for i in range(90, 120)], "url string")
    sid, deleted = t.delete_keys(keys, "url")
    assert deleted == 10  # 90..99 exist; 100..119 are no-ops
    out = t.read()
    assert out.count() == 90
    assert out.filter(F.col("url") == "https://ex.org/95").count() == 0
    assert t.row_count() == 90
    assert t.history()[0]["kind"] == "delete"
    # replaying the SAME retraction is a harmless no-op (at-least-once)
    sid2, deleted2 = t.delete_keys(keys, "url")
    assert deleted2 == 0 and t.read().count() == 90
    # a later insert of a deleted key survives (delete applies to OLDER
    # commits only) and compaction applies deletes physically
    t.merge_on_key(_batch(spark, 95, 96, "v3", day=3), "url",
                   order_col="warc_ts")
    assert t.read().filter(F.col("url") == "https://ex.org/95") \
        .head()["text"] == "v3-95"
    t.compact(target_partitions=2)
    assert t.read().count() == 91
    assert "LeftAnti" not in t.read()._jdf.queryExecution().optimizedPlan() \
        .toString()


def test_expire_seal_classifies_as_seal_not_upsert(spark, tmp_path):
    """r6 ADVICE: a seal that retained pending MOR deletes (or the sealed
    commit's own upsert marker) must report kind 'seal'."""
    t = _table(spark, tmp_path)
    t.merge_on_key(_batch(spark, 0, 50, "v1"), "url", order_col="warc_ts")
    t.merge_upsert_mor(_batch(spark, 0, 10, "v2", day=2), "url",
                       order_col="warc_ts")
    t.merge_upsert_mor(_batch(spark, 10, 20, "v2", day=3), "url",
                       order_col="warc_ts")
    t.expire_snapshots(keep_last=2)  # seals the first MOR commit
    hist = t.history()
    kinds = {h["snapshot_id"]: h["kind"] for h in hist}
    assert kinds[2] == "seal"
    assert kinds[3] == "upsert"
    # the sealed read still applies the retained deletes
    assert t.read().select("url").distinct().count() == t.read().count() == 50


def test_partition_spec_not_minted_on_existing_table(spark, tmp_path):
    """r6 ADVICE: opening a pre-existing data-bearing UNPARTITIONED table
    with a mistakenly-partitioned handle must not persist a wrong
    immutable spec."""
    from sanskrit_ocr_spark.tables.icelite import IceliteTable

    root = str(tmp_path / "plain")
    t = IceliteTable(spark, root, SCHEMA)  # unpartitioned, no spec file
    t.merge_on_key(_batch(spark, 0, 10, "v1"), "url", order_col="warc_ts")
    spec = os.path.join(root, "_icelite", "partition_spec.json")
    assert not os.path.exists(spec)
    # wrong handle on a data-bearing table: no spec is written, and the
    # layout probe still reports the true (unpartitioned) layout
    IceliteTable(spark, root, SCHEMA, partition_cols=["warc_day"])
    assert not os.path.exists(spec)
    assert IceliteTable.stored_partition_cols(root) == []
    # a genuinely-new partitioned table still persists its spec
    root2 = str(tmp_path / "part")
    IceliteTable(spark, root2, StructType(
        list(SCHEMA.fields) + [StructField("day", StringType(), True)]),
        partition_cols=["day"])
    with open(os.path.join(root2, "_icelite", "partition_spec.json")) as f:
        assert json.load(f)["partition_cols"] == ["day"]
