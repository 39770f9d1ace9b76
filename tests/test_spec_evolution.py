"""r6: partition-spec evolution — at 10^12 rows a re-layout is
O(table), so the spec moves METADATA-ONLY: old files keep their layout,
new commits stage under the new one, reads union the mixed groups
transparently (physical-probe attribution), and compaction migrates old
data to the active spec. Iceberg's partition-spec-evolution contract."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA = StructType([
    StructField("k", LongType(), False),
    StructField("day", StringType(), False),
    StructField("v", StringType(), False),
])


def _rows(lo, hi, tag):
    return [(i, f"d{i % 3}", f"{tag}-{i}") for i in range(lo, hi)]


def _append(spark, t, lo, hi, tag):
    t.append(spark.createDataFrame(_rows(lo, hi, tag), SCHEMA))


def _data_entries(root):
    return sorted(os.listdir(os.path.join(root, "data")))


def test_evolve_unpartitioned_to_partitioned(spark, tmp_path):
    root = str(tmp_path / "up")
    t = IceliteTable(spark, root, SCHEMA)
    _append(spark, t, 0, 30, "a")        # flat commits (sids 1, 2)
    _append(spark, t, 30, 60, "b")
    pre = t.snapshot_id()

    sid = t.evolve_partition_spec(["day"])
    assert t.history()[0]["kind"] == "spec"
    _append(spark, t, 60, 90, "c")       # hive commits
    _append(spark, t, 90, 120, "d")

    # mixed layout on disk: old plain commit dirs + new __commit=/day=
    entries = _data_entries(root)
    assert any(e.startswith("commit-") for e in entries)
    new_dirs = [e for e in entries if e.startswith("__commit=")]
    assert len(new_dirs) == 2
    for d in new_dirs:
        assert any(s.startswith("day=") for s in
                   os.listdir(os.path.join(root, "data", d)))

    # reads union the mixed groups with one logical schema
    got = t.read()
    assert got.count() == 120
    assert {r["v"] for r in got.filter(F.col("k") < 30).collect()} == \
        {f"a-{i}" for i in range(30)}
    assert got.filter(F.col("day") == "d0").count() == 40
    # time travel to the pre-evolution snapshot still reads flat-only
    assert t.read(snapshot_id=pre).count() == 60
    assert t.read(snapshot_id=sid).count() == 60  # meta-only commit

    # a reopened handle with NO declared cols adopts the active spec
    t2 = IceliteTable(spark, root, SCHEMA)
    assert t2.partition_cols == ["day"]
    _append(spark, t2, 120, 130, "e")
    assert _data_entries(root)[-1].startswith("__commit=") or \
        any(e.startswith("__commit=") for e in _data_entries(root))
    assert t2.read().count() == 130

    # a handle declaring the STALE spec fails loudly
    with pytest.raises(ValueError):
        IceliteTable(spark, str(tmp_path / "up"), SCHEMA,
                     partition_cols=["v"])


def test_evolve_partitioned_to_unpartitioned(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "down"), SCHEMA,
                     partition_cols=["day"])
    _append(spark, t, 0, 40, "a")
    t.evolve_partition_spec([])
    _append(spark, t, 40, 80, "b")
    assert t.read().count() == 80
    assert t.read().filter(F.col("day") == "d1").count() == 80 // 3 + \
        (1 if 1 < 80 % 3 + 1 else 0)  # 27 rows: k%3==1 in [0,80)
    # spot value correctness across both layouts
    vals = {r["k"]: r["v"] for r in t.read().collect()}
    assert vals[0] == "a-0" and vals[79] == "b-79"


def test_evolve_validation(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "val"), SCHEMA)
    _append(spark, t, 0, 5, "a")
    with pytest.raises(ValueError):
        t.evolve_partition_spec(["nope"])        # not in schema
    with pytest.raises(ValueError):
        t.evolve_partition_spec([])              # already active
    with pytest.raises(ValueError):
        t.evolve_partition_spec(["day", "day"])  # duplicate
    with pytest.raises(ValueError):
        t.evolve_partition_spec(["__bucket"])    # reserved
    t.evolve_partition_spec(["day"])
    with pytest.raises(ValueError):
        t.evolve_partition_spec(["day"])         # already active


def test_compact_migrates_to_active_spec(spark, tmp_path):
    root = str(tmp_path / "mig")
    t = IceliteTable(spark, root, SCHEMA)
    _append(spark, t, 0, 50, "a")
    t.evolve_partition_spec(["day"])
    _append(spark, t, 50, 80, "b")
    before = {r["k"]: r["v"] for r in t.read().collect()}
    t.compact(target_partitions=2)
    # the rewrite staged EVERYTHING under the active spec: once the
    # pre-compact snapshots expire, no flat commit dir is referenced
    # anymore and remove_orphans reclaims them
    t.expire_snapshots(keep_last=1)
    t.remove_orphans()
    live = [e for e in _data_entries(root) if e.startswith("commit-")]
    assert live == []
    after = {r["k"]: r["v"] for r in t.read().collect()}
    assert after == before
    # partition pruning now works on ALL data: a day filter reaches the
    # scan as a PartitionFilter (Catalyst drops the other hive dirs at
    # planning time)
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t.read().filter(F.col("day") == "d2").explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "day" in plan


def test_evolution_survives_mor_deletes_and_schema_evolution(
        spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "mix"), SCHEMA)
    _append(spark, t, 0, 30, "a")
    t.evolve_partition_spec(["day"])
    _append(spark, t, 30, 60, "b")
    # MOR upsert replaces rows living in BOTH layouts (k 10 flat, k 40
    # hive)
    batch = spark.createDataFrame(
        [(10, "d1", "new-10"), (40, "d1", "new-40")], SCHEMA)
    t.merge_upsert_mor(batch, "k")
    vals = {r["k"]: r["v"] for r in t.read().collect()}
    assert vals[10] == "new-10" and vals[40] == "new-40"
    assert len(vals) == 60
    # schema evolution composes: add a column, keep reading mixed groups
    t.add_columns([StructField("extra", StringType(), True)])
    got = t.read()
    assert got.count() == 60
    assert got.filter(F.col("extra").isNull()).count() == 60


def test_expiry_seal_preserves_mixed_layouts(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "seal"), SCHEMA)
    _append(spark, t, 0, 20, "a")        # flat
    t.evolve_partition_spec(["day"])
    _append(spark, t, 20, 40, "b")       # hive
    _append(spark, t, 40, 60, "c")       # hive
    before = {r["k"]: r["v"] for r in t.read().collect()}
    t.expire_snapshots(keep_last=2)      # seals a mixed file list
    after = {r["k"]: r["v"] for r in t.read().collect()}
    assert after == before
    # and the sealed table keeps composing with new commits
    _append(spark, t, 60, 70, "d")
    assert t.read().count() == 70


def test_evolve_extracted_layout_end_to_end(spark, tmp_path):
    """The CLI migration story: flat extracted table → metadata-only
    evolution → partitioned delta ingest → compaction backfills and
    migrates the pre-evolution rows into proper hive dirs."""
    from sanskrit_ocr_spark.datagen.pages import pages_df
    from sanskrit_ocr_spark.extract.job import (
        backfill_layout,
        evolve_extracted_layout,
        extracted_table,
        run_extraction,
    )

    root = str(tmp_path / "ev")
    run_extraction(spark, pages_df(spark, 200), root)      # flat commits
    res = evolve_extracted_layout(spark, root)
    assert res["partition_spec"] == ["warc_day", "bucket"]
    assert sorted(res["columns_added"]) == ["bucket", "warc_day"]
    with pytest.raises(ValueError):
        extracted_table(spark, root)       # flat handle now fails loudly
    with pytest.raises(ValueError):
        evolve_extracted_layout(spark, root)      # already partitioned

    r = run_extraction(spark, pages_df(spark, 300), root,
                       partitioned=True)
    assert r["inserted"] == 98
    ext = extracted_table(spark, root, partitioned=True)
    t = ext.read()
    assert t.count() == 294
    # pre-evolution rows read NULL layout columns; the delta carries them
    assert t.filter(F.col("warc_day").isNull()).count() == 196
    assert t.filter(F.col("warc_day").isNotNull()).count() == 98

    # compaction with the backfill transform migrates + fills everything
    ext.compact(target_partitions=4, transform=backfill_layout)
    t2 = ext.read()
    assert t2.count() == 294
    assert t2.filter(F.col("warc_day").isNull()).count() == 0
    assert t2.select("url").distinct().count() == 294
    # backfilled values equal the derivation for EVERY row
    bad = t2.filter(
        (F.col("warc_day") != F.to_date("warc_ts"))
        | (F.col("bucket") != F.pmod(F.col("part_hash"), F.lit(64))))
    assert bad.count() == 0
    # no __HIVE_DEFAULT_PARTITION__ dirs were written
    import glob
    assert not glob.glob(
        f"{root}/extracted/data/**/__HIVE_DEFAULT_PARTITION__",
        recursive=True)
