"""r6 (r5 VERDICT #3): file-level min/max column stats + data skipping —
commit manifests record per-file bounds for declared stat columns
(parquet footers, zero Spark jobs), and `read(prune=...)` drops files
whose bounds cannot match a range predicate before Spark plans the scan.
Results must be identical to the unpruned read + filter; pruning must
survive schema evolution, compaction (range-clustered rewrite), and the
expiry seal."""

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("text", StringType(), False),
])


def _day_batch(spark, day, n=20):
    rows = [(f"https://ex.org/d{day}/{i}",
             datetime(2025, 7, day, i % 24, 0, 0), f"t-{day}-{i}")
            for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


def _table(spark, tmp_path, name, **kw):
    return IceliteTable(spark, str(tmp_path / name), SCHEMA,
                        stat_cols=["warc_ts"], **kw)


def _n_scanned(df):
    return len(df.inputFiles())


def test_ts_range_read_prunes_files_with_identical_results(
        spark, tmp_path):
    t = _table(spark, tmp_path, "skip")
    for day in range(1, 13):  # 12 commits, one per day
        t.append(_day_batch(spark, day))

    lo, hi = datetime(2025, 7, 5), datetime(2025, 7, 6, 23, 59, 59)
    full = t.read()
    pruned = t.read(prune={"warc_ts": (lo, hi)})
    # 2 of 12 commits match → scan shrinks accordingly
    assert 0 < _n_scanned(pruned) <= _n_scanned(full) // 6
    # identical results once the real predicate is applied
    cond = (F.col("warc_ts") >= F.lit(lo)) & (F.col("warc_ts") <= F.lit(hi))
    want = sorted(r["url"] for r in full.filter(cond).collect())
    got = sorted(r["url"] for r in pruned.filter(cond).collect())
    assert got == want and len(got) == 40
    # the pruned read is a SUPERSET before filtering, never a subset
    assert pruned.count() >= 40
    # half-open / unbounded predicates work too
    late = t.read(prune={"warc_ts": (datetime(2025, 7, 11), None)})
    assert _n_scanned(late) <= _n_scanned(full) // 3
    assert late.filter(F.col("warc_ts") >= "2025-07-11").count() == 40


def test_skipping_survives_schema_evolution_and_compaction(
        spark, tmp_path):
    t = _table(spark, tmp_path, "skip2")
    for day in range(1, 7):
        t.append(_day_batch(spark, day))
    t.add_columns([StructField("lang", StringType(), True)])
    for day in range(7, 13):
        t.append(_day_batch(spark, day).withColumn(
            "lang", F.lit("sa")))

    lo, hi = datetime(2025, 7, 3), datetime(2025, 7, 3, 23, 59, 59)
    cond = (F.col("warc_ts") >= F.lit(lo)) & (F.col("warc_ts") <= F.lit(hi))
    full_n = _n_scanned(t.read())
    pruned = t.read(prune={"warc_ts": (lo, hi)})
    assert _n_scanned(pruned) < full_n
    assert pruned.filter(cond).count() == 20

    # compaction range-clusters on the stat cols, so bounds stay narrow
    # and the pruned scan still reads a strict subset of the files
    t.compact(target_partitions=6)
    full_n = _n_scanned(t.read())
    pruned = t.read(prune={"warc_ts": (lo, hi)})
    assert _n_scanned(pruned) < full_n
    assert sorted(r["url"] for r in pruned.filter(cond).collect()) == \
        sorted(f"https://ex.org/d3/{i}" for i in range(20))

    # the expiry seal carries the bounds of retained files
    t.append(_day_batch(spark, 13).withColumn("lang", F.lit("sa")))
    t.expire_snapshots(keep_last=2)
    pruned = t.read(prune={"warc_ts": (datetime(2025, 7, 13), None)})
    assert _n_scanned(pruned) < _n_scanned(t.read())
    assert pruned.filter(F.col("warc_ts") >= "2025-07-13").count() == 20


def test_skipping_composes_with_mor_deletes_and_reopened_handles(
        spark, tmp_path):
    t = _table(spark, tmp_path, "skip3")
    for day in range(1, 7):
        t.merge_on_key(_day_batch(spark, day), "url", order_col="warc_ts")
    # recrawl day 2's urls with day-8 timestamps (MOR upsert)
    recrawl = _day_batch(spark, 2).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 6 DAYS")) \
        .withColumn("text", F.concat(F.lit("new-"), "text"))
    t.merge_upsert_mor(recrawl, "url", order_col="warc_ts")

    lo, hi = datetime(2025, 7, 8), None
    pruned = t.read(prune={"warc_ts": (lo, hi)})
    assert _n_scanned(pruned) < _n_scanned(t.read())
    got = pruned.filter(F.col("warc_ts") >= "2025-07-08").collect()
    assert len(got) == 20 and all(r["text"].startswith("new-") for r in got)

    # a handle opened WITHOUT stat_cols loads the persisted declaration,
    # so maintenance keeps recording bounds (stat_cols.json)
    t2 = IceliteTable(spark, str(tmp_path / "skip3"), SCHEMA)
    assert t2.stat_cols == ["warc_ts"]
    t2.compact(target_partitions=4)
    pruned = t2.read(prune={"warc_ts": (lo, hi)})
    assert _n_scanned(pruned) < _n_scanned(t2.read())
    assert pruned.filter(F.col("warc_ts") >= "2025-07-08").count() == 20


def test_extraction_table_records_warc_ts_bounds(spark, tmp_path):
    """The production extracted table declares warc_ts as a stat column:
    every run_extraction commit manifest carries file bounds."""
    from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
    from sanskrit_ocr_spark.extract.job import (
        extracted_table,
        run_extraction,
    )

    root = str(tmp_path / "xroot")
    pages = spark.createDataFrame(pages_pandas(0, 60), schema=PAGES_SCHEMA)
    run_extraction(spark, pages, root)
    ext = extracted_table(spark, root)
    m = ext._manifest(ext.snapshot_id())
    stats = m.get("file_stats", {})
    assert stats and all("warc_ts" in v for v in stats.values())
    # pruning with the recorded bounds returns the whole table; a
    # disjoint range prunes everything
    mn = min(v["warc_ts"][0] for v in stats.values())
    assert ext.read(prune={"warc_ts": (None, datetime(1990, 1, 1))}) \
        .count() == 0
    assert ext.read(prune={"warc_ts": (None, None)}).count() == \
        ext.read().count()
    assert isinstance(mn, str)


def test_prune_composes_with_bucket_layout(spark, tmp_path):
    """r6 composition: stat-based file skipping and the bucket(N, url)
    layout stack — a read restricted on BOTH axes scans only files that
    survive both prunes, with results identical to filter-after-read."""
    t = _table(spark, tmp_path, "pb", bucket=("url", 4))
    for day in range(1, 9):
        t.merge_on_key(_day_batch(spark, day), "url", order_col="warc_ts")

    lo, hi = datetime(2025, 7, 3), datetime(2025, 7, 4, 23, 59, 59)
    full = t.read()
    both = t.read(prune={"warc_ts": (lo, hi)}, buckets=[1])
    expect = full.filter(
        (F.col("warc_ts") >= lo) & (F.col("warc_ts") <= hi)
        & (F.pmod(F.xxhash64("url"), F.lit(4)) == 1))
    got_rows = {(r["url"], r["text"]) for r in
                both.filter((F.col("warc_ts") >= lo)
                            & (F.col("warc_ts") <= hi)).collect()}
    exp_rows = {(r["url"], r["text"]) for r in expect.collect()}
    assert got_rows == exp_rows and got_rows
    # both prunes bit: fewer files than either axis alone
    n_both = len(both.inputFiles())
    assert n_both < len(t.read(prune={"warc_ts": (lo, hi)}).inputFiles())
    assert n_both < len(t.read(buckets=[1]).inputFiles())
    assert all("__bucket=1/" in f for f in both.inputFiles())
