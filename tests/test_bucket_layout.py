"""r6 (r5 VERDICT #5): static key-bucket file layout — commits stage
under a synthetic ``__bucket=pmod(xxhash64(key), N)`` hive level, and
merge_on_key prunes its committed-side anti-join scan to the batch's
buckets at planning time (the storage-level complement of the dynamic
``prefilter_buckets`` row filter)."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType, StructField, StructType, TimestampType,
)

from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("text", StringType(), False),
])

N_BUCKETS = 8


def _batch(spark, lo, hi, tag="v1", day=1):
    rows = [(f"https://ex.org/{i}",
             f"2025-07-0{day} 00:00:00", f"{tag}-{i}")
            for i in range(lo, hi)]
    return spark.createDataFrame(rows, "url string, warc_ts string,"
                                 " text string") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _table(spark, tmp_path, name="b"):
    return IceliteTable(spark, str(tmp_path / name), SCHEMA,
                        bucket=("url", N_BUCKETS))


def test_bucket_layout_roundtrip_and_pruned_read(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_on_key(_batch(spark, 0, 200), "url", order_col="warc_ts")
    out = t.read()
    # the synthetic bucket level never leaks into the schema
    assert out.columns == ["url", "warc_ts", "text"]
    assert out.count() == 200
    # a bucket-restricted read returns exactly the matching-hash rows
    # and plans a scan over ONLY those buckets' directories
    want_buckets = [0, 3]
    got = t.read(buckets=want_buckets)
    expect = out.filter(
        F.pmod(F.xxhash64("url"), F.lit(N_BUCKETS)).isin(want_buckets))
    assert got.count() == expect.count() > 0
    assert {r["url"] for r in got.collect()} == \
        {r["url"] for r in expect.collect()}
    files = got.inputFiles()
    assert files and all(
        any(f"__bucket={b}/" in f for b in want_buckets) for f in files)
    assert len(files) < len(out.inputFiles())


def test_merge_prunes_committed_scan_to_batch_buckets(
        spark, tmp_path, monkeypatch):
    t = _table(spark, tmp_path)
    t.merge_on_key(_batch(spark, 0, 200), "url", order_col="warc_ts")
    t.merge_on_key(_batch(spark, 200, 400), "url", order_col="warc_ts")

    seen_buckets = []
    scanned_files = []
    orig_read = IceliteTable.read

    def spy(self, snapshot_id=None, prune=None, buckets=None):
        df = orig_read(self, snapshot_id, prune, buckets)
        if buckets is not None:
            seen_buckets.append(sorted(buckets))
            scanned_files.extend(df.inputFiles())
        return df

    monkeypatch.setattr(IceliteTable, "read", spy)
    # small batch: 5 urls overlap (395..399), 5 new (400..405)
    sid, inserted = t.merge_on_key(_batch(spark, 395, 405, tag="v2"),
                                   "url", order_col="warc_ts")
    monkeypatch.undo()
    assert inserted == 5
    # the committed side was read bucket-pruned...
    assert len(seen_buckets) == 1 and 0 < len(seen_buckets[0]) <= N_BUCKETS
    allowed = {f"__bucket={b}/" for b in seen_buckets[0]}
    assert scanned_files and all(
        any(a in f for a in allowed) for f in scanned_files)
    # ...and the merge stayed exact: overlapping urls kept their first
    # committed text, fresh urls inserted
    out = t.read()
    assert out.count() == 405
    assert out.filter(F.col("url") == "https://ex.org/398") \
        .head()["text"] == "v1-398"
    assert out.filter(F.col("url") == "https://ex.org/402") \
        .head()["text"] == "v2-402"


def test_bucket_layout_survives_maintenance_and_mor(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_on_key(_batch(spark, 0, 100), "url", order_col="warc_ts")
    # MOR recrawl stages bucketed too; bucket-restricted reads compose
    # with the equality-delete anti-join
    t.merge_upsert_mor(_batch(spark, 0, 20, tag="v2", day=2), "url",
                       order_col="warc_ts")
    got = t.read(buckets=[1])
    expect_urls = {r["url"] for r in t.read().filter(
        F.pmod(F.xxhash64("url"), F.lit(N_BUCKETS)) == 1).collect()}
    assert {r["url"] for r in got.collect()} == expect_urls
    assert got.count() == len(expect_urls)  # deletes applied: no dupes

    # a reopened handle (no bucket arg) loads the persisted spec, and
    # compaction rewrites UNDER the same bucket layout
    t2 = IceliteTable(spark, str(tmp_path / "b"), SCHEMA)
    assert t2.bucket == ("url", N_BUCKETS)
    t2.compact(target_partitions=2)
    t2.expire_snapshots(keep_last=1)
    pruned = t2.read(buckets=[2, 5])
    assert pruned.inputFiles() and all(
        "__bucket=2/" in f or "__bucket=5/" in f
        for f in pruned.inputFiles())
    assert t2.read().count() == 100
    assert t2.read().filter(F.col("url") == "https://ex.org/5") \
        .head()["text"] == "v2-5"
    # layout probe ignores the synthetic level: the --maintain guard
    # still sees an unpartitioned table
    assert IceliteTable.stored_partition_cols(str(tmp_path / "b")) == []


def test_run_extraction_bucket_urls_end_to_end(spark, tmp_path):
    """CLI-surface wiring: `--bucket-urls N` creates the extracted table
    under the bucket layout on the first run; the resume delta run and a
    plain reopened run (no flag) produce byte-identical tables to an
    unbucketed root."""
    import glob
    import os
    from datetime import datetime

    from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
    from sanskrit_ocr_spark.extract.job import (
        extracted_table, run_extraction,
    )

    def pages(lo, hi):
        return spark.createDataFrame(
            pages_pandas(lo, hi - lo), schema=PAGES_SCHEMA)

    ts = datetime(2025, 7, 4)
    plain, bucketed = str(tmp_path / "plain"), str(tmp_path / "buck")
    r1 = run_extraction(spark, pages(0, 100), bucketed, committed_at=ts,
                        bucket_urls=N_BUCKETS)
    # delta run WITHOUT the flag: reopened handle loads the persisted spec
    r2 = run_extraction(spark, pages(0, 200), bucketed, committed_at=ts)
    run_extraction(spark, pages(0, 100), plain, committed_at=ts)
    run_extraction(spark, pages(0, 200), plain, committed_at=ts)
    assert r1["inserted"] + r2["inserted"] == 196  # 200 - 4 dup urls

    # physical layout: every data file sits under a __bucket= hive dir
    files = glob.glob(os.path.join(bucketed, "extracted", "data",
                                   "**", "*.parquet"), recursive=True)
    assert files and all("__bucket=" in f for f in files)

    a = extracted_table(spark, bucketed).read()
    b = extracted_table(spark, plain).read()
    assert a.columns == b.columns
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bucket_commit_writes_one_file_per_present_bucket(spark, tmp_path):
    """Hash write-distribution: a commit must not fan out into
    tasks x buckets tiny files — ~one parquet file per present bucket."""
    import glob
    import os

    t = _table(spark, tmp_path, "wd")
    t.merge_on_key(_batch(spark, 0, 400).repartition(16), "url",
                   order_col="warc_ts")
    files = glob.glob(os.path.join(str(tmp_path / "wd"), "data",
                                   "**", "*.parquet"), recursive=True)
    # 400 urls cover all 8 buckets; without the pre-write repartition
    # this would be up to 16 x 8 = 128 files
    assert len(files) <= N_BUCKETS + 2


def test_resume_probe_reads_bucket_pruned(spark, tmp_path):
    """run_extraction's resume anti-join scans only the incoming batch's
    bucket directories on a bucket-layout table."""
    from datetime import datetime

    from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
    from sanskrit_ocr_spark.extract.job import (
        extracted_table, run_extraction,
    )

    def pages(lo, hi):
        return spark.createDataFrame(
            pages_pandas(lo, hi - lo), schema=PAGES_SCHEMA)

    ts = datetime(2025, 7, 4)
    root = str(tmp_path / "probe")
    run_extraction(spark, pages(0, 200), root, committed_at=ts,
                   bucket_urls=64)
    ext = extracted_table(spark, root)

    batch = pages(0, 3)  # 3 urls -> at most 3 of 64 buckets
    ids = ext.bucket_ids_for(
        batch.select("url"), "url")
    assert ids is not None and 0 < len(ids) <= 3
    pruned = ext.read(buckets=ids)
    assert len(pruned.inputFiles()) < len(ext.read().inputFiles())
    # and the job stays correct end-to-end: full-duplicate batch
    # inserts nothing, fresh batch inserts its delta
    r = run_extraction(spark, batch, root, committed_at=ts)
    assert r["inserted"] == 0
    r = run_extraction(spark, pages(200, 210), root, committed_at=ts)
    assert r["inserted"] == 10


def test_count_scans_bucket_pruned_for_mor_and_delete_keys(
        spark, tmp_path):
    """r6: the updated/deleted row-count scans inside merge_upsert_mor
    and delete_keys prune to the key batch's buckets on a bucket-layout
    table — counts identical to the flat layout, and the pruned read
    the counts ride demonstrably touches only the matching bucket
    files."""
    b = _table(spark, tmp_path, "cnt")
    flat = IceliteTable(spark, str(tmp_path / "flat"), SCHEMA)
    for t in (b, flat):
        t.append(_batch(spark, 0, 200))

    up = _batch(spark, 0, 7, tag="v2", day=2)
    _, upd_b = b.merge_upsert_mor(up, "url", order_col="warc_ts")
    _, upd_f = flat.merge_upsert_mor(up, "url", order_col="warc_ts")
    assert upd_b == upd_f == 7

    keys = spark.createDataFrame(
        [(f"https://ex.org/{i}",) for i in range(3, 10)], "url string")
    _, del_b = b.delete_keys(keys, "url")
    _, del_f = flat.delete_keys(keys, "url")
    assert del_b == del_f == 7
    assert b.read().count() == flat.read().count() == 193

    # the pruned form the counts use really narrows the scan
    ids = b.bucket_ids_for(keys, "url")
    assert ids is not None and 0 < len(ids) <= N_BUCKETS
    pruned = b.read(buckets=ids)
    full = b.read()
    assert len(pruned.inputFiles()) < len(full.inputFiles())
