"""r5: incremental WET export (`extract/wet.py`) — only post-watermark
rows ship, completed runs are idempotent, segments read back as
conversion records."""

from pyspark.sql import functions as F

from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
from sanskrit_ocr_spark.extract.job import extracted_table, run_extraction
from sanskrit_ocr_spark.extract.wet import export_wet_incremental
from sanskrit_ocr_spark.sources.warclite import read_warc


def _pages(spark, lo, hi):
    return spark.createDataFrame(pages_pandas(lo, hi - lo),
                                 schema=PAGES_SCHEMA)


def test_incremental_wet_exports_only_the_delta(spark, tmp_path):
    root = str(tmp_path / "root")
    wet_root = str(tmp_path / "wet")
    run_extraction(spark, _pages(spark, 0, 100), root)
    ext = extracted_table(spark, root)

    r1 = export_wet_incremental(spark, wet_root, ext)
    ok1 = ext.read().filter(F.col("status") == "OK").count()
    assert r1["records"] == ok1 > 0

    # idempotent re-run: nothing new, no new segments
    r2 = export_wet_incremental(spark, wet_root, ext)
    assert r2["records"] == 0 and r2["watermark"] == r1["watermark"]

    # second extraction batch: only ITS ok rows ship
    run_extraction(spark, _pages(spark, 100, 250), root)
    r3 = export_wet_incremental(spark, wet_root, ext)
    ok_all = ext.read().filter(F.col("status") == "OK").count()
    assert r3["records"] == ok_all - ok1 > 0
    assert r3["exported_total"] == ok_all

    # the segment files read back as exactly the OK rows, url-unique
    back = read_warc(spark, f"{wet_root}/segments",
                     warc_type="conversion")
    assert back.count() == ok_all
    assert back.select("url").distinct().count() == ok_all


def test_incremental_wet_survives_compaction_without_duplicates(
        spark, tmp_path):
    """Compaction across the watermark forces the full-read fallback —
    the exported-url anti-join must keep the segments duplicate-free."""
    root = str(tmp_path / "root2")
    wet_root = str(tmp_path / "wet2")
    run_extraction(spark, _pages(spark, 0, 100), root)
    ext = extracted_table(spark, root)
    export_wet_incremental(spark, wet_root, ext)

    run_extraction(spark, _pages(spark, 100, 200), root)
    ext.compact(target_partitions=2)
    ext.expire_snapshots(keep_last=1)
    r = export_wet_incremental(spark, wet_root, ext)
    assert r["records"] > 0

    back = read_warc(spark, f"{wet_root}/segments",
                     warc_type="conversion")
    ok_all = ext.read().filter(F.col("status") == "OK").count()
    assert back.count() == ok_all
    assert back.select("url").distinct().count() == ok_all
