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


def test_covered_delta_advances_watermark(spark, tmp_path):
    """r5 VERDICT #4: a delta whose urls were ALL already exported must
    advance the watermark (metadata-only sidecar commit) instead of
    being re-read and re-anti-joined on every subsequent run."""
    root = str(tmp_path / "root3")
    wet_root = str(tmp_path / "wet3")
    run_extraction(spark, _pages(spark, 0, 60), root)
    ext = extracted_table(spark, root)
    r1 = export_wet_incremental(spark, wet_root, ext)
    assert r1["records"] > 0

    # recrawl the SAME pages (identical content): the new delta
    # re-inserts already-exported urls — nothing fresh ships
    run_extraction(spark, _pages(spark, 0, 60), root, recrawl=True)
    r2 = export_wet_incremental(spark, wet_root, ext)
    assert r2["records"] == 0
    assert r2["watermark"] == ext.snapshot_id() > r1["watermark"]

    # third run does ZERO delta work: the watermark advanced, so the
    # covered range is never read again (early return before
    # read_changes) and the sidecar takes no new commit
    from sanskrit_ocr_spark.tables.icelite import IceliteTable
    from sanskrit_ocr_spark.extract.wet import EXPORTED_SCHEMA
    import os
    side = IceliteTable(spark, os.path.join(wet_root, "exported"),
                        EXPORTED_SCHEMA)
    assert side.history()[0]["kind"] == "meta"
    side_sid = side.snapshot_id()
    calls = []
    orig = ext.read_changes
    ext.read_changes = lambda *a, **k: (calls.append(1),
                                        orig(*a, **k))[1]
    try:
        r3 = export_wet_incremental(spark, wet_root, ext)
    finally:
        ext.read_changes = orig
    assert r3["records"] == 0 and not calls
    assert side.snapshot_id() == side_sid


def test_recrawl_delta_ships_one_latest_record_per_url(spark, tmp_path):
    """r5 ADVICE (medium): a url re-inserted by recrawl commits WITHIN
    one export window appears once per commit in the insert-only delta —
    the export must collapse to exactly one record per url, the LATEST
    crawl, never both versions."""
    import pandas as pd

    root = str(tmp_path / "root4")
    wet_root = str(tmp_path / "wet4")
    run_extraction(spark, _pages(spark, 0, 40), root)
    # recrawl the same urls with a newer warc_ts BEFORE any export: both
    # versions of every url sit inside the first export's delta range
    pdf = pages_pandas(0, 40)
    pdf["warc_ts"] = pdf["warc_ts"] + pd.Timedelta(days=365)
    run_extraction(spark,
                   spark.createDataFrame(pdf, schema=PAGES_SCHEMA),
                   root, recrawl=True)
    ext = extracted_table(spark, root)

    r = export_wet_incremental(spark, wet_root, ext)
    current = (ext.read().filter(F.col("status") == "OK")
               .select("url", "warc_ts"))
    n_ok = current.count()
    assert r["records"] == n_ok > 0

    back = read_warc(spark, f"{wet_root}/segments",
                     warc_type="conversion").select("url", "warc_ts")
    assert back.count() == n_ok  # one record per url, not two
    # and it is the LATEST version: shipped (url, warc_ts) pairs equal
    # the table's current (post-MOR) state exactly
    assert back.exceptAll(current).count() == 0
    assert current.exceptAll(back).count() == 0


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
