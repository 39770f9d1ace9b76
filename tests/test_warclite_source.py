"""WARC-style ingestion: write the synthetic corpus as per-record-gzip
WARC files, read it back distributed, extract — byte-identical to the
direct path."""

import gzip
import os

from pyspark.sql import functions as F

from sanskrit_ocr_spark.datagen.pages import pages_pandas
from sanskrit_ocr_spark.extract.pipeline import extract_pages
from sanskrit_ocr_spark.sources.warclite import read_warc, write_warc


def _write_corpus(tmp_path, n=120, files=3):
    rows = pages_pandas(0, n)
    per = (n + files - 1) // files
    for i in range(files):
        chunk = rows.iloc[i * per:(i + 1) * per]
        write_warc(
            str(tmp_path / f"seg-{i:05d}.warc.gz"),
            [(r["url"], r["warc_ts"].to_pydatetime(), bytes(r["html"]))
             for _, r in chunk.iterrows()])
    return rows


def test_warc_roundtrip(spark, tmp_path):
    rows = _write_corpus(tmp_path)
    got = read_warc(spark, str(tmp_path)).orderBy("warc_ts").toPandas()
    assert got["url"].tolist() == rows.sort_values("warc_ts")["url"].tolist()
    assert [bytes(b) for b in got["html"]] == \
        rows.sort_values("warc_ts")["html"].tolist()
    assert got["url"].notna().all()


def test_warc_extraction_matches_direct_path(spark, tmp_path):
    rows = _write_corpus(tmp_path)
    from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA
    direct = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    a = {r["url"]: (r["text"], r["status"])
         for r in extract_pages(read_warc(spark, str(tmp_path)),
                                salt_partitions=4).collect()}
    b = {r["url"]: (r["text"], r["status"])
         for r in extract_pages(direct, salt_partitions=4).collect()}
    assert a == b and len(a) > 100


def test_warc_corrupt_member_yields_null_row(spark, tmp_path):
    _write_corpus(tmp_path, n=20, files=1)
    # append a structurally-valid gzip member whose content is not WARC,
    # plus a second file that is pure garbage
    with open(tmp_path / "seg-00000.warc.gz", "ab") as f:
        f.write(gzip.compress(b"HTTP/1.1 200 OK\r\n\r\nnot a warc"))
    with open(tmp_path / "bad.warc.gz", "wb") as f:
        f.write(os.urandom(64))
    df = read_warc(spark, str(tmp_path))
    assert df.filter(F.col("url").isNull()).count() >= 2
    assert df.filter(F.col("url").isNotNull()).count() == 20


def test_warc_partial_corruption_keeps_valid_prefix(spark, tmp_path):
    """A zlib error PARTWAY through a segment must not discard the
    already-decoded members (r2 ADVICE): the valid prefix survives, the
    unreadable tail becomes exactly one NULL row."""
    _write_corpus(tmp_path, n=20, files=1)
    seg = tmp_path / "seg-00000.warc.gz"
    # truncate the final gzip member mid-stream: valid members decode,
    # then the decompressor hits EOF-inside-member
    data = seg.read_bytes()
    # plain truncation — the decompressor hits EOF inside the final
    # member. (This used to append os.urandom junk, which CONTINUES the
    # deflate bitstream and occasionally decoded into a parseable
    # garbage record: a ~1/200 flake. EOF-mid-member is deterministic.)
    seg.write_bytes(data[:-30])
    df = read_warc(spark, str(tmp_path)).toPandas()
    # 19 intact records survive; the corrupt tail is 1-2 NULL rows (the
    # truncated member, possibly one garbage-resync stop), never a wipeout
    ok = df[df["url"].notna()]
    assert len(ok) == 19
    assert df["url"].isna().sum() >= 1


def test_wet_export_roundtrip(spark, tmp_path):
    """WET-style conversion-record export: extracted text written as
    per-partition .warc.gz segments reads back losslessly (and response
    readers ignore conversion records and vice versa)."""
    from pyspark.sql import functions as F

    from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
    from sanskrit_ocr_spark.sources.warclite import write_wet

    pages = spark.createDataFrame(pages_pandas(0, 120), schema=PAGES_SCHEMA)
    ext = (extract_pages(pages)
           .filter(F.col("status") == "OK")
           .dropDuplicates(["url"]))
    expect = {(r["url"], r["text"]) for r in ext.collect()}

    out = str(tmp_path / "wet_out")
    summary = write_wet(ext.repartition(4), out).collect()
    assert sum(r["n_records"] for r in summary) == len(expect)
    assert 1 <= len(summary) <= 4  # one segment per non-empty partition

    back = read_warc(spark, out, warc_type="conversion") \
        .filter("url is not null")
    got = {(r["url"], bytes(r["html"]).decode("utf-8"))
           for r in back.collect()}
    assert got == expect
    # a response-mode read of WET segments yields only NULL (countable)
    assert read_warc(spark, out).filter("url is not null").count() == 0


def test_cdx_index_and_ranged_fetch(spark, tmp_path):
    """CDX contract: the index's (segment, offset, length) fetches exactly
    the right record with one ranged read — no segment scan."""
    import random

    from sanskrit_ocr_spark.sources.warclite import build_cdx, fetch_record

    rows = _write_corpus(tmp_path, n=90, files=3)
    cdx = build_cdx(spark, str(tmp_path)).toPandas()
    assert len(cdx) == 90
    assert cdx["url"].is_unique

    expect = {r["url"]: (r["warc_ts"].to_pydatetime(), bytes(r["html"]))
              for _, r in rows.iterrows()}
    random.seed(3)
    for _, e in cdx.sample(12, random_state=3).iterrows():
        url, ts, payload = fetch_record(e["segment"], int(e["offset"]),
                                        int(e["length"]))
        assert url == e["url"]
        assert (ts, payload) == expect[url]
    # offsets tile each segment: sorted spans are contiguous from 0
    for seg, grp in cdx.groupby("segment"):
        g = grp.sort_values("offset")
        pos = 0
        for _, e in g.iterrows():
            assert e["offset"] == pos
            pos += e["length"]
