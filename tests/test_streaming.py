"""Streaming ingestion: drain a pages directory with availableNow, verify the
committed table matches the batch path byte-for-byte, and that late-arriving
files are picked up incrementally with MERGE idempotence."""

import pytest
from pyspark.sql import functions as F

from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
from sanskrit_ocr_spark.extract.job import extracted_table, run_extraction
from sanskrit_ocr_spark.streaming.ingest import start_ingest


def _write_pages(spark, path, lo, hi, mode="overwrite"):
    (spark.createDataFrame(pages_pandas(lo, hi - lo), schema=PAGES_SCHEMA)
     .select("url", "warc_ts", "html")
     .coalesce(2).write.mode(mode).parquet(path))


def test_stream_ingest_matches_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    root = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    _write_pages(spark, pages_dir, 0, 120)

    q = start_ingest(spark, pages_dir, root, ckpt, available_now=True)
    q.awaitTermination(300)

    # batch reference run over the same input
    from datetime import datetime
    batch_root = str(tmp_path / "batch_out")
    pages = spark.createDataFrame(pages_pandas(0, 120), schema=PAGES_SCHEMA)
    run_extraction(spark, pages, batch_root, committed_at=datetime(2025, 7, 4))

    a = extracted_table(spark, root).read()
    b = extracted_table(spark, batch_root).read()
    assert a.count() == b.count()
    joined = (a.select("url", F.col("text").alias("ta"))
              .join(b.select("url", F.col("text").alias("tb")), "url"))
    assert joined.count() == a.count()
    assert joined.filter(F.col("ta") != F.col("tb")).count() == 0


def test_stream_ingest_incremental_no_duplicates(spark, tmp_path):
    pages_dir = str(tmp_path / "pages2")
    root = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    _write_pages(spark, pages_dir, 0, 100)
    q = start_ingest(spark, pages_dir, root, ckpt, available_now=True)
    q.awaitTermination(300)
    n1 = extracted_table(spark, root).read().count()

    # late files land (including overlapping urls 0-99 again → must dedup)
    _write_pages(spark, pages_dir, 0, 200, mode="append")
    q = start_ingest(spark, pages_dir, root, ckpt, available_now=True)
    q.awaitTermination(300)
    t = extracted_table(spark, root).read()
    assert t.count() > n1
    assert t.select("url").distinct().count() == t.count()


def _write_warc_segments(tmp_path, sub, lo, hi, files=2):
    from sanskrit_ocr_spark.datagen.pages import pages_pandas
    from sanskrit_ocr_spark.sources.warclite import write_warc

    d = tmp_path / sub
    d.mkdir(exist_ok=True)
    rows = pages_pandas(lo, hi - lo)
    per = (len(rows) + files - 1) // files
    for i in range(files):
        chunk = rows.iloc[i * per:(i + 1) * per]
        write_warc(
            str(d / f"seg-{lo:05d}-{i:05d}.warc.gz"),
            [(r["url"], r["warc_ts"].to_pydatetime(), bytes(r["html"]))
             for _, r in chunk.iterrows()])
    return str(d)


def test_warc_stream_ingest_matches_batch(spark, tmp_path):
    from sanskrit_ocr_spark.streaming.ingest import start_warc_ingest

    warc_dir = _write_warc_segments(tmp_path, "warc", 0, 120)
    root = str(tmp_path / "wstream_out")
    ckpt = str(tmp_path / "wckpt")
    q = start_warc_ingest(spark, warc_dir, root, ckpt, available_now=True)
    q.awaitTermination(300)

    from datetime import datetime

    from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
    batch_root = str(tmp_path / "wbatch_out")
    pages = spark.createDataFrame(pages_pandas(0, 120), schema=PAGES_SCHEMA)
    run_extraction(spark, pages, batch_root, committed_at=datetime(2025, 7, 4))

    a = extracted_table(spark, root).read()
    b = extracted_table(spark, batch_root).read()
    assert a.count() == b.count()
    joined = (a.select("url", F.col("text").alias("ta"),
                       F.col("status").alias("sa"))
              .join(b.select("url", F.col("text").alias("tb"),
                             F.col("status").alias("sb")), "url"))
    assert joined.count() == a.count()
    assert joined.filter((F.col("ta") != F.col("tb"))
                         | (F.col("sa") != F.col("sb"))).count() == 0


def test_warc_stream_ingest_incremental(spark, tmp_path):
    from sanskrit_ocr_spark.streaming.ingest import start_warc_ingest

    warc_dir = _write_warc_segments(tmp_path, "warc2", 0, 100)
    root = str(tmp_path / "wout2")
    ckpt = str(tmp_path / "wckpt2")
    q = start_warc_ingest(spark, warc_dir, root, ckpt, available_now=True)
    q.awaitTermination(300)
    n1 = extracted_table(spark, root).read().count()
    assert n1 > 0

    # late segments land (NEW file names, urls 50-199 overlapping 50-99)
    # → checkpoint skips the old files, MERGE dedups the overlap
    _write_warc_segments(tmp_path, "warc2", 50, 200)
    q = start_warc_ingest(spark, warc_dir, root, ckpt, available_now=True)
    q.awaitTermination(300)
    t = extracted_table(spark, root).read()
    assert t.count() > n1
    assert t.select("url").distinct().count() == t.count()


def test_warc_stream_recrawl_replaces_rows(spark, tmp_path):
    """Streaming re-crawl: a second drain over segments carrying the SAME
    urls with NEW content replaces rows through the merge-on-read upsert
    (foreachBatch → merge_upsert_mor) instead of skipping them."""
    from sanskrit_ocr_spark.sources.warclite import write_warc
    from sanskrit_ocr_spark.streaming.ingest import start_warc_ingest

    warc_dir = _write_warc_segments(tmp_path, "warc3", 0, 60)
    root = str(tmp_path / "wout3")
    q = start_warc_ingest(spark, warc_dir, root,
                          str(tmp_path / "wckpt3"), available_now=True)
    q.awaitTermination(300)
    t = extracted_table(spark, root)
    n1 = t.read().count()
    old = {r["url"]: r["text"] for r in t.read().collect()}

    # re-crawl segments: same urls, spliced new content, newer timestamps
    import pandas as pd

    from sanskrit_ocr_spark.datagen.pages import pages_pandas
    para = ("नया संस्करण उपलब्ध है और यह पृष्ठ पूरी तरह से अद्यतन किया"
            " गया है। इस संस्करण में अनेक सुधार तथा नवीन सामग्री"
            " सम्मिलित की गयी है।")
    pdf = pages_pandas(0, 30)
    pdf["html"] = pdf["html"].map(
        lambda b: b.replace(b"</body>",
                            f"<p>{para}</p></body>".encode("utf-8")))
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"]) + pd.Timedelta(days=30)
    write_warc(str(tmp_path / "warc3" / "seg-recrawl-00000.warc.gz"),
               [(r["url"], r["warc_ts"].to_pydatetime(), bytes(r["html"]))
                for _, r in pdf.iterrows()])

    q = start_warc_ingest(spark, warc_dir, root,
                          str(tmp_path / "wckpt3"), available_now=True,
                          recrawl=True)
    q.awaitTermination(300)

    out = t.read()
    assert out.count() == n1  # replacements, not inserts
    assert out.select("url").distinct().count() == n1
    new = {r["url"]: r["text"] for r in out.collect()}
    changed = sum(1 for u in new if new[u] != old[u])
    assert changed >= 20  # most of the 30 re-crawled pages updated
    hit = sum(1 for u in new if "नया संस्करण" in new[u])
    assert hit >= 20


def test_warc_stream_crash_between_merge_and_checkpoint(spark, tmp_path):
    """r5 (VERDICT r4 #5): kill the stream AFTER a micro-batch's
    MERGE-on-url table commit but BEFORE Spark records the batch's
    offsets in the streaming checkpoint, then restart. This is exactly
    the at-least-once redelivery window the MERGE idempotence claim
    exists for: the restarted stream re-delivers the committed batch, and
    the table must end with no duplicate urls and no lost segments."""
    from sanskrit_ocr_spark.streaming.ingest import start_warc_ingest

    warc_dir = _write_warc_segments(tmp_path, "warccrash", 0, 120, files=4)
    root = str(tmp_path / "crash_out")
    ckpt = str(tmp_path / "crash_ckpt")

    committed = []

    def crash_after_second(batch_id):
        committed.append(batch_id)
        if len(committed) == 2:
            raise RuntimeError("injected crash post-merge pre-checkpoint")

    q = start_warc_ingest(spark, warc_dir, root, ckpt,
                          max_files_per_trigger=1, available_now=True,
                          on_batch_committed=crash_after_second)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(300)
    assert len(committed) == 2, "crash must fire after the 2nd merge"

    # the crashed batch's MERGE already landed in the table
    mid = extracted_table(spark, root).read().count()
    assert mid > 0

    # restart from the same checkpoint: batch 2 is RE-DELIVERED (its
    # offsets never reached the checkpoint), later segments drain
    q = start_warc_ingest(spark, warc_dir, root, ckpt,
                          max_files_per_trigger=1, available_now=True)
    q.awaitTermination(300)

    got = extracted_table(spark, root).read()
    # no lost segments: every distinct url of the 120-page corpus present
    from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
    expect = spark.createDataFrame(pages_pandas(0, 120),
                                   schema=PAGES_SCHEMA) \
        .select("url").distinct().count()
    assert got.select("url").distinct().count() == expect
    # no duplicate urls despite the redelivered batch
    assert got.count() == expect
    dupes = (got.groupBy("url").count().filter(F.col("count") > 1).count())
    assert dupes == 0


def test_warc_stream_empty_batch_commits_nothing(spark, tmp_path):
    """r5 ADVICE: a micro-batch whose records all fail to parse (url
    NULL → filtered) is EMPTY and must not churn a snapshot — no data
    file, no lineage row, no pending MOR delete set."""
    import gzip

    from sanskrit_ocr_spark.extract.job import lineage_table
    from sanskrit_ocr_spark.streaming.ingest import start_warc_ingest

    d = tmp_path / "warcjunk"
    d.mkdir()
    (d / "seg-junk-00000.warc.gz").write_bytes(
        gzip.compress(b"this is a valid gzip member but not a WARC\r\n\r\n"))
    root = str(tmp_path / "junk_out")
    ckpt = str(tmp_path / "junk_ckpt")
    q = start_warc_ingest(spark, str(d), root, ckpt,
                          available_now=True, recrawl=True)
    q.awaitTermination(300)
    assert extracted_table(spark, root).snapshot_id() == 0
    assert lineage_table(spark, root).snapshot_id() == 0


def test_warc_stream_recrawl_with_continuous_curation(spark, tmp_path):
    """r6 (r5 VERDICT #2): recrawl=True + curate_root — a re-crawled
    url's OLD text must leave the corpus (retraction) and the NEW text
    enter, keeping the corpus equal to curating the current table state
    instead of silently accumulating both versions forever."""
    import pandas as pd

    from sanskrit_ocr_spark.datagen.pages import pages_pandas
    from sanskrit_ocr_spark.extract.curate import curate, _corpus_schema
    from sanskrit_ocr_spark.sources.warclite import write_warc
    from sanskrit_ocr_spark.streaming.ingest import start_warc_ingest
    from sanskrit_ocr_spark.tables.icelite import IceliteTable

    warc_dir = _write_warc_segments(tmp_path, "warcrecur", 0, 120, files=2)
    root = str(tmp_path / "recur_out")
    ckpt = str(tmp_path / "recur_ckpt")
    corpus_root = str(tmp_path / "recur_corpus")
    q = start_warc_ingest(spark, warc_dir, root, ckpt,
                          available_now=True, recrawl=True,
                          curate_root=corpus_root)
    q.awaitTermination(300)
    ext = extracted_table(spark, root)
    corpus = IceliteTable(spark, corpus_root, _corpus_schema())
    old5 = {r["text"] for r in ext.read()
            .filter(F.col("url").endswith("/000005")).collect()}
    assert corpus.read().count() > 0

    # land a re-crawl segment: urls 1..41 re-served with different
    # content (rows 301..341) and a later warc_ts
    new = pages_pandas(301, 40).reset_index(drop=True)
    orig = pages_pandas(1, 40).reset_index(drop=True)
    new["url"] = orig["url"]
    new["warc_ts"] = orig["warc_ts"] + pd.Timedelta(days=365)
    write_warc(
        str(tmp_path / "warcrecur" / "seg-recrawl-00000.warc.gz"),
        [(r["url"], r["warc_ts"].to_pydatetime(), bytes(r["html"]))
         for _, r in new.iterrows()])
    q = start_warc_ingest(spark, warc_dir, root, ckpt,
                          available_now=True, recrawl=True,
                          curate_root=corpus_root)
    q.awaitTermination(300)

    got = {r["text"] for r in corpus.read().select("text").collect()}
    want = {r["text"] for r in curate(ext.read())
            .select("text").collect()}
    assert got == want
    if old5:
        assert not (old5 & got)  # replaced url's old text retracted


def test_warc_stream_with_continuous_curation(spark, tmp_path):
    """r5: curate_root threads incremental curation into foreachBatch —
    crawl → extract → curated corpus in ONE streaming job, equal to the
    batch pipeline's curate() over the final table."""
    from sanskrit_ocr_spark.extract.curate import curate, _corpus_schema
    from sanskrit_ocr_spark.streaming.ingest import start_warc_ingest
    from sanskrit_ocr_spark.tables.icelite import IceliteTable

    warc_dir = _write_warc_segments(tmp_path, "warccur", 0, 200, files=4)
    root = str(tmp_path / "cur_out")
    ckpt = str(tmp_path / "cur_ckpt")
    corpus_root = str(tmp_path / "cur_corpus")
    q = start_warc_ingest(spark, warc_dir, root, ckpt,
                          max_files_per_trigger=1, available_now=True,
                          curate_root=corpus_root)
    q.awaitTermination(300)

    corpus = IceliteTable(spark, corpus_root, _corpus_schema())
    got = {r["text"] for r in corpus.read().select("text").collect()}
    want = {r["text"] for r in
            curate(extracted_table(spark, root).read())
            .select("text").collect()}
    assert got == want and len(got) > 0
    # per-batch watermarks advanced with the stream
    h = corpus.history()
    assert h[0]["extracted_watermark"] == \
        extracted_table(spark, root).snapshot_id()

    # crash-replay composition: redelivered batches re-curate
    # idempotently (content-hash MERGE) — drain again, nothing changes
    before = corpus.snapshot_id()
    q = start_warc_ingest(spark, warc_dir, root, ckpt,
                          available_now=True, curate_root=corpus_root)
    q.awaitTermination(300)
    assert corpus.snapshot_id() == before
    assert corpus.read().count() == len(want)


def test_stream_ingest_into_bucketed_table(spark, tmp_path):
    """r6 composition: streaming ingest into a table CREATED under the
    bucket(N, url) layout (the CLI rejects --bucket-urls on
    --stream-warc, but a batch-created bucketed table must keep working
    when later drained into by the stream — reopened handles load the
    persisted spec and every micro-batch MERGE runs bucket-pruned)."""
    import glob
    import os
    from datetime import datetime

    pages_dir = str(tmp_path / "pages")
    root = str(tmp_path / "bstream")
    ckpt = str(tmp_path / "bckpt")

    # create the table bucketed via the batch path (first 40 urls)
    seed = spark.createDataFrame(pages_pandas(0, 40), schema=PAGES_SCHEMA)
    run_extraction(spark, seed, root, committed_at=datetime(2025, 7, 4),
                   bucket_urls=8)

    # stream the full 120 urls: 40 resolve via the (pruned) resume
    # anti-join, 80 insert
    _write_pages(spark, pages_dir, 0, 120)
    q = start_ingest(spark, pages_dir, root, ckpt, available_now=True)
    q.awaitTermination(300)

    t = extracted_table(spark, root)
    assert t.bucket == ("url", 8)
    out = t.read()
    assert out.count() == out.select("url").distinct().count()

    # every data file (batch seed AND streamed commits) is bucketed
    files = glob.glob(os.path.join(root, "extracted", "data",
                                   "**", "*.parquet"), recursive=True)
    assert files and all("__bucket=" in f for f in files)

    # byte-parity with an unbucketed batch run over the same input
    batch_root = str(tmp_path / "bref")
    pages = spark.createDataFrame(pages_pandas(0, 120), schema=PAGES_SCHEMA)
    run_extraction(spark, pages, batch_root,
                   committed_at=datetime(2025, 7, 4))
    b = extracted_table(spark, batch_root).read()
    assert out.count() == b.count()
    joined = (out.select("url", F.col("text").alias("ta"))
              .join(b.select("url", F.col("text").alias("tb")), "url"))
    assert joined.count() == b.count()
    assert joined.filter(F.col("ta") != F.col("tb")).count() == 0


def test_stream_ingest_into_sorted_table(spark, tmp_path):
    """r6 composition: streaming ingest into a table CREATED with the
    warc_ts write sort order (the CLI rejects --sort-ts on
    --stream-warc, but a batch-created sorted table must keep
    clustering when later drained into by the stream — reopened handles
    load the persisted spec, so every micro-batch commit stages
    range-clustered)."""
    import glob
    import os
    from datetime import datetime

    import pyarrow.parquet as pq

    pages_dir = str(tmp_path / "spages")
    root = str(tmp_path / "sstream")
    ckpt = str(tmp_path / "sckpt")

    seed = spark.createDataFrame(pages_pandas(0, 40), schema=PAGES_SCHEMA)
    run_extraction(spark, seed, root, committed_at=datetime(2025, 7, 4),
                   sort_ts=True)

    _write_pages(spark, pages_dir, 0, 120)
    q = start_ingest(spark, pages_dir, root, ckpt, available_now=True)
    q.awaitTermination(300)

    t = extracted_table(spark, root)
    assert t.sort_cols == ["warc_ts"]
    out = t.read()
    assert out.count() == out.select("url").distinct().count()

    # every data file (batch seed AND streamed commits) is internally
    # ts-ordered
    files = glob.glob(os.path.join(root, "extracted", "data",
                                   "**", "*.parquet"), recursive=True)
    assert files
    for f in files:
        col = pq.read_table(f, columns=["warc_ts"])["warc_ts"].to_pylist()
        assert col == sorted(col)

    # byte-parity with an unsorted batch run over the same input
    batch_root = str(tmp_path / "sref")
    pages = spark.createDataFrame(pages_pandas(0, 120), schema=PAGES_SCHEMA)
    run_extraction(spark, pages, batch_root,
                   committed_at=datetime(2025, 7, 4))
    b = extracted_table(spark, batch_root).read()
    assert out.count() == b.count()
    joined = (out.select("url", F.col("text").alias("ta"))
              .join(b.select("url", F.col("text").alias("tb")), "url"))
    assert joined.count() == b.count()
    assert joined.filter(F.col("ta") != F.col("tb")).count() == 0
