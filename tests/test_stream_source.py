"""r6: the ``icelite`` Python Data Source streaming reader — commits as
micro-batches (offsets = snapshot ids), Arrow-batch executor reads,
checkpointed exactly-once delivery, append-only contract with an
explicit opt-in insert-event-log mode under merge-on-read deletes."""

import datetime as dt

import pytest
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from sanskrit_ocr_spark.streaming.source import IceliteDataSource
from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA = StructType([
    StructField("k", LongType(), False),
    StructField("v", StringType(), False),
    StructField("ts", TimestampType(), False),
])

TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame([(k, v, TS) for k, v in rows], SCHEMA)


def _rows(df):
    return sorted((r["k"], r["v"], r["ts"]) for r in df.collect())


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(IceliteDataSource)


def _drain(spark, root, checkpoint, name, **opts):
    """One availableNow pass through a foreachBatch collector (the
    memory sink cannot recover from a checkpoint; foreachBatch can) —
    returns the sorted tuples delivered by THIS run."""
    reader = spark.readStream.format("icelite").option("path", root)
    for k, v in opts.items():
        reader = reader.option(k, v)
    rows: list = []
    q = (reader.load().writeStream
         .foreachBatch(lambda df, _bid: rows.extend(
             tuple(r) for r in df.collect()))
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return sorted(rows)


def test_commits_stream_and_checkpoint_resume(spark, tmp_path):
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    t = IceliteTable(spark, root, SCHEMA)
    t.append(_df(spark, [(0, "a"), (1, "b")]))
    t.append(_df(spark, [(2, "c")]))

    got = _drain(spark, root, ckpt, "s1")
    assert got == _rows(t.read())
    assert all(isinstance(r[2], dt.datetime) for r in got)

    # restart from the same checkpoint: ONLY the new commit arrives
    t.append(_df(spark, [(3, "d")]))
    got2 = _drain(spark, root, ckpt, "s2")
    assert got2 == [(3, "d", TS)]

    # nothing new: an empty drain, no duplicates
    got3 = _drain(spark, root, ckpt, "s3")
    assert got3 == []


def test_starting_latest_skips_history(spark, tmp_path):
    root = str(tmp_path / "l")
    t = IceliteTable(spark, root, SCHEMA)
    t.append(_df(spark, [(0, "old")]))
    got = _drain(spark, root, str(tmp_path / "c1"), "lat1",
                 starting="latest")
    assert got == []
    t.append(_df(spark, [(1, "new")]))
    got2 = _drain(spark, root, str(tmp_path / "c1"), "lat2",
                  starting="latest")
    assert got2 == [(1, "new", TS)]


def test_mor_deletes_fail_unless_opted_in(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    root = str(tmp_path / "mor")
    t = IceliteTable(spark, root, SCHEMA)
    t.append(_df(spark, [(0, "v0"), (1, "w0")]))
    t.merge_upsert_mor(_df(spark, [(0, "v1")]), "k")

    with pytest.raises(StreamingQueryException) as e:
        _drain(spark, root, str(tmp_path / "cf"), "f1")
    assert "skipDeletes" in str(e.value)

    # opt-in: the insert-event log — every committed version once
    got = _drain(spark, root, str(tmp_path / "cs"), "f2",
                 skipDeletes="true")
    assert got == [(0, "v0", TS), (0, "v1", TS), (1, "w0", TS)]


def test_hive_layout_rejected_offline_schema_and_missing_table(
        spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    hive_root = str(tmp_path / "hive")
    th = IceliteTable(spark, hive_root, SCHEMA, partition_cols=["v"])
    th.append(_df(spark, [(0, "a")]))
    with pytest.raises(StreamingQueryException) as e:
        _drain(spark, hive_root, str(tmp_path / "ch"), "h1")
    assert "hive layout" in str(e.value)

    # schema() derives from the footer when the user passes none — the
    # passing tests above already exercise it; a missing table errors
    with pytest.raises(Exception) as e2:
        _drain(spark, str(tmp_path / "nope"), str(tmp_path / "cn"), "h2")
    assert "no icelite table" in str(e2.value)


def test_schema_evolution_null_fill(spark, tmp_path):
    root = str(tmp_path / "evo")
    t = IceliteTable(spark, root, SCHEMA)
    t.append(_df(spark, [(0, "a")]))
    t.add_columns([StructField("extra", LongType(), True)])
    evolved = t.current_schema()
    t2 = IceliteTable(spark, root, evolved)
    t2.append(spark.createDataFrame([(1, "b", TS, 7)], evolved))

    got = _drain(spark, root, str(tmp_path / "ce"), "evo1")
    assert sorted((r[0], r[3]) for r in got) == [(0, None), (1, 7)]


def test_streaming_source_drives_continuous_curation(spark, tmp_path):
    """Composition: the icelite source streams the EXTRACTED table's
    commits, and a foreachBatch curation MERGEs each micro-batch into a
    content-hash-keyed corpus table — a streaming-driven alternative to
    the batch `curate_table` loop with the same end state. The
    checkpoint guarantees each extraction commit curates exactly once
    across restarts."""
    from pyspark.sql import functions as F

    from sanskrit_ocr_spark.datagen.pages import pages_df
    from sanskrit_ocr_spark.extract.curate import _corpus_schema, curate
    from sanskrit_ocr_spark.extract.job import run_extraction

    root = str(tmp_path / "job")
    ckpt = str(tmp_path / "ckpt")
    corpus = IceliteTable(spark, str(tmp_path / "corpus"),
                          _corpus_schema())

    def curate_batch(batch, _bid):
        rows = (curate(batch)
                .select(F.md5(F.encode("text", "UTF-8")).alias("text_md5"),
                        "url", "warc_ts", "text", "n_graphemes",
                        "n_sentences"))
        corpus.merge_on_key(rows, "text_md5", order_col="warc_ts")

    def drain():
        q = (spark.readStream.format("icelite")
             .option("path", f"{root}/extracted").load()
             .writeStream.foreachBatch(curate_batch)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run_extraction(spark, pages_df(spark, 200), root)
    drain()
    assert corpus.read().count() == 158  # == batch curate_table's number

    # delta commit, second drain: ends at the full-recompute state
    run_extraction(spark, pages_df(spark, 300), root)
    drain()
    got = {(r["text_md5"], r["url"]) for r in corpus.read().collect()}
    from sanskrit_ocr_spark.extract.job import extracted_table
    full = curate(extracted_table(spark, root).read()).select(
        F.md5(F.encode("text", "UTF-8")).alias("text_md5"), "url")
    assert got == {(r["text_md5"], r["url"]) for r in full.collect()}
    assert len(got) == 234

    # replay safety: an empty drain leaves the corpus snapshot alone
    sid = corpus.snapshot_id()
    drain()
    assert corpus.snapshot_id() == sid


def test_changelog_stream_matches_batch_changelog(spark, tmp_path):
    """CDC mode: the stream's per-micro-batch insert/delete events are
    exactly read_changelog over the same offset range — including full
    delete pre-images at the earliest applicable delete, and the
    exclusion of pre-range deaths on checkpoint resume."""
    root = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "ckpt")
    t = IceliteTable(spark, root, SCHEMA)
    t.append(_df(spark, [(0, "a0"), (1, "b0"), (2, "c0")]))      # 1
    t.merge_upsert_mor(_df(spark, [(0, "a1"), (1, "b1")]), "k")  # 2
    t.append(_df(spark, [(3, "d0")]))                            # 3
    t.merge_upsert_mor(_df(spark, [(0, "a2")]), "k")             # 4

    def ev(rows):
        return sorted((r[0], r[1], r[3], r[4]) for r in rows)

    got = _drain(spark, root, ckpt, "cdc1", changelog="true")
    want = ev(tuple(r) for r in t.read_changelog(0).collect())
    assert ev(got) == want
    # a2 insert at 4, a1 killed at 4, b0/a0 killed at 2, etc.
    assert (0, "a1", "delete", 4) in ev(got)

    # resume: only the NEW commits' events; a1's death at 5 is in
    # range, a0/b0's deaths at 2 are not re-delivered
    t.merge_upsert_mor(_df(spark, [(3, "d1")]), "k")             # 5
    got2 = _drain(spark, root, ckpt, "cdc2", changelog="true")
    assert ev(got2) == ev(
        tuple(r) for r in t.read_changelog(4).collect())
    assert ev(got2) == sorted([
        (3, "d0", "delete", 5), (3, "d1", "insert", 5)])

    # option conflict fails at stream start
    from pyspark.errors.exceptions.captured import StreamingQueryException
    with pytest.raises(StreamingQueryException) as e:
        _drain(spark, root, str(tmp_path / "cx"), "cdc3",
               changelog="true", skipDeletes="true")
    assert "mutually exclusive" in str(e.value)


def test_changelog_stream_fold_reaches_table_state(spark, tmp_path):
    """Folding the CDC stream into a keyed mirror reproduces the
    table — the end-to-end property an incremental consumer relies
    on."""
    root = str(tmp_path / "fold")
    t = IceliteTable(spark, root, SCHEMA)
    t.append(_df(spark, [(i, f"v{i}") for i in range(6)]))
    t.merge_upsert_mor(_df(spark, [(2, "w2"), (4, "w4")]), "k")
    t.merge_upsert_mor(_df(spark, [(2, "x2"), (6, "x6")]), "k")

    mirror: dict = {}
    rows = _drain(spark, root, str(tmp_path / "cf"), "fold1",
                  changelog="true")
    # apply deletes-then-inserts per commit, in commit order
    from itertools import groupby
    for sid, evs in groupby(sorted(rows, key=lambda r: r[4]),
                            key=lambda r: r[4]):
        evs = list(evs)
        for r in evs:
            if r[3] == "delete":
                assert mirror.pop(r[0]) == r[1]
        for r in evs:
            if r[3] == "insert":
                mirror[r[0]] = r[1]
    assert mirror == {r["k"]: r["v"] for r in t.read().collect()}
