"""Curation stage: quality gate + deterministic first-wins dedup over the
extraction output, corpus + captions sinks, Observation-based stats."""

import json

from pyspark.sql import functions as F

from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
from sanskrit_ocr_spark.extract.curate import curate, write_corpus
from sanskrit_ocr_spark.extract.pipeline import extract_pages


def _extracted(spark, n=300):
    pages = spark.createDataFrame(pages_pandas(0, n), schema=PAGES_SCHEMA)
    return extract_pages(pages).cache()


def test_curate_semantics(spark):
    ext = _extracted(spark)
    try:
        corpus = curate(ext).cache()
        rows = corpus.collect()
        # only clean rows, all above the quality gate
        assert all(r["n_graphemes"] >= 20 and r["n_sentences"] >= 1
                   for r in rows)
        # exact-text dedup: every text appears once
        texts = [r["text"] for r in rows]
        assert len(texts) == len(set(texts))
        # duplicate-text rows (80-84 per block) collapsed to block row-0:
        # the winner has the earliest warc_ts of its text group
        ext_ok = ext.filter(F.col("status") == "OK")
        grp = (ext_ok.groupBy("text")
               .agg(F.min("warc_ts").alias("first_ts"),
                    F.count("*").alias("n")))
        winners = {r["text"]: r["warc_ts"] for r in rows}
        for g in grp.collect():
            if g["text"] in winners:
                assert winners[g["text"]] == g["first_ts"]
        assert any(g["n"] >= 5 for g in grp.collect())  # dups existed
    finally:
        ext.unpersist()


def test_write_corpus_and_captions(spark, tmp_path):
    ext = _extracted(spark, 200)
    corpus = curate(ext)
    stats = write_corpus(corpus, str(tmp_path / "corpus_out"))
    back = spark.read.parquet(str(tmp_path / "corpus_out" / "corpus"))
    assert stats["docs"] == back.count() > 100
    assert stats["graphemes"] == back.agg(
        F.sum("n_graphemes")).collect()[0][0]
    caps = spark.read.json(str(tmp_path / "corpus_out" / "captions_jsonl"))
    assert caps.count() == stats["docs"]
    one = json.loads(next(
        (tmp_path / "corpus_out" / "captions_jsonl").glob("part-*.json")
    ).read_text().splitlines()[0])
    assert set(one) == {"url", "text"}


def test_write_corpus_evaluates_curation_dag_once(spark, tmp_path):
    """r3 VERDICT #5: the captions JSONL must come from re-reading the
    just-written corpus parquet, not from re-running the curation DAG —
    a per-row accumulator on the curated frame must tick exactly once per
    corpus row even with captions enabled."""
    acc = spark.sparkContext.accumulator(0)

    @F.udf("string")
    def tick(u):
        acc.add(1)
        return u

    ext = _extracted(spark, 200)
    corpus = curate(ext).withColumn("url", tick("url"))
    stats = write_corpus(corpus, str(tmp_path / "once_out"))
    assert acc.value == stats["docs"]
    caps = spark.read.json(str(tmp_path / "once_out" / "captions_jsonl"))
    assert caps.count() == stats["docs"]


def test_write_corpus_empty_slice(spark, tmp_path):
    """A batch where nothing survives curation (normal for a
    non-Devanagari crawl slice) must write an empty corpus and zeroed
    stats, not crash on None Observation metrics."""
    corpus = curate(_extracted(spark, 300).limit(0))
    stats = write_corpus(corpus, str(tmp_path / "empty_out"))
    assert stats == {"docs": 0, "graphemes": 0, "sentences": 0}
    back = spark.read.parquet(str(tmp_path / "empty_out" / "corpus"))
    assert back.count() == 0


def test_curate_dedup_plan_is_partial_aggregated_not_window(spark):
    """r5 structural pin for the skew-proof first-wins dedup: curate()'s
    plan must contain NO Window operator (a window buffers every copy of
    a hot text in one task) and must aggregate in TWO phases — a partial
    aggregate below the exchange (map-side collapse of duplicate groups)
    and a final above it. The ordered-struct min buffer plans as
    SortAggregate (not HashAggregate) on Spark 4; the partial/final
    split, not the aggregate flavor, is the scale property."""
    import contextlib
    import io
    import re

    from sanskrit_ocr_spark.datagen.pages import pages_df
    from sanskrit_ocr_spark.extract.curate import curate
    from sanskrit_ocr_spark.extract.pipeline import extract_pages

    df = curate(extract_pages(pages_df(spark, 100)))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    aggs = re.findall(r"(?:Sort|Hash|ObjectHash)Aggregate \(\d+\)", tree)
    assert len(aggs) >= 2, f"expected partial+final aggregate, got {aggs}"
    # the first-wins is a declarative MIN aggregate over the ordered
    # struct (r7: min(struct(order, payload)) — 2-3× cheaper than the
    # r5 min_by on wide rows, same partial-aggregation skew-proofness)
    assert re.search(r"\bmin\(", plan)
