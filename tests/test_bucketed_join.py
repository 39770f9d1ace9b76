"""Bucketed co-located joins: two same-bucketed catalog tables join with
ZERO Exchange (the north_rule's xxhash64(url) bucket layout as Spark
native bucketing), and results match the shuffled plan exactly."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
from sanskrit_ocr_spark.extract.pipeline import extract_pages
from sanskrit_ocr_spark.tables.bucketed import (
    bucketed_join,
    pre_bucketed,
    write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bdb(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/wh'")
    yield "bdb"
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, tmp_path, bdb):
    pages = spark.createDataFrame(pages_pandas(0, 200), schema=PAGES_SCHEMA)
    ext = extract_pages(pages).select("url", "text", "status")
    meta = pages.select("url", "warc_ts").dropDuplicates(["url"])

    write_bucketed(ext, "bdb.extracted_b", "url", buckets=8)
    write_bucketed(meta, "bdb.meta_b", "url", buckets=8)

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "bdb.extracted_b", "bdb.meta_b", "url")
        plan = _plan(j)
        # co-located: sort-merge join with NO shuffle on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and values identical to the plain (shuffled) join
        shuffled = ext.join(meta, "url").count()
        assert j.count() == shuffled

        # anti-join (the resume/MERGE shape) is shuffle-free too
        anti = spark.table("bdb.extracted_b").join(
            spark.table("bdb.meta_b"), "url", "left_anti")
        assert "Exchange" not in _plan(anti)
        assert anti.count() == 0  # every extracted url has a meta row
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path, bdb):
    docs = spark.createDataFrame(pages_pandas(0, 100), schema=PAGES_SCHEMA)
    write_bucketed(docs.select("url", "warc_ts"), "bdb.by_url", "url", 8)
    agg = (spark.table("bdb.by_url")
           .groupBy("url").agg(F.count("*").alias("n")))
    # grouping on the bucket key: partial+final aggregate collapse into the
    # bucketed scan with no exchange
    assert "Exchange" not in _plan(agg)
    assert agg.filter(F.col("n") > 1).count() >= 0


def test_pre_bucketed_chain_single_exchange(spark):
    """One explicit repartition(key) is reused by a following same-key
    join AND aggregation — exactly one Exchange in the whole chain."""
    docs = spark.createDataFrame(pages_pandas(0, 200), schema=PAGES_SCHEMA)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = pre_bucketed(docs.select("url", "warc_ts"), "url", 8)
        right = pre_bucketed(docs.select("url", "lang"), "url", 8)
        chain = (left.join(right, "url")
                 .groupBy("url").agg(F.count("*").alias("n")))
        plan = _plan(chain)
        import re
        # formatted plans list each node in the tree and the detail
        # section; count the detail headers
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_ex == 2  # one per repartitioned input, none for join/agg
        assert chain.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
