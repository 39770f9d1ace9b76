"""Stateful streaming dedup: duplicates suppressed across micro-batches."""

from pyspark.sql import functions as F

from sanskrit_ocr_spark.datagen.pages import PAGES_SCHEMA, pages_pandas
from sanskrit_ocr_spark.extract.pipeline import PAGES_INPUT_SCHEMA
from sanskrit_ocr_spark.streaming.stateful import dedup_stream


def test_stream_dedup_first_wins_across_batches(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # two files → with maxFilesPerTrigger=1, two micro-batches; block 0's
    # dup-url rows (98, 99) land in batch 2 while the original (0) is in
    # batch 1 — cross-batch duplicates
    df = spark.createDataFrame(pages_pandas(0, 100), schema=PAGES_SCHEMA) \
        .select("url", "warc_ts", "html")
    df.filter(~F.col("url").endswith("000000") | (F.minute("warc_ts") == 0)) \
        .coalesce(1).write.parquet(pages_dir + "/f1")
    # re-write rows 0-99 again (all urls duplicated) as a second file
    df.coalesce(1).write.mode("append").parquet(pages_dir + "/f1")

    stream = (spark.readStream.schema(PAGES_INPUT_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(pages_dir + "/f1"))
    q = (dedup_stream(stream)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)

    out = spark.read.schema(PAGES_INPUT_SCHEMA).parquet(out_dir)
    urls = [r["url"] for r in out.select("url").collect()]
    assert len(urls) == len(set(urls)), "duplicate urls escaped the state op"
    # every distinct input url appears exactly once
    n_distinct_in = df.select("url").distinct().count()
    assert len(urls) == n_distinct_in
