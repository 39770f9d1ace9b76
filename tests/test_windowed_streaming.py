"""Windowed streaming counts match the batch hourly rollup on a drained
stream (stream/batch parity — the property that makes streaming telemetry
trustworthy)."""

from pyspark.sql import functions as F

from sanskrit_ocr_spark.streaming.windowed import windowed_counts

SF = "/root/testdata/sf0.001"
EVENTS_SCHEMA = ("event_id long, ts timestamp_ntz, user_id long, "
                 "event_type string, value double, props string")


def test_windowed_counts_match_batch(spark, tmp_path):
    out_dir = str(tmp_path / "win_out")
    ckpt = str(tmp_path / "ckpt")
    # file stream source must be a directory
    src = str(tmp_path / "events_src")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(src)

    stream = (spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    q = (windowed_counts(stream, "ts", "event_type")
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    batch = (spark.read.parquet(f"{SF}/events.parquet")
             .withColumn("ts", F.col("ts").cast("timestamp"))
             .groupBy(F.date_trunc("hour", "ts").alias("window_start"),
                      "event_type")
             .agg(F.count("*").alias("n")))
    # drained availableNow stream finalizes every window except those still
    # within the watermark horizon of the max event time
    max_ts = batch.agg(F.max("window_start")).collect()[0][0]
    finalized = batch.filter(
        F.col("window_start") < F.lit(max_ts) - F.expr("INTERVAL 2 HOURS"))
    joined = (got.select("window_start", "event_type",
                         F.col("n").alias("n_stream"))
              .join(finalized, ["window_start", "event_type"], "right"))
    assert joined.filter(F.col("n_stream").isNull()).count() == 0
    assert joined.filter(F.col("n_stream") != F.col("n")).count() == 0
