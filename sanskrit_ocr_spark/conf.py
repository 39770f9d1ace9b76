"""SparkSession construction with the scale posture SURVEY.md §4 mandates.

All knobs in one place so tests, bench.py, and spark-submit jobs share the
exact same session shape. Local master is a stand-in for a real cluster —
everything here (AQE, Arrow batching, shuffle partitioning) transfers
unchanged to a 1000-executor deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Committed golden fixtures (regression-pin oracles + pytest goldens),
# derived from the package location so nothing hardcodes a checkout root.
FIXTURES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures")

# Arrow batch size into pandas UDFs — the rebuild analog of the reference's
# 1024-prompt GPU batches (translate_bookcorpus.py:23): big enough to amortize
# Python/Arrow transfer, small enough to keep executor memory bounded.
ARROW_BATCH_ROWS = 1024


def build_spark(app: str = "sanskrit-ocr-spark", master: str | None = None,
                shuffle_partitions: int | None = None,
                extra: dict | None = None) -> SparkSession:
    b = SparkSession.builder.appName(app)
    if master:
        b = b.master(master)
    confs = {
        # AQE: runtime coalescing + skew-join splitting (north_rule).
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow everywhere; bounded batches into pandas UDFs.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(ARROW_BATCH_ROWS),
        # Don't let tiny test inputs produce 200 shuffle partitions, and
        # don't let big inputs underpartition: callers size this.
        "spark.sql.shuffle.partitions": str(shuffle_partitions or 32),
        # Target split size for file scans (128 MiB default is right for the
        # 100 TB case; harmless locally).
        "spark.sql.files.maxPartitionBytes": "134217728",
        # Timestamps without timezone surprises.
        "spark.sql.session.timeZone": "UTC",
        # Write timestamps as INT64 micros, not the deprecated INT96:
        # INT96 columns carry NO parquet min/max statistics, which would
        # silently disable icelite's file-level data skipping on
        # warc_ts (and predicate pushdown row-group skipping generally).
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    }
    if extra:
        confs.update(extra)
    for k, v in confs.items():
        b = b.config(k, v)
    return b.getOrCreate()
