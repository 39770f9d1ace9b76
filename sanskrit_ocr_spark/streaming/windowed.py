"""Watermarked tumbling-window aggregation over an event stream.

The reference has no streaming (SURVEY.md §2.12) — its progress counters
(A1) are per-chunk prints. This is the Spark-native shape those metrics
take when pages/events arrive continuously: event-time tumbling windows
with a watermark bounding late data and state size.

Used for live extraction telemetry: feed the lineage/status stream through
``windowed_counts`` to get failure rates per wall-clock window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(stream: DataFrame, ts_col: str, key_col: str,
                    window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per key with late-data watermark.

    Watermark semantics: rows later than ``watermark`` behind the max seen
    event time are dropped and their windows finalized — bounding both
    state size and result staleness (the knob a 10^12-row ingest needs).
    """
    return (stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"),
                     F.col(key_col))
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    key_col, "n"))
