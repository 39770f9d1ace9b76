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


def session_counts(stream: DataFrame, ts_col: str, key_col: str,
                   gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows per key — the streaming twin of the batch
    sessionizer (``ops/relational.py:w2_sessionize``): a session extends
    until ``gap`` of event-time silence, merged incrementally by
    ``session_window`` state. The watermark finalizes (and emits, in
    append mode) sessions whose end falls behind the event-time horizon —
    the same state/lateness bound as ``windowed_counts``.

    Boundary semantics: ``session_window`` keeps an event in the session
    iff it arrives strictly within ``gap`` of the last event (window end =
    last event + gap, half-open) — an event at exactly ``gap`` starts a
    new session, where the batch w2 keeps strictly-greater gaps together;
    the parity test mirrors this ``>=`` convention.
    """
    return (stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"),
                     F.col(key_col))
            .agg(F.count("*").alias("n_events"))
            .select(F.col("sess.start").alias("session_start"),
                    F.col("sess.end").alias("session_end"),
                    key_col, "n_events"))
