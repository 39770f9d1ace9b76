"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition a (small-bytes, expensive-per-row) input across the
    cluster before a render/decode/hash UDF stage: byte-based scan split
    sizing is the wrong parallelism signal for UDF-bound stages — a
    bench-scale documents table is ONE split, which would serialize the
    whole Python stage into a single task regardless of core count (the
    same lesson as the extraction pipeline's ``salt_partitions``; spread
    BEFORE the expensive map). Output sets are order-insensitive, so the
    shuffle changes no pinned value; measured 3.5s → ~1.9s for
    mm_feature_extract at sf0.1 on local[32] (BENCH/PLANS.md r4)."""
    n = df.sparkSession.sparkContext.defaultParallelism * 2
    return df.repartition(n)
