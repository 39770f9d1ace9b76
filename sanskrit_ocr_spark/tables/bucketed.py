"""Bucketed co-located joins — the north_rule's "corpus bucketed by
xxhash64(url)" materialized through Spark's NATIVE bucketing.

At 10^12 rows the url-keyed operations this pipeline repeats every
incremental run — the resume anti-join, the MERGE key comparison,
lineage/url enrichment joins — each shuffle both sides on the key unless
the storage layout already co-locates equal keys. Spark's bucketed
tables (``bucketBy(n, key).sortBy(key).saveAsTable``) record the hash
layout in the catalog, and the planner then joins two same-bucketed
tables with ZERO Exchange on either side (and, with one file per
bucket, zero Sort): the join runs bucket-against-bucket where the rows
already live. That is the difference between an incremental merge that
re-shuffles 100 TB and one that streams each bucket pair.

icelite's hive partition spec (``warc_day × bucket``) gives directory
PRUNING; this module adds the catalog-native layout that gives
shuffle-FREE joins. On a real deployment the two compose: Iceberg's
bucket transform (``bucket(N, url)``) plays exactly this role.

``pre_bucketed`` covers the other direction — inputs NOT written through
the catalog: one explicit ``repartition(n, key)`` buys key co-location
for a whole chain of same-key joins/aggregations within the job (one
shuffle amortized across stages), which is the
``salt_partitions=0`` / pre-bucketed posture the extraction bench
measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   files_per_bucket: int = 1) -> None:
    """Persist ``df`` as a catalog parquet table bucketed AND sorted by
    ``key``. ``files_per_bucket=1`` (one writer task per bucket) keeps
    the per-bucket sort usable by the planner, eliminating the Sort as
    well as the Exchange on the bucketed join path."""
    (df.repartition(files_per_bucket * buckets, F.col(key))
       .write.mode("overwrite").format("parquet")
       .bucketBy(buckets, key).sortBy(key)
       .saveAsTable(table))


def bucketed_join(spark: SparkSession, left: str, right: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — plans
    with no Exchange under ``spark.sql.sources.bucketing.enabled``
    (asserted in tests/test_bucketed_join.py)."""
    return spark.table(left).join(spark.table(right), key, how)


def pre_bucketed(df: DataFrame, key: str, n: int) -> DataFrame:
    """Explicitly hash-partition ``df`` on ``key`` so every subsequent
    same-key join/aggregate in the chain reuses ONE shuffle instead of
    introducing its own exchange."""
    return df.repartition(n, F.col(key))
