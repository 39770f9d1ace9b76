"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's E2
clean→filter→dedup→count path, SURVEY.md §3) on sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the training-data extras; the driver compares each against DuckDB at
sf0.01 (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's h5→parquet finishing path (E2) on the
    documents table — clean (P1 analog) → empty-filter (F1) → first-wins
    dedup (D1) → grouped counts + token sums (A1/A3)."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    clean = F.trim(F.regexp_replace("text", "[^a-z ]+", ""))
    # hash-first window key: sort/shuffle comparisons touch an 8-byte hash,
    # not whole documents; "clean" stays in the key only for collision safety
    w = Window.partitionBy(F.xxhash64("clean"), "clean") \
              .orderBy(F.col("doc_id").asc())
    return (docs
            .select("doc_id", "source", clean.alias("clean"))
            .filter(F.length("clean") > 0)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .groupBy("source")
            .agg(F.count("*").alias("doc_count"),
                 F.sum(F.size(F.split(F.col("clean"), " +")).cast("long"))
                 .alias("n_tokens")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sanskrit_ocr_spark.ops import registry

    q, _ = registry()

    # Extraction-pipeline entries (not SQL-expressible → rows-only checks;
    # byte-identity vs pure-kernel goldens is asserted by pytest instead).
    def x1_extract_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sanskrit_ocr_spark.datagen.pages import pages_df
        from sanskrit_ocr_spark.extract.pipeline import extract_pages
        ext = extract_pages(pages_df(spark, 500), salt_partitions=8)
        # sentences as JSON so the driver's value-hash never has to sort
        # raw array columns; the struct form is golden-tested in pytest
        return ext.select("url", "warc_ts", "text",
                          F.to_json("sentences").alias("sentences_json"),
                          "n_graphemes", "status", "part_hash")

    def x2_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
        from datetime import datetime
        from sanskrit_ocr_spark.datagen.pages import pages_df
        from sanskrit_ocr_spark.extract.pipeline import extract_pages, lineage_rows
        ext = extract_pages(pages_df(spark, 500))
        return lineage_rows(ext, snapshot_id=1,
                            committed_at=datetime(2025, 7, 4))

    q = dict(q)
    q["x1_extract_pages"] = x1_extract_pages
    q["x2_lineage"] = x2_lineage
    return q


def oracle_sql() -> dict[str, str]:
    from sanskrit_ocr_spark.ops import registry

    _, o = registry()
    return dict(o)
