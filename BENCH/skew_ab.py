"""Host-skew salting A/B (north_rule: "salted repartitioning for
host-level skew").

The synthetic corpus plants a Zipf-ish mega host (~30% of pages on
site0, datagen/pages.py). This script materializes the adversarial-but-
realistic input layout — pages physically clustered one host per file,
as a crawler writing per-host segments produces — and times the
extraction stage with and without the salted repartition
(xxhash64(url, warc_ts), extract/pipeline.py).

Run: python BENCH/skew_ab.py    (local[32], 80k pages, median of 3)
"""

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sanskrit_ocr_spark.conf import build_spark
from sanskrit_ocr_spark.datagen.pages import pages_df
from sanskrit_ocr_spark.extract.pipeline import extract_pages


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=80000)
    # r5 stretch (VERDICT r4 #8): rewrite ~this fraction of pages onto
    # ONE megahost before the per-host clustered write — the adversarial
    # "parked domain owns half the crawl" input. Url paths are the
    # globally-unique doc_id, so collapsing hosts never collides urls.
    ap.add_argument("--hot-frac", type=float, default=0.0)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    spark = build_spark(master="local[32]", shuffle_partitions=32,
                        extra={"spark.driver.memory": "40g",
                               "spark.ui.enabled": "false"})
    tmp = tempfile.mkdtemp(prefix="skew_")
    try:
        pp = os.path.join(tmp, "pages_by_host")
        pages0 = pages_df(spark, args.rows, n_partitions=64)
        if args.hot_frac > 0:
            hot = F.pmod(F.xxhash64("url"), F.lit(1000)) \
                < int(args.hot_frac * 1000)
            pages0 = pages0.withColumn(
                "url",
                F.when(hot, F.regexp_replace(
                    "url", r"^https://[^./]+\.", "https://megahost."))
                .otherwise(F.col("url")))
        (pages0
         .withColumn("host",
                     F.regexp_extract("url", r"https://([^./]+)\.", 1))
         .repartition("host")
         .write.mode("overwrite").parquet(pp))
        pages = spark.read.parquet(pp).drop("host")
        extract_pages(pages, salt_partitions=64).count()  # warm

        def timed(salt: int) -> float:
            passes = []
            for _ in range(args.passes):
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                extract_pages(pages, salt_partitions=salt).count()
                passes.append(time.perf_counter() - t0)
            passes.sort()
            return passes[len(passes) // 2]

        no_salt, salted = timed(0), timed(64)
        print(f"salt=0 (task per host-clustered file): {no_salt:.2f}s")
        print(f"salt=64 (xxhash64(url, warc_ts)):      {salted:.2f}s")
        print(f"speedup: {no_salt / salted:.2f}x")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
