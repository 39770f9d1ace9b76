"""Write-sort-order data-skipping A/B (r6: `IceliteTable(sort_cols=...)`
/ `--sort-ts`).

File-level min/max skipping can only prune files whose bounds exclude
the probe range. A hash-spread commit writes files that EACH span the
commit's whole warc_ts range, so a ts-window probe inside a large
commit scans every file no matter how good the manifest stats are. The
declared write sort order range-clusters each commit's files on
warc_ts, making intra-commit bounds disjoint.

This script builds the same synthetic crawl table twice — N_COMMITS
commits x ROWS_PER_COMMIT rows, each commit covering one day with
timestamps hash-spread across the batch — once plain, once with
sort_cols=["warc_ts"], then probes a 2-hour window inside one day and
reports files scanned + median wall time for the pruned read.

Also measures the write-side cost of the clustering shuffle (commit
wall time both arms).

Run: python BENCH/sortorder_ab.py    (local[32], median of 3)
Env: SORTAB_ROWS (default 2_000_000 per commit), SORTAB_COMMITS (4).
"""

import json
import os
import statistics
import sys
import time
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sanskrit_ocr_spark.conf import build_spark
from sanskrit_ocr_spark.tables.icelite import IceliteTable

ROWS = int(os.environ.get("SORTAB_ROWS", 2_000_000))
N_COMMITS = int(os.environ.get("SORTAB_COMMITS", 4))

SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("text", StringType(), False),
])


def day_batch(spark, day):
    # timestamps spread over the day in id order, then hash-spread
    # across partitions (the realistic shuffle-ingested layout)
    return (spark.range(ROWS)
            .select(
                F.concat(F.lit(f"https://ex.org/d{day}/"), "id")
                .alias("url"),
                (F.lit(datetime(2025, 7, day).timestamp()).cast("long")
                 + (F.col("id") * 86400 / ROWS).cast("long"))
                .cast("timestamp").alias("warc_ts"),
                F.concat(F.lit("text-"), "id").alias("text"))
            .repartition(32, "url"))


def build(spark, root, sort):
    t = IceliteTable(spark, root, SCHEMA, stat_cols=["warc_ts"],
                     sort_cols=["warc_ts"] if sort else None)
    walls = []
    for day in range(1, N_COMMITS + 1):
        t0 = time.monotonic()
        t.append(day_batch(spark, day))
        walls.append(time.monotonic() - t0)
    return t, statistics.median(walls)


def probe(t):
    lo, hi = datetime(2025, 7, 2, 9), datetime(2025, 7, 2, 11)
    times, rows, files = [], None, None
    for _ in range(3):
        t0 = time.monotonic()
        df = (t.read(prune={"warc_ts": (lo, hi)})
              .filter(F.col("warc_ts").between(F.lit(lo), F.lit(hi))))
        rows = df.count()
        times.append(time.monotonic() - t0)
        files = len(df.inputFiles())
    return {"rows": rows, "files_scanned": files,
            "probe_s": round(statistics.median(times), 3)}


def main():
    import shutil
    import tempfile

    spark = build_spark(master=f"local[{os.environ.get('CPUS', 32)}]",
                        shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="sortab-")
    out = {"rows_per_commit": ROWS, "commits": N_COMMITS}
    try:
        for arm, sort in (("plain", False), ("sorted", True)):
            t, commit_s = build(spark, os.path.join(work, arm), sort)
            r = probe(t)
            r["total_files"] = len(t.committed_files())
            r["commit_s_median"] = round(commit_s, 3)
            out[arm] = r
        assert out["plain"]["rows"] == out["sorted"]["rows"]
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
