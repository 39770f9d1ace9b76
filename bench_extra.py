#!/usr/bin/env python
"""r7 optimization A/B harnesses — the decision-grade measurements behind
OPTIMIZATION_r07.md, reproducible in one process so hypervisor drift
cannot fake a result (interleaved variants, identical result-hash
asserted wherever variants must agree).

NOT the driver hook (that is the frozen ``bench.py``); run selectively:

    python bench_extra.py staging   # persist(DISK_ONLY) vs parquet staging
    python bench_extra.py salt      # salted vs scan-direct extract commit
    python bench_extra.py keepfirst # min_by vs min(struct(order,payload))
    python bench_extra.py minhash   # shingle-cache width x subtree persists
    python bench_extra.py all
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

ROWS = int(os.environ.get("BENCH_EXTRA_ROWS", "80000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from sanskrit_ocr_spark.conf import build_spark

    return build_spark(app="bench-extra", master=f"local[{CPUS}]",
                       shuffle_partitions=CPUS,
                       extra={"spark.ui.enabled": "false",
                              "spark.driver.memory": "16g",
                              "spark.sql.files.maxPartitionBytes": "8m",
                              "spark.sql.execution.arrow."
                              "maxRecordsPerBatch": "8192"})


def _force(df):
    from pyspark.sql import functions as F

    return df.select(F.bit_xor(F.xxhash64(F.to_json(
        F.struct(*df.columns)))).alias("h")).collect()[0]["h"]


def _pages(spark, tmp):
    from sanskrit_ocr_spark.datagen.pages import pages_df
    from sanskrit_ocr_spark.extract.pipeline import extract_pages

    p = os.path.join(tmp, "pages")
    pages_df(spark, ROWS, n_partitions=CPUS * 2).write.parquet(p)
    pages = spark.read.parquet(p)
    extract_pages(pages, salt_partitions=0).count()  # warm workers/JIT
    return pages


def ab_staging(spark, tmp):
    """Phase-split of one extract commit: DISK_ONLY persist of the UDF
    output vs a columnar parquet staging dir (OPTIMIZATION_r07.md #1)."""
    from datetime import datetime, timezone

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from sanskrit_ocr_spark.extract.job import extracted_table, lineage_table
    from sanskrit_ocr_spark.extract.pipeline import extract_pages, lineage_rows
    from sanskrit_ocr_spark.ops.util import keep_first

    pages = _pages(spark, tmp)

    def one(tag, i, parquet_stage):
        root = os.path.join(tmp, f"stg_{tag}_{i}")
        ext = extracted_table(spark, root)
        lin = lineage_table(spark, root)
        t0 = time.perf_counter()
        if parquet_stage:
            stage = os.path.join(root, "stage")
            extract_pages(pages).write.parquet(stage)
            extracted = spark.read.parquet(stage)
        else:
            extracted = extract_pages(pages).persist(StorageLevel.DISK_ONLY)
            extracted.count()
        t1 = time.perf_counter()
        fresh = keep_first(extracted, "url", ["warc_ts", "url"])
        fresh.write.parquet(os.path.join(root, "commitlike"))
        t2 = time.perf_counter()
        lin.append(lineage_rows(extracted.select("part_hash", "status"),
                                snapshot_id=1,
                                committed_at=datetime.now(timezone.utc)))
        t3 = time.perf_counter()
        if not parquet_stage:
            extracted.unpersist()
        print(f"  {tag}[{i}]: materialize={t1-t0:.2f} merge_write={t2-t1:.2f}"
              f" lineage={t3-t2:.2f} total={t3-t0:.2f}", flush=True)

    for i in range(3):
        one("persist", i, False)
        one("parquet", i, True)


def ab_salt(spark, tmp):
    """Salted repartition vs scan-direct extract commit, interleaved
    (OPTIMIZATION_r07.md #3)."""
    from sanskrit_ocr_spark.extract.job import run_extraction

    pages = _pages(spark, tmp)
    for i, salt in enumerate([2 * CPUS, 0, 2 * CPUS, 0, 2 * CPUS, 0]):
        root = os.path.join(tmp, f"salt_{i}")
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        run_extraction(spark, pages, root, salt_partitions=salt)
        print(f"  salt={salt}: {time.perf_counter()-t0:.2f}", flush=True)


def ab_keepfirst(spark, tmp):
    """min_by(payload, order) vs min(struct(order, payload)) on the
    staged extracted frame — identical hash required
    (OPTIMIZATION_r07.md #4)."""
    from pyspark.sql import functions as F

    from sanskrit_ocr_spark.extract.pipeline import extract_pages

    pages = _pages(spark, tmp)
    stage = os.path.join(tmp, "kf_stage")
    extract_pages(pages, salt_partitions=0).write.parquet(stage)
    staged = spark.read.parquet(stage)
    cols = staged.columns

    def v_minby(df):
        return (df.groupBy(F.xxhash64(F.col("url")).alias("__kh"),
                           F.col("url").alias("__k"))
                .agg(F.min_by(F.struct(*cols),
                              F.struct(F.col("warc_ts"), F.col("url")))
                     .alias("__w"))
                .select("__w.*"))

    def v_minstruct(df):
        return (df.groupBy(F.xxhash64(F.col("url")).alias("__kh"),
                           F.col("url").alias("__k"))
                .agg(F.min(F.struct(F.col("warc_ts"), F.col("url"),
                                    F.struct(*cols).alias("__p")))
                     .alias("__w"))
                .select("__w.__p.*"))

    hashes = set()
    for name, fn in (("min_by", v_minby), ("min_struct", v_minstruct)):
        _force(fn(staged))  # warm
        for i in range(2):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            h = _force(fn(staged))
            hashes.add(h)
            print(f"  {name}[{i}]: {time.perf_counter()-t0:.2f} h={h}",
                  flush=True)
    assert len(hashes) == 1, "variants disagree!"


def ab_minhash(spark, tmp):
    """Shingle-cache width × subtree materialization — shows the 14×
    candidate-DAG replication cost without the _true_jaccard persists
    (OPTIMIZATION_r07.md #5). The module's current code IS the
    materialized form; the 'replicated' arm strips the persists."""
    from pyspark.sql import functions as F

    import sanskrit_ocr_spark.ops.dedup as D

    def replicated_true_jaccard(sh, pairs):
        cand_ids = (pairs.select(F.col("a_id").alias("doc_id"))
                    .union(pairs.select(F.col("b_id").alias("doc_id")))
                    .distinct())
        sh_c = sh.join(cand_ids, "doc_id", "left_semi")
        a = sh_c.select(F.col("doc_id").alias("a_id"), "sh")
        b = sh_c.select(F.col("doc_id").alias("b_id"), "sh")
        inter = (a.join(b, "sh").filter(F.col("a_id") < F.col("b_id"))
                 .join(pairs, ["a_id", "b_id"], "left_semi")
                 .groupBy("a_id", "b_id").agg(F.count("*").alias("inter")))
        sizes = D._shingle_sizes(sh_c)
        return (inter
                .join(sizes.select(F.col("doc_id").alias("a_id"),
                                   F.col("n_sh").alias("size_a")), "a_id")
                .join(sizes.select(F.col("doc_id").alias("b_id"),
                                   F.col("n_sh").alias("size_b")), "b_id")
                .withColumn("jaccard", F.round(
                    F.col("inter") / (F.col("size_a") + F.col("size_b")
                                      - F.col("inter")), 4)))

    def run(tag, tj, width):
        D.release_caches()
        docs = D.t(spark, SF_DIR, "documents")
        if width:
            docs = docs.repartition(width)
        sh = D._with_shingles(docs).persist()
        D._SHINGLE_CACHE.append(sh)
        cand = D.lsh_candidates(D.minhash_signatures(sh))
        out = (tj(sh, cand)
               .filter(F.col("jaccard") >= D.JACCARD_THRESHOLD)
               .select("a_id", "b_id", "jaccard"))
        t0 = time.perf_counter()
        h = _force(out)
        D.release_caches()
        print(f"  {tag} width={width}: {time.perf_counter()-t0:.2f} h={h}",
              flush=True)
        return h

    hashes = set()
    for width in (0, 32, 64):
        for tag, tj in (("replicated", replicated_true_jaccard),
                        ("materialized", D._true_jaccard)):
            run(tag, tj, width)  # warm
            hashes.add(run(tag, tj, width))
    assert len(hashes) == 1, "variants disagree!"


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    tmp = tempfile.mkdtemp(prefix="bench_extra_")
    try:
        for name, fn in (("staging", ab_staging), ("salt", ab_salt),
                         ("keepfirst", ab_keepfirst),
                         ("minhash", ab_minhash)):
            if which in (name, "all"):
                print(f"== {name} ==", flush=True)
                fn(spark, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
