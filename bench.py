#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` (default 32),
plus the extraction pipeline itself (the north metric) over a seeded
synthetic pages table materialized to parquet first so datagen cost never
pollutes extraction timing.

Output: ``{"metric": "suite_seconds", "value": <total>, "unit": "sec",
"queries": {name: sec, ...}, "sf": <sf>, "extract_docs_per_sec": N, ...}``

Scaling-efficiency evidence (BASELINE.md: local[8] vs local[32]) is produced
by ``BENCH/scaling.py``, not here — this file is the per-round driver hook.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

EXTRACT_ROWS = int(os.environ.get("BENCH_EXTRACT_ROWS", "80000"))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from sanskrit_ocr_spark.conf import build_spark
    from sanskrit_ocr_spark.datagen.pages import pages_df
    from sanskrit_ocr_spark.extract.pipeline import extract_pages
    from sanskrit_ocr_spark.ops import registry

    spark = build_spark(app="bench", master=f"local[{cpus}]",
                        shuffle_partitions=cpus,
                        extra={"spark.ui.enabled": "false",
                               "spark.driver.memory": "16g",
                               # small synthetic corpus: keep scan splits >=
                               # cores and amortize Arrow IPC (BASELINE.md)
                               "spark.sql.files.maxPartitionBytes": "8m",
                               "spark.sql.execution.arrow.maxRecordsPerBatch":
                                   "8192"})
    from pyspark.sql import functions as F

    queries, _ = registry()

    def force(df):
        """Fully evaluate EVERY output column: hash each row's JSON into one
        aggregate. A bare count() lets Spark prune unused projections (e.g.
        p1's regexp_replace would never execute). bit_xor, not sum: summing
        64-bit hashes overflows under ANSI mode."""
        return df.select(
            F.bit_xor(F.xxhash64(F.to_json(F.struct(*df.columns)))).alias("h")
        ).collect()

    # r4 registry consolidation renames (BENCH/RESULTS.md): p1_content_gate
    # was p1_content_filter (+F1 gate), ts_doc_stats subsumes
    # ts_fingerprint (+lang/quality/token columns), dedup_exact_hash covers
    # the dropped d1_dedup_first_wins.
    headline = [
        "p1_content_gate", "q1_pricing_summary",
        "q3_top_revenue", "j_broadcast_dims", "w2_sessionize",
        "dedup_exact_hash", "dedup_minhash_lsh", "ann_cosine_topk",
        "ts_doc_stats", "mm_feature_extract",
        "dedup_paragraphs", "ann_semantic_dedup", "ts_hash_split",
        "x5_web_curate", "e1_event_sets",
    ]

    timings: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    try:
        # Materialize the synthetic pages corpus (datagen excluded from
        # extraction timing).
        pages_path = os.path.join(tmp, "pages")
        pages_df(spark, EXTRACT_ROWS, n_partitions=cpus * 2) \
            .write.mode("overwrite").parquet(pages_path)

        pages = spark.read.parquet(pages_path)
        # warm-up (JIT + Python worker pool): steady state is the honest
        # long-lived-executor analog (BASELINE.md methodology); then median
        # of 3 timed passes with a GC drain between them — single passes
        # swing ±30% with hypervisor neighbor load (BENCH/RESULTS.md)
        n_extracted = extract_pages(pages, salt_partitions=0).count()
        passes = []
        for _ in range(3):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            extract_pages(pages, salt_partitions=0).count()
            passes.append(time.perf_counter() - t0)
        passes.sort()
        dt = passes[1]  # median of 3
        timings["extract_pages"] = round(dt, 3)
        extract_docs_per_sec = round(n_extracted / dt, 1)
        extract_passes = [round(n_extracted / p, 1) for p in passes]

        # end-to-end job rate: extract → MERGE-on-url → icelite commit +
        # lineage (the north metric includes the write path; extract_pages
        # above isolates the UDF stage for r1/r2 comparability)
        from sanskrit_ocr_spark.extract.job import run_extraction
        e2e_root = os.path.join(tmp, "e2e_table")
        t0 = time.perf_counter()
        run_extraction(spark, pages, e2e_root)
        e2e_dt = time.perf_counter() - t0
        timings["extract_commit_e2e"] = round(e2e_dt, 3)
        e2e_docs_per_sec = round(n_extracted / e2e_dt, 1)

        # incremental-merge probe (r3 VERDICT #7): re-submit the same
        # pages against the now-committed table — every url resolves via
        # the resume anti-join (inserts 0), so the committed-key scan +
        # MERGE anti-join dominate. A/B the merge_prefilter_buckets
        # shuffle guard on exactly that path; see BENCH/PLANS.md for the
        # crossover discussion.
        t0 = time.perf_counter()
        run_extraction(spark, pages, e2e_root)
        timings["merge_resubmit"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        run_extraction(spark, pages, e2e_root,
                       merge_prefilter_buckets=1 << 20)
        timings["merge_resubmit_prefilter"] = round(
            time.perf_counter() - t0, 3)

        # bucket-layout merge probe (r6): a SMALL batch against a big
        # committed table is the replay/top-up shape where the static
        # bucket(N, url) layout pays off — the committed-side anti-join
        # scan prunes to the batch's bucket DIRECTORIES at the file-list
        # level. N must be >> batch keys for pruning to bite (a 16-url
        # batch covers <=16 of 256 buckets; the unbucketed arm scans
        # every committed file). Table build is untimed (one-off write;
        # the sum-of-timings headline is unaffected).
        bucket_root = os.path.join(tmp, "bucket_table")
        run_extraction(spark, pages, bucket_root, bucket_urls=256)
        small_batch = pages.orderBy("url").limit(16)
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        run_extraction(spark, small_batch, e2e_root)
        timings["merge_small_batch"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        run_extraction(spark, small_batch, bucket_root)
        timings["merge_small_batch_bucketed"] = round(
            time.perf_counter() - t0, 3)

        # incremental curation (r5): first run covers the whole table
        # (watermark 0 -> HEAD) — the curate + content-hash MERGE cost;
        # the immediate re-run is the steady-state no-new-data probe
        from sanskrit_ocr_spark.extract.curate import curate_table
        from sanskrit_ocr_spark.extract.job import extracted_table
        ext_t = extracted_table(spark, e2e_root)
        corpus_root = os.path.join(tmp, "corpus_table")
        t0 = time.perf_counter()
        curate_table(spark, corpus_root, ext_t)
        timings["curate_incremental"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        curate_table(spark, corpus_root, ext_t)
        timings["curate_incremental_noop"] = round(
            time.perf_counter() - t0, 3)

        from sanskrit_ocr_spark.ops import dedup

        for name in headline:
            # drain heap debt from the preceding stages/queries before
            # timing (BENCH/RESULTS.md methodology: GC storms from the
            # 80k-row commit prefix halved later per-query passes —
            # observed 2.6s → 18s on mm_feature_extract without this)
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            force(queries[name](spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
            dedup.release_caches()  # minhash shingle cache: scoped per query

        # the 100 TB hot-shingle guard, measured: same LSH pipeline with the
        # document-frequency cap active (one extra groupBy + broadcast
        # anti-join over the shingle stream). df_cap=400 exceeds this
        # corpus's max shingle df (338), so results are IDENTICAL and the
        # delta vs dedup_minhash_lsh is the guard's pure overhead; see
        # BENCH/PLANS.md for the aggressive-cap benefit measurement.
        t0 = time.perf_counter()
        force(dedup.dedup_minhash_lsh(spark, sf_dir, df_cap=400))
        timings["dedup_minhash_lsh_dfcap"] = round(
            time.perf_counter() - t0, 3)
        dedup.release_caches()

        # same-run hardware calibration: the pure-Python kernel on ONE
        # core, no Spark/JVM. This box's effective CPU speed swings 2x+
        # with hypervisor neighbor load (BENCH/RESULTS.md), so absolute
        # docs/s numbers from different runs are not comparable — the
        # ratio extract_docs_per_sec / (kernel_1core x cores) is. The
        # calibration costs ~1-2s and makes every run self-normalizing.
        from sanskrit_ocr_spark.datagen.pages import pages_pandas
        from sanskrit_ocr_spark.kernels.page import extract_page
        cal_rows = [bytes(h) for h in pages_pandas(0, 2000)["html"]]
        t0 = time.perf_counter()
        for h in cal_rows:
            extract_page(h)
        kernel_1core = round(len(cal_rows) / (time.perf_counter() - t0), 1)

        total = round(sum(timings.values()), 3)
        print(json.dumps({
            "metric": "suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "extract_rows": n_extracted,
            "extract_docs_per_sec": extract_docs_per_sec,
            "extract_passes_docs_per_sec": extract_passes,
            "extract_commit_e2e_docs_per_sec": e2e_docs_per_sec,
            "kernel_1core_docs_per_sec": kernel_1core,
            "extract_frac_of_kernel_ceiling": round(
                extract_docs_per_sec / (kernel_1core * cpus), 3),
            "cpus": cpus,
        }))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
