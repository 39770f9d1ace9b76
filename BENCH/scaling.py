#!/usr/bin/env python
"""Two-parallelism scaling benchmark — the sandbox substitution for the
north_rule's N→4N executor criterion (see BASELINE.md "Scaling-criterion
substitution" for the full methodology rationale).

Runs the IDENTICAL extraction job on IDENTICAL pre-materialized input at two
N→4N core pairs, each level CPU-pinned (``taskset``) in a fresh subprocess:

* **2→8 cores** (250k pages): both levels inside the box's comfort zone —
  the clean proxy for multiplying independent executors;
* **8→32 cores** (1.8M pages): the full-box pair, reported against the
  box's own pure-CPU scaling ceiling (shared LLC/memory bandwidth +
  hypervisor steal), which this script also measures.

Per level: one untimed warm-up pass (JIT + Python worker pool — the
long-lived-executor steady state), then median of 3 timed passes.

Writes ``BENCH/scaling_results.json`` and ``BENCH/RESULTS.md``.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import shutil
import subprocess
import sys
import tempfile
import time

RUNNER = r"""
import json, sys, time, statistics
cores = int(sys.argv[1]); pages_path = sys.argv[2]; mpb = sys.argv[3]
from sanskrit_ocr_spark.conf import build_spark
from sanskrit_ocr_spark.extract.pipeline import extract_pages
spark = build_spark(app=f"scaling-{cores}", master=f"local[{cores}]",
                    shuffle_partitions=cores,
                    extra={"spark.ui.enabled": "false",
                           "spark.driver.memory": "40g",
                           "spark.sql.files.maxPartitionBytes": mpb,
                           "spark.sql.execution.arrow.maxRecordsPerBatch":
                               "8192"})
df = spark.read.parquet(pages_path)
t0 = time.perf_counter()
n = extract_pages(df, salt_partitions=0).count()
cold = time.perf_counter() - t0
vals = []
for _ in range(3):
    # drain cross-pass garbage so one pass's heap debt cannot stall the
    # next (observed: a full-GC storm on pass k halves pass k's number)
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    extract_pages(df, salt_partitions=0).count()
    vals.append(n / (time.perf_counter() - t0))
print(json.dumps({"cores": cores, "rows": n,
                  "cold_docs_per_sec": round(n / cold, 1),
                  "runs_docs_per_sec": [round(v, 1) for v in vals],
                  "docs_per_sec": round(statistics.median(vals), 1)}))
spark.stop()
"""


def _spin(q, dur):
    t_end = time.perf_counter() + dur
    n = 0
    while time.perf_counter() < t_end:
        for _ in range(10000):
            n += 1
    q.put(n)


def cpu_ceiling(n_small: int, n_big: int, dur: float = 6.0) -> float:
    """Pure-Python spin calibration: the box's own n_small→n_big scaling."""
    def run(procs: int) -> float:
        q = multiprocessing.Queue()
        ps = [multiprocessing.Process(target=_spin, args=(q, dur))
              for _ in range(procs)]
        for p in ps:
            p.start()
        total = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        return total / dur
    return (run(n_big) / run(n_small)) / (n_big / n_small)


def run_at(cores: int, pages_path: str, repo_root: str, mpb: str) -> dict:
    pin = ["taskset", "-c", f"0-{cores - 1}"]
    out = subprocess.run(
        pin + [sys.executable, "-c", RUNNER, str(cores), pages_path, mpb],
        capture_output=True, text=True, cwd=repo_root)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit(1)
    return json.loads(out.stdout.strip().splitlines()[-1])


def generate(rows: int, path: str, repo_root: str) -> None:
    gen = subprocess.run(
        [sys.executable, "-c",
         "from sanskrit_ocr_spark.conf import build_spark\n"
         "from sanskrit_ocr_spark.datagen.pages import pages_df\n"
         "spark = build_spark(app='gen', master='local[32]',\n"
         "                    extra={'spark.ui.enabled': 'false',\n"
         "                           'spark.driver.memory': '24g'})\n"
         f"pages_df(spark, {rows}, n_partitions=128)"
         f".write.mode('overwrite').parquet({path!r})\n"
         "spark.stop()"],
        capture_output=True, text=True, cwd=repo_root)
    if gen.returncode != 0:
        sys.stderr.write(gen.stderr[-2000:])
        raise SystemExit(1)


def main() -> int:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    # sized so every level runs ≥30s: fixed per-job costs (scheduling,
    # shuffle setup) must amortize equally at N and 4N
    ap.add_argument("--small-rows", type=int, default=250_000)
    ap.add_argument("--big-rows", type=int, default=1_800_000)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="scaling_pages_")
    try:
        small = os.path.join(tmp, "small")
        big = os.path.join(tmp, "big")
        generate(args.small_rows, small, repo_root)
        generate(args.big_rows, big, repo_root)

        r2 = run_at(2, small, repo_root, "2m")
        r8s = run_at(8, small, repo_root, "2m")
        r8 = run_at(8, big, repo_root, "8m")
        r32 = run_at(32, big, repo_root, "8m")
        ceiling = round(cpu_ceiling(8, 32), 3)

        eff_small = round((r8s["docs_per_sec"] / r2["docs_per_sec"]) / 4, 3)
        eff_big = round((r32["docs_per_sec"] / r8["docs_per_sec"]) / 4, 3)
        result = {
            "pair_2_to_8": {"N": r2, "fourN": r8s,
                            "scaling_efficiency": eff_small,
                            "pass": eff_small >= 0.8},
            "pair_8_to_32": {"N": r8, "fourN": r32,
                             "scaling_efficiency": eff_big,
                             "hardware_ceiling_8_to_32": ceiling,
                             "fraction_of_ceiling":
                                 round(eff_big / ceiling, 3),
                             "pass": eff_big >= 0.8},
            "target": 0.8,
        }
        print(json.dumps(result, indent=2))
        bench_dir = os.path.join(repo_root, "BENCH")
        with open(os.path.join(bench_dir, "scaling_results.json"), "w") as f:
            json.dump(result, f, indent=2)
        with open(os.path.join(bench_dir, "RESULTS.md"), "w") as f:
            f.write(
                "# Scaling-efficiency results (sandbox N→4N substitution)\n\n"
                "Identical extraction job, identical pre-materialized input, "
                "CPU-pinned levels, steady-state medians of 3 "
                "(methodology: BASELINE.md).\n\n"
                "| pair | N docs/s | 4N docs/s | efficiency | target | pass |\n"
                "| --- | --- | --- | --- | --- | --- |\n"
                f"| 2→8 cores ({args.small_rows} pages) | "
                f"{r2['docs_per_sec']} | {r8s['docs_per_sec']} | "
                f"**{eff_small}** | ≥0.8 | {'✅' if eff_small >= 0.8 else '❌'} |\n"
                f"| 8→32 cores ({args.big_rows} pages) | "
                f"{r8['docs_per_sec']} | {r32['docs_per_sec']} | "
                f"**{eff_big}** | ≥0.8 | {'✅' if eff_big >= 0.8 else '❌'} |\n\n"
                f"Pure-CPU calibration of this shared VM (32 spin processes "
                f"vs 8): **{ceiling}** efficiency ceiling for 8→32 — one box "
                f"shares LLC/memory bandwidth and hypervisor steal across all "
                f"cores, which a real 4N-executor cluster does not. The "
                f"extraction job reaches "
                f"{round(100 * eff_big / ceiling, 1)}% of that ceiling; the "
                f"2→8 pair, inside the box's comfort zone, is the cleaner "
                f"proxy for independent executors.\n\n"
                f"Raw per-pass numbers: `BENCH/scaling_results.json`.\n")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
