#!/usr/bin/env python
"""Two-parallelism scaling benchmark — the sandbox substitution for the
north_rule's N→4N executor criterion (BASELINE.md "Scaling-criterion
substitution").

Runs the IDENTICAL extraction job on IDENTICAL pre-materialized input at
``local[8]`` (N) and ``local[32]`` (4N), each in a fresh subprocess (fresh
JVM — no warm-cache bleed between runs), and reports docs/sec at both plus
``efficiency = (throughput_4N / throughput_N) / 4``; target ≥ 0.8.

Usage::

    python BENCH/scaling.py [--rows 120000] [--out BENCH/scaling_results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, sys, time
cores = int(sys.argv[1]); pages_path = sys.argv[2]
from sanskrit_ocr_spark.conf import build_spark
from sanskrit_ocr_spark.extract.pipeline import extract_pages
spark = build_spark(app=f"scaling-{cores}", master=f"local[{cores}]",
                    shuffle_partitions=cores,
                    extra={"spark.ui.enabled": "false",
                           "spark.driver.memory": "16g"})
df = spark.read.parquet(pages_path)
t0 = time.perf_counter()
n = extract_pages(df).count()
dt = time.perf_counter() - t0
print(json.dumps({"cores": cores, "rows": n, "seconds": round(dt, 3),
                  "docs_per_sec": round(n / dt, 1)}))
spark.stop()
"""


def run_at(cores: int, pages_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cores), pages_path],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=120_000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scaling_results.json"))
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="scaling_pages_")
    try:
        pages_path = os.path.join(tmp, "pages")
        # materialize once; both runs read the same files
        gen = subprocess.run(
            [sys.executable, "-c",
             "import sys\n"
             "from sanskrit_ocr_spark.conf import build_spark\n"
             "from sanskrit_ocr_spark.datagen.pages import pages_df\n"
             "spark = build_spark(app='gen', master='local[32]',\n"
             "                    extra={'spark.ui.enabled': 'false'})\n"
             f"pages_df(spark, {args.rows}, n_partitions=64)"
             f".write.mode('overwrite').parquet({pages_path!r})\n"
             "spark.stop()"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        if gen.returncode != 0:
            sys.stderr.write(gen.stderr)
            return 1

        r8 = run_at(8, pages_path)
        r32 = run_at(32, pages_path)
        eff = round((r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0, 3)
        result = {"N_cores": r8, "fourN_cores": r32,
                  "scaling_efficiency": eff, "target": 0.8,
                  "pass": eff >= 0.8}
        print(json.dumps(result, indent=2))
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
