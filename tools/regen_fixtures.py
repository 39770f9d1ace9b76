#!/usr/bin/env python
"""Regenerate the committed golden fixtures under tests/fixtures/.

Run this IN THE SAME COMMIT as any intentional change to extraction
semantics (kernels/, datagen/pages.py) and say why in the commit message —
the fixtures pin byte-identity (BASELINE.json input_hint: "byte-identical
extracted text per url").

Fixtures:

* ``golden_extracted_300.parquet`` — pure-kernel outputs for the first 300
  synthetic pages (no Spark; tests/test_golden_fixture.py).
* ``golden_x1_500.parquet`` / ``golden_x2_500.parquet`` — expected outputs
  of the ``x1_extract_pages`` / ``x2_lineage`` driver queries (Spark run at
  500 pages); used as the DuckDB oracle side for those queries, and pinned
  by tests/test_extract_spark.py.
"""

from __future__ import annotations

import json
import os
import sys

import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(ROOT, "tests", "fixtures")
sys.path.insert(0, ROOT)


def regen_kernel_golden() -> None:
    from sanskrit_ocr_spark.datagen.pages import pages_pandas
    from sanskrit_ocr_spark.kernels.page import extract_page

    rows, seen = [], set()
    for _, r in pages_pandas(0, 300).iterrows():
        if r["url"] in seen:  # duplicate-url rows: first wins, like MERGE
            continue
        seen.add(r["url"])
        t, sp, n, st = extract_page(r["html"])
        rows.append({
            "url": r["url"],
            "text": t,
            "sentences_json": json.dumps(
                [{"start": a, "end": b} for a, b in sp]),
            "n_graphemes": n,
            "status": st,
        })
    out = os.path.join(FIXDIR, "golden_extracted_300.parquet")
    pd.DataFrame(rows).to_parquet(out, index=False)
    print(f"wrote {out} ({len(rows)} rows)")


def regen_realhtml_golden() -> None:
    """Golden outputs for the committed real-world-style HTML pages
    (tests/fixtures/realhtml/*.html) — charset sniffing, markup recovery,
    suppressed containers and the Devanagari content filter pinned beyond
    the synthetic generator's distribution."""
    from sanskrit_ocr_spark.kernels.page import extract_page

    src = os.path.join(FIXDIR, "realhtml")
    rows = []
    for name in sorted(os.listdir(src)):
        if not name.endswith(".html"):
            continue
        with open(os.path.join(src, name), "rb") as f:
            t, sp, n, st = extract_page(f.read())
        rows.append({
            "file": name,
            "text": t,
            "sentences_json": json.dumps(
                [{"start": a, "end": b} for a, b in sp]),
            "n_graphemes": n,
            "status": st,
        })
    out = os.path.join(FIXDIR, "golden_realhtml.parquet")
    pd.DataFrame(rows).to_parquet(out, index=False)
    print(f"wrote {out} ({len(rows)} rows)")


def regen_driver_golden() -> None:
    from sanskrit_ocr_spark.conf import build_spark
    import __spark_entry__ as entrymod

    spark = build_spark(app="regen-fixtures", master="local[8]",
                        shuffle_partitions=8,
                        extra={"spark.ui.enabled": "false"})
    try:
        q = entrymod.queries()
        for name, fname in [("x1_extract_pages", "golden_x1_500.parquet"),
                            ("x2_lineage", "golden_x2_500.parquet"),
                            ("x3_curate_corpus", "golden_x3_500.parquet"),
                            ("x6_pipeline_curate", "golden_x6_500.parquet")]:
            pdf = q[name](spark, "unused-sf-dir").toPandas()
            out = os.path.join(FIXDIR, fname)
            pdf.to_parquet(out, index=False)
            print(f"wrote {out} ({len(pdf)} rows)")
        # multimodal decode + deterministic-value probabilistic queries
        # (minhash/simhash/LSH/IVF: approximate in recall, deterministic in
        # value — seeded hashes/planes over fixed testdata), pinned at the
        # driver's sf0.01 scale
        for name, fname in [
                ("mm_feature_extract", "golden_mm_features_sf001.parquet"),
                ("mm_resize", "golden_mm_resize_sf001.parquet"),
                ("mm_frame_sample", "golden_mm_frames_sf001.parquet"),
                ("mm_phash_dedup", "golden_mm_phash_sf001.parquet"),
                ("dedup_minhash_lsh", "golden_minhash_lsh_sf001.parquet"),
                ("dedup_simhash", "golden_simhash_sf001.parquet"),
                ("ann_lsh_topk", "golden_ann_lsh_sf001.parquet"),
                ("ann_ivf_topk", "golden_ann_ivf_sf001.parquet")]:
            pdf = q[name](spark, "/root/testdata/sf0.01").toPandas()
            out = os.path.join(FIXDIR, fname)
            pdf.to_parquet(out, index=False)
            print(f"wrote {out} ({len(pdf)} rows)")
    finally:
        spark.stop()


if __name__ == "__main__":
    regen_kernel_golden()
    regen_realhtml_golden()
    regen_driver_golden()
