"""Operator library — the driver-contract queries.

Each submodule exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → equivalent DuckDB SQL, omitted for ops
that aren't SQL-expressible). ``registry()`` merges them all;
``__spark_entry__.py`` re-exports that merge as the driver contract.

Naming convention follows SURVEY.md §2 operator ids (p1=content filter,
d1=first-wins dedup, j3=resume anti-join, …) plus the training-data-pipeline
extras (dedup_*, ann_*, ts_* text stats, mm_* multimodal).
"""

from __future__ import annotations


def registry() -> tuple[dict, dict]:
    # Insertion order is the driver's check order (it scores the first 50
    # queries() entries): multimodal/ANN/dedup lead so the whole
    # training-data family sits inside the window; with the r4
    # consolidation (and the r6 j1→x7 / p5→x8 rotations) the registry
    # holds exactly 50 entries (44 here + the six flagship x* queries
    # __spark_entry__ prepends), so every entry gets a driver
    # CORRECTNESS row.
    from sanskrit_ocr_spark.ops import dedup, multimodal, relational, simsearch, textstats

    queries: dict = {}
    oracles: dict = {}
    for mod in (multimodal, simsearch, dedup, textstats, relational):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
