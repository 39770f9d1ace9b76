"""Shuffle-width independence: every keyed/window/iterative operator must
produce IDENTICAL results regardless of spark.sql.shuffle.partitions —
the property that makes the plans safe to retune at 100 TB. Catches
accidental order-dependence (e.g. a window missing a total order, or an
aggregation leaking partition order into output values)."""

import pytest

from sanskrit_ocr_spark.ops.dedup import (
    dedup_cluster_cc,
    dedup_minhash_lsh,
    dedup_paragraphs,
    release_caches,
)
from sanskrit_ocr_spark.ops.textstats import (
    ts_mix_sample,
    ts_seq_pack,
    x5_web_curate,
)

SF = "/root/testdata/sf0.001"

OPS = {
    "dedup_paragraphs": dedup_paragraphs,
    "dedup_cluster_cc": dedup_cluster_cc,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "ts_seq_pack": ts_seq_pack,
    "ts_mix_sample": ts_mix_sample,
    "x5_web_curate": x5_web_curate,
}


def _rows(spark, fn):
    df = fn(spark, SF)
    cols = sorted(df.columns)
    out = sorted(tuple(r[c] for c in cols) for r in df.collect())
    release_caches()
    return out


@pytest.mark.parametrize("name", sorted(OPS))
def test_shuffle_width_independent(spark, name):
    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "3")
        narrow = _rows(spark, OPS[name])
        spark.conf.set(key, "29")
        wide = _rows(spark, OPS[name])
    finally:
        spark.conf.set(key, orig)
    assert narrow == wide
    assert len(narrow) > 0
