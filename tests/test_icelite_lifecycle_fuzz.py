"""Randomized table-lifecycle fuzz: interleave merge_on_key /
merge_upsert_mor / compact / expire_snapshots in random order and assert
after EVERY step that the table content equals a plain Python model —
the r5 review showed the bugs live in operation INTERACTIONS (seal ×
watermark, compact × extra_meta), not in single operations."""

import random

from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType, StructField, StructType, TimestampType,
)

SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("text", StringType(), False),
])


def _batch(spark, keys, tag, day):
    rows = [(f"https://ex.org/{k}", f"2025-07-{day:02d} 00:00:00",
             f"{tag}-{k}") for k in keys]
    return spark.createDataFrame(
        rows, "url string, warc_ts string, text string") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _check(t, model, step):
    got = {r["url"]: r["text"] for r in t.read().collect()}
    assert got == model, f"content diverged after step {step}"
    rc = t.row_count()
    assert rc is None or rc == len(model), f"row_count after {step}"
    h = t.history()
    assert h and h[0]["snapshot_id"] == t.snapshot_id()


def test_lifecycle_fuzz(spark, tmp_path):
    from sanskrit_ocr_spark.tables.icelite import IceliteTable

    for seed in (5, 23):
        rng = random.Random(seed)
        t = IceliteTable(spark, str(tmp_path / f"fz{seed}"), SCHEMA)
        model: dict = {}
        day = 1
        # seed batch so maintenance ops have something to chew on
        keys = list(range(30))
        t.merge_on_key(_batch(spark, keys, "v0", day), "url",
                       order_col="warc_ts")
        model.update({f"https://ex.org/{k}": f"v0-{k}" for k in keys})
        _check(t, model, "seed")

        for step in range(10):
            op = rng.choice(["merge", "merge", "mor", "mor",
                             "compact", "expire"])
            day = min(day + 1, 28)
            lo = rng.randrange(0, 50)
            ks = list(range(lo, lo + rng.randrange(1, 15)))
            tag = f"s{step}"
            if op == "merge":
                t.merge_on_key(_batch(spark, ks, tag, day), "url",
                               order_col="warc_ts")
                for k in ks:
                    model.setdefault(f"https://ex.org/{k}", f"{tag}-{k}")
            elif op == "mor":
                t.merge_upsert_mor(_batch(spark, ks, tag, day), "url",
                                   order_col="warc_ts")
                for k in ks:
                    model[f"https://ex.org/{k}"] = f"{tag}-{k}"
            elif op == "compact":
                t.compact(target_partitions=rng.choice([1, 2, 4]))
            else:
                t.expire_snapshots(keep_last=rng.choice([1, 2, 3]))
            _check(t, model, f"{seed}/{step}:{op}")

def test_lifecycle_fuzz_bucket_layout(spark, tmp_path):
    """Same op-interleaving fuzz over a bucket-layout table (r6): every
    merge runs bucket-pruned against the committed side, maintenance
    must rewrite under the layout, and after every step a
    bucket-restricted read must partition the table exactly."""
    from sanskrit_ocr_spark.tables.icelite import IceliteTable

    n_buckets = 4
    for seed in (11,):
        rng = random.Random(seed)
        t = IceliteTable(spark, str(tmp_path / f"bfz{seed}"), SCHEMA,
                        bucket=("url", n_buckets))
        model: dict = {}
        day = 1
        keys = list(range(30))
        t.merge_on_key(_batch(spark, keys, "v0", day), "url",
                       order_col="warc_ts")
        model.update({f"https://ex.org/{k}": f"v0-{k}" for k in keys})
        _check(t, model, "seed")

        for step in range(10):
            op = rng.choice(["merge", "merge", "mor", "mor",
                             "compact", "expire"])
            day = min(day + 1, 28)
            lo = rng.randrange(0, 50)
            ks = list(range(lo, lo + rng.randrange(1, 15)))
            tag = f"s{step}"
            if op == "merge":
                t.merge_on_key(_batch(spark, ks, tag, day), "url",
                               order_col="warc_ts")
                for k in ks:
                    model.setdefault(f"https://ex.org/{k}", f"{tag}-{k}")
            elif op == "mor":
                t.merge_upsert_mor(_batch(spark, ks, tag, day), "url",
                                   order_col="warc_ts")
                for k in ks:
                    model[f"https://ex.org/{k}"] = f"{tag}-{k}"
            elif op == "compact":
                t.compact(target_partitions=rng.choice([1, 2]))
            else:
                t.expire_snapshots(keep_last=rng.choice([1, 2, 3]))
            _check(t, model, f"b{seed}/{step}:{op}")
            # bucket-restricted reads partition the table: each key
            # appears in exactly the bucket its hash selects
            per_bucket = [
                {r["url"] for r in t.read(buckets=[b]).collect()}
                for b in range(n_buckets)]
            union = set().union(*per_bucket)
            assert union == set(model), f"bucket union b{seed}/{step}"
            assert sum(len(s) for s in per_bucket) == len(model), \
                f"bucket overlap b{seed}/{step}"
