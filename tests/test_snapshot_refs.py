"""r6: named snapshot refs (Iceberg tags) + timestamp time travel —
every commit records ``committed_at_ms``; ``snapshot_as_of`` resolves
``TIMESTAMP AS OF`` reads; tags pin snapshots by name, readers
time-travel via ``read(tag=...)``, and ``expire_snapshots`` never drops
a tagged snapshot (prefix-shaped retention clamps at the oldest tag)."""

import time

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA = StructType([
    StructField("k", LongType(), False),
    StructField("v", StringType(), False),
])


def _append(spark, t, lo, hi, tag):
    t.append(spark.createDataFrame(
        [(i, f"{tag}-{i}") for i in range(lo, hi)], SCHEMA))


def test_commit_timestamps_and_as_of(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "asof"), SCHEMA)
    t0 = int(time.time() * 1000) - 1
    _append(spark, t, 0, 10, "a")        # sid 1
    time.sleep(0.05)
    mid = int(time.time() * 1000)
    time.sleep(0.05)
    _append(spark, t, 10, 20, "b")       # sid 2

    h = t.history()
    assert [r["snapshot_id"] for r in h] == [2, 1]
    assert all(r["committed_at_ms"] >= t0 for r in h)
    assert h[0]["committed_at_ms"] >= h[1]["committed_at_ms"]

    assert t.snapshot_as_of(mid) == 1
    assert t.read(t.snapshot_as_of(mid)).count() == 10
    assert t.snapshot_as_of(int(time.time() * 1000)) == 2
    from datetime import datetime
    assert t.snapshot_as_of(datetime.fromtimestamp(mid / 1000)) == 1
    with pytest.raises(ValueError):
        t.snapshot_as_of(t0 - 10_000)


def test_tag_roundtrip_and_read_by_tag(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "tags"), SCHEMA)
    _append(spark, t, 0, 5, "a")
    t.tag("v1")                          # defaults to HEAD
    _append(spark, t, 5, 12, "b")
    t.tag("v2", snapshot_id=2)

    assert t.tags() == {"v1": 1, "v2": 2}
    assert t.ref("v1") == 1
    assert t.read(tag="v1").count() == 5
    assert t.read(tag="v2").count() == 12
    with pytest.raises(ValueError):
        t.read(snapshot_id=1, tag="v1")  # mutually exclusive
    with pytest.raises(KeyError):
        t.ref("nope")
    with pytest.raises(ValueError):
        t.tag("v1")                      # exists, overwrite not set
    t.tag("v1", snapshot_id=2, overwrite=True)
    assert t.ref("v1") == 2
    with pytest.raises(ValueError):
        t.tag("bad/name")
    with pytest.raises(ValueError):
        t.tag("ghost", snapshot_id=99)   # no such snapshot
    t.drop_tag("v2")
    assert "v2" not in t.tags()
    with pytest.raises(KeyError):
        t.drop_tag("v2")


def test_expiry_retains_tagged_prefix(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "keep"), SCHEMA)
    for i in range(6):                   # sids 1..6
        _append(spark, t, i * 5, i * 5 + 5, f"c{i}")
    t.tag("pinned", snapshot_id=2)

    expired = t.expire_snapshots(keep_last=1)
    # retention clamps at the oldest tag: only sid 1 expires
    assert expired == [1]
    assert t.read(tag="pinned").count() == 10
    assert t.read().count() == 30

    # dropping the tag releases the history on the next expiry
    t.drop_tag("pinned")
    expired = t.expire_snapshots(keep_last=1)
    assert 2 in expired and 5 in expired
    assert t.read().count() == 30


def test_timestamps_survive_seal_and_maintenance(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "seal"), SCHEMA)
    _append(spark, t, 0, 8, "a")         # sid 1
    ts1 = t._manifest(1)["committed_at_ms"]
    time.sleep(0.05)
    _append(spark, t, 8, 16, "b")        # sid 2
    _append(spark, t, 16, 24, "c")       # sid 3
    t.expire_snapshots(keep_last=3)      # no-op window, then force a seal
    t.expire_snapshots(keep_last=2)      # seals sid 2
    m2 = t._manifest(2)
    assert m2.get("sealed") and "committed_at_ms" in m2
    # sealed snapshot keeps its ORIGINAL commit time (the seal is a
    # rewrite of an existing snapshot, not a new commit)
    assert m2["committed_at_ms"] >= ts1
    assert t.snapshot_as_of(int(time.time() * 1000)) == 3
    # children never inherit the parent's timestamp
    assert t._manifest(3)["committed_at_ms"] >= m2["committed_at_ms"]
