"""r6: write-audit-publish — ``rollback_to`` (the reject arm), branch
refs (the publish pointer), and the extraction job's audit gate.

Contract under test: with ``audit_max_fail_rate``/``publish_branch``
set, a committed-but-unaudited snapshot is STAGING — a breach erases it
(snapshot ids are reused safely, data reclaimed), an accept
fast-forwards the branch, and consumers bounded at the branch
(``read(branch=...)``, ``curate_table(to_sid=...)``) never observe a
staged commit. Crash between commit and publish heals on the next run.
"""

import json
import os

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sanskrit_ocr_spark.datagen.pages import pages_df
from sanskrit_ocr_spark.extract.job import extracted_table, run_extraction
from sanskrit_ocr_spark.tables.icelite import IceliteTable

SCHEMA = StructType([
    StructField("k", LongType(), False),
    StructField("v", StringType(), False),
])


def _append(spark, t, lo, hi, tag):
    t.append(spark.createDataFrame(
        [(i, f"{tag}-{i}") for i in range(lo, hi)], SCHEMA))


# -- rollback_to -------------------------------------------------------------

def test_rollback_basic_and_id_reuse(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "rb"), SCHEMA)
    _append(spark, t, 0, 5, "a")     # sid 1
    _append(spark, t, 5, 9, "b")     # sid 2
    _append(spark, t, 9, 12, "c")    # sid 3
    n_dirs_before = len(os.listdir(tmp_path / "rb" / "data"))

    assert t.rollback_to(3) == []    # already at HEAD: no-op
    assert t.rollback_to(2) == [3]
    assert t.snapshot_id() == 2
    assert t.read().count() == 9
    assert not os.path.exists(
        tmp_path / "rb" / "_icelite" / "commits" / "3.json")
    # dropped commit's data was reclaimed (remove_orphans inside)
    assert len(os.listdir(tmp_path / "rb" / "data")) < n_dirs_before

    # sid 3 is REUSED without an exclusive-create collision, and the
    # fresh commit's content (not the rolled-back one) is what reads see
    _append(spark, t, 100, 104, "d")
    assert t.snapshot_id() == 3
    vals = {r["v"] for r in t.read().collect()}
    assert "d-100" in vals and "c-9" not in vals
    assert t.read().count() == 13


def test_rollback_validation(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "rv"), SCHEMA)
    _append(spark, t, 0, 3, "a")
    _append(spark, t, 3, 6, "b")
    with pytest.raises(ValueError):
        t.rollback_to(9)             # not an ancestor
    with pytest.raises(ValueError):
        t.rollback_to(-1)
    t.tag("keep", snapshot_id=2)
    with pytest.raises(ValueError):  # ref above the target would dangle
        t.rollback_to(1)
    t.drop_tag("keep")
    assert t.rollback_to(1) == [2]
    assert t.read().count() == 3
    # rollback to 0 empties the table
    assert t.rollback_to(0) == [1]
    assert t.snapshot_id() == 0
    assert t.read().count() == 0


def test_rollback_crash_recovery_via_intent_journal(spark, tmp_path):
    root = str(tmp_path / "rc")
    t = IceliteTable(spark, root, SCHEMA)
    _append(spark, t, 0, 4, "a")     # sid 1
    _append(spark, t, 4, 7, "b")     # sid 2
    # simulate a rollback that journaled its intent and died before
    # completing: manifests above the target still linger
    with open(os.path.join(root, "_icelite", "ROLLBACK"), "w") as f:
        json.dump({"target": 1}, f)
    # ANY fresh handle heals before trusting HEAD
    t2 = IceliteTable(spark, root, SCHEMA)
    assert not os.path.exists(
        os.path.join(root, "_icelite", "ROLLBACK"))
    assert t2.snapshot_id() == 1
    assert t2.read().count() == 4
    assert not os.path.exists(
        os.path.join(root, "_icelite", "commits", "2.json"))
    _append(spark, t2, 100, 102, "c")   # reused id commits cleanly
    assert t2.snapshot_id() == 2
    assert t2.read().count() == 6


# -- branches ----------------------------------------------------------------

def test_branch_refs(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "br"), SCHEMA)
    _append(spark, t, 0, 4, "a")     # sid 1
    assert t.set_branch("published") == 1
    _append(spark, t, 4, 10, "b")    # sid 2
    # branch is a pinned view until moved
    assert t.read(branch="published").count() == 4
    assert t.set_branch("published") == 2          # fast-forward to HEAD
    assert t.read(branch="published").count() == 10
    assert t.branches() == {"published": 2}
    assert t.tags() == {}                          # kinds don't mix
    t.tag("v1", snapshot_id=1)
    assert t.tags() == {"v1": 1}
    with pytest.raises(ValueError):
        t.set_branch("v1")           # tag name is not movable
    with pytest.raises(ValueError):
        t.tag("published", snapshot_id=1, overwrite=True)
    with pytest.raises(ValueError):
        t.read(tag="v1", branch="published")
    t.drop_branch("published")
    assert t.branches() == {}


def test_expiry_protects_branch(spark, tmp_path):
    t = IceliteTable(spark, str(tmp_path / "bx"), SCHEMA)
    for i in range(5):               # sids 1..5
        _append(spark, t, i * 3, i * 3 + 3, f"c{i}")
    t.set_branch("published", snapshot_id=3)
    t.expire_snapshots(keep_last=1)
    # prefix up to the branch survives
    assert os.path.exists(
        tmp_path / "bx" / "_icelite" / "commits" / "3.json")
    assert t.read(branch="published").count() == 9
    t.set_branch("published", snapshot_id=5)
    t.expire_snapshots(keep_last=1)
    assert not os.path.exists(
        tmp_path / "bx" / "_icelite" / "commits" / "3.json")


# -- the extraction job's audit gate ------------------------------------------

def test_audit_rejects_bad_batch(spark, tmp_path):
    root = str(tmp_path / "gate")
    # the seeded corpus has a 7% failure rate (7 non-OK per 100-row
    # block) — a 1% gate must reject and leave the table EMPTY
    res = run_extraction(spark, pages_df(spark, 100), root,
                         audit_max_fail_rate=0.01,
                         publish_branch="published")
    assert res["audit"]["accepted"] is False
    assert res["audit"]["rolled_back_to"] == 0
    assert res["snapshot_id"] == 0 and res["inserted"] == 0
    # nothing silently dropped: the tallies of the rejected batch travel
    assert res["audit"]["batch_tallies"]["OK"] == 93
    assert res["audit"]["fail_rate"] == pytest.approx(0.07)
    ext = extracted_table(spark, root)
    assert ext.snapshot_id() == 0
    assert ext.read().count() == 0
    assert ext.branches() == {}      # nothing was ever published


def test_audit_accepts_and_publishes(spark, tmp_path):
    root = str(tmp_path / "ok")
    res = run_extraction(spark, pages_df(spark, 100), root,
                         audit_max_fail_rate=0.2,
                         publish_branch="published")
    assert res["audit"]["accepted"] is True
    assert res["audit"]["published"] == res["snapshot_id"]
    ext = extracted_table(spark, root)
    assert ext.branches()["published"] == ext.snapshot_id()
    assert ext.read(branch="published").count() == 98
    # lineage recorded for the ACCEPTED snapshot
    from sanskrit_ocr_spark.extract.job import lineage_table
    lin = lineage_table(spark, root).read()
    assert lin.filter(
        lin.snapshot_id == res["snapshot_id"]).count() > 0


def test_unpublished_staging_discarded_on_next_audited_run(spark, tmp_path):
    root = str(tmp_path / "heal")
    # published baseline: 100 pages accepted
    run_extraction(spark, pages_df(spark, 100), root,
                   audit_max_fail_rate=0.2, publish_branch="published")
    ext = extracted_table(spark, root)
    published = ext.branches()["published"]
    # an audit-less writer (or a crash between commit and publish)
    # leaves a staged commit above the branch
    run_extraction(spark, pages_df(spark, 200), root)
    assert ext.snapshot_id() > published
    assert ext.read().count() == 196
    # the next audited run discards the unaudited staging FIRST, then
    # re-extracts the missing pages and publishes — the branch is the
    # source of truth, and nothing is lost: the rolled-back urls are
    # re-extracted from the input
    res = run_extraction(spark, pages_df(spark, 200), root,
                         audit_max_fail_rate=0.2,
                         publish_branch="published")
    assert res["audit"]["accepted"] is True
    assert res["inserted"] == 98     # exactly the beyond-baseline urls
    assert ext.branches()["published"] == ext.snapshot_id()
    assert ext.read(branch="published").count() == 196


def test_rejected_batch_never_reaches_curation(spark, tmp_path):
    from sanskrit_ocr_spark.extract.curate import curate_table
    root = str(tmp_path / "cur")
    corpus_root = str(tmp_path / "corpus")
    run_extraction(spark, pages_df(spark, 100), root,
                   audit_max_fail_rate=0.2, publish_branch="published")
    ext = extracted_table(spark, root)
    pub = ext.branches()["published"]
    s1 = curate_table(spark, corpus_root, ext, to_sid=pub)
    assert s1["inserted"] > 0
    # a staged, unaudited commit sits above the branch; curation bounded
    # at the branch must not consume it
    run_extraction(spark, pages_df(spark, 200), root)
    assert ext.snapshot_id() > pub
    s2 = curate_table(spark, corpus_root, ext,
                      to_sid=ext.branches()["published"])
    assert s2["inserted"] == 0
    assert s2["corpus_total"] == s1["corpus_total"]


def test_rollback_refuses_to_cross_spec_changes(spark, tmp_path):
    """Partition-spec / sort-order changes live in a spec file BESIDE
    the manifest chain — rolling back across their marker commit would
    leave the file asserting a spec the retained history never
    declared. Refused; rollback to/above the marker still works."""
    schema = StructType([
        StructField("k", LongType(), False),
        StructField("day", StringType(), False),
    ])
    t = IceliteTable(spark, str(tmp_path / "rspec"), schema)
    t.append(spark.createDataFrame([(1, "d0"), (2, "d1")], schema))  # 1
    t.evolve_partition_spec(["day"])                                 # 2
    t.append(spark.createDataFrame([(3, "d0")], schema))             # 3
    with pytest.raises(ValueError):
        t.rollback_to(1)            # would cross the evolution commit
    assert t.rollback_to(2) == [3]  # rollback TO the marker is fine
    assert t.read().count() == 2
    assert t.partition_cols == ["day"]

    t2 = IceliteTable(spark, str(tmp_path / "rsort"), schema)
    t2.append(spark.createDataFrame([(1, "d0")], schema))            # 1
    t2.replace_sort_order(["k"])                                     # 2
    t2.append(spark.createDataFrame([(2, "d1")], schema))            # 3
    with pytest.raises(ValueError):
        t2.rollback_to(1)
    assert t2.rollback_to(2) == [3]
    assert t2.sort_cols == ["k"]
