"""icelite — a minimal snapshot/commit table layer over parquet.

This sandbox ships no Iceberg runtime jars, so the Iceberg discipline the
north_rule requires (snapshot isolation, atomic commits, MERGE-on-url
idempotent resume) is provided by this small, self-contained layer with the
same *semantics*, behind one interface. On a real cluster the class is a
drop-in seam: replace with ``spark.read.format("iceberg")`` /
``df.writeTo(...).append()`` / ``MERGE INTO`` — every call site keeps its
shape.

Layout on disk::

    <root>/
      data/commit-<n>/part-*.parquet     one directory per commit
      _icelite/commits/<n>.json          manifest: cumulative file list
      _icelite/HEAD                      current snapshot id (atomic rename)

Commit protocol (optimistically concurrent, crash-safe):

1. write data files to ``data/commit-<n>/`` (invisible until committed);
2. create ``_icelite/commits/<n>.json`` EXCLUSIVELY, listing parent +
   cumulative files — a concurrent writer that already took snapshot
   ``n`` makes this raise ``ConcurrentCommitError`` (Iceberg's
   optimistic-concurrency contract: the loser retries from the new HEAD,
   nothing is clobbered);
3. atomically rename a temp HEAD → ``_icelite/HEAD``.

A crash between any steps leaves HEAD pointing at the previous snapshot;
orphaned data directories are ignored by readers — exactly Iceberg's
"readers never see uncommitted files" contract. This is what makes the
kill-and-resume test (tests/test_icelite_resume.py) honest: re-running after
a mid-job kill re-extracts only pages whose url is absent from the last
*committed* snapshot (reference resume semantics,
``datagen/translate_bookcorpus.py:37-50`` — checkpoint = count of committed
sink rows — upgraded from offset-skip to key-based anti-join, SURVEY.md J3).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the same snapshot id first — the Iceberg
    optimistic-concurrency contract: the loser retries from the new HEAD
    instead of silently clobbering the manifest."""


class IceliteTable:
    """``partition_cols``: hive-style directory partitioning for every
    commit (the icelite analog of Iceberg's partition spec — e.g.
    ``["warc_day", "bucket"]`` gives the north_rule's range-on-time ×
    bucket-on-url layout, and Spark's scan prunes directories from
    partition-column predicates)."""

    def __init__(self, spark: SparkSession, root: str, schema: StructType,
                 partition_cols: list[str] | None = None):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.partition_cols = partition_cols or []
        os.makedirs(os.path.join(root, "_icelite", "commits"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- snapshot bookkeeping -------------------------------------------------
    def _head_path(self) -> str:
        return os.path.join(self.root, "_icelite", "HEAD")

    def snapshot_id(self) -> int:
        """Current committed snapshot id; 0 = empty table."""
        try:
            with open(self._head_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest(self, sid: int) -> dict:
        with open(os.path.join(self.root, "_icelite", "commits",
                               f"{sid}.json")) as f:
            return json.load(f)

    def committed_files(self) -> list[str]:
        sid = self.snapshot_id()
        return self._manifest(sid)["files"] if sid else []

    # -- read -----------------------------------------------------------------
    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Read the table at HEAD, or time-travel to ``snapshot_id``
        (Iceberg ``VERSION AS OF`` semantics: a snapshot's file list is
        immutable, so old snapshots stay readable after later appends)."""
        sid = self.snapshot_id() if snapshot_id is None else snapshot_id
        files = self._manifest(sid)["files"] if sid else []
        if not files:
            return self.spark.createDataFrame([], self.schema)
        if not self.partition_cols:
            return self.spark.read.schema(self.schema).parquet(*files)
        # partitioned layout: "files" are commit directories; basePath per
        # commit recovers hive partition columns, and Spark's scan prunes
        # directories from predicates on them (PartitionFilters)
        parts = [
            self.spark.read.schema(self.schema)
            .option("basePath", d).parquet(d)
            for d in files
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def history(self) -> list[dict]:
        """Commit log, oldest first: [{snapshot_id, parent, n_files}]."""
        out = []
        sid = self.snapshot_id()
        while sid:
            m = self._manifest(sid)
            out.append({"snapshot_id": sid, "parent": m["parent"],
                        "n_files": len(m["files"])})
            sid = m["parent"]
        return list(reversed(out))

    # -- write ----------------------------------------------------------------
    def append(self, df: DataFrame) -> int:
        """Atomically append ``df``; returns the new snapshot id."""
        parent = self.snapshot_id()
        sid = parent + 1
        data_dir = os.path.join(self.root, "data", f"commit-{sid}")
        writer = df.write.mode("overwrite")
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(data_dir)
        if self.partition_cols:
            new_files = [data_dir]
        else:
            new_files = [
                os.path.join(data_dir, f)
                for f in os.listdir(data_dir)
                if f.endswith(".parquet")
            ]
        files = (self._manifest(parent)["files"] if parent else []) + sorted(new_files)
        manifest = {"snapshot_id": sid, "parent": parent, "files": files}
        self._commit_manifest(sid, manifest)
        return sid

    def _commit_manifest(self, sid: int, manifest: dict) -> None:
        """Optimistic commit: the manifest file is created EXCLUSIVELY —
        if another writer already committed this snapshot id, raise
        ``ConcurrentCommitError`` (caller re-reads HEAD and retries)
        instead of clobbering its manifest. Then swing HEAD atomically."""
        mpath = os.path.join(self.root, "_icelite", "commits", f"{sid}.json")
        try:
            with open(mpath, "x") as f:
                json.dump(manifest, f)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"snapshot {sid} already committed by another writer")
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "_icelite"))
        with os.fdopen(fd, "w") as f:
            f.write(str(sid))
        os.replace(tmp, self._head_path())

    def merge_on_key(self, df: DataFrame, key: str,
                     order_col: str | None = None) -> tuple[int, int]:
        """``MERGE INTO t USING df ON t.key = df.key WHEN NOT MATCHED THEN
        INSERT`` — the idempotent-resume checkpoint (north_rule; SURVEY.md J3).

        Within-batch duplicate keys are resolved first-wins by ``order_col``
        (deterministic — the reference's stream-order first-wins semantics,
        h5_to_parquet.py:45-48, made key-based). The anti-join's broadcast vs
        sort-merge choice is left to AQE.

        The inserted-row count comes from an ``Observation`` on the write
        job itself — ONE job per merge, not a count() pass followed by a
        recomputation of the anti-join for the write.

        Concurrency: on ``ConcurrentCommitError`` the merge retries from
        the NEW committed HEAD — the anti-join is re-derived against the
        winner's snapshot, so retried merges stay idempotent per key
        (Iceberg's MERGE retry semantics).
        """
        from pyspark.sql import Observation

        if order_col:
            # hash-first window key (cheap 8-byte comparisons; the key
            # column itself remains in the partition for collision safety)
            w = Window.partitionBy(F.xxhash64(key), key) \
                      .orderBy(F.col(order_col).asc(), F.col(key).asc())
            df = (df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1).drop("__rn"))
        else:
            df = df.dropDuplicates([key])
        last_err: ConcurrentCommitError | None = None
        for _ in range(3):
            existing = self.read().select(key)
            obs = Observation()
            fresh = (df.join(existing, key, "left_anti")
                     .observe(obs, F.count(F.lit(1)).alias("inserted")))
            try:
                sid = self.append(fresh)
            except ConcurrentCommitError as e:
                last_err = e
                continue
            return sid, int(obs.get["inserted"])
        raise last_err  # type: ignore[misc]

    # -- maintenance ------------------------------------------------------------
    def compact(self, target_partitions: int = 8) -> int:
        """Rewrite the current snapshot into ``target_partitions`` files
        (Iceberg ``rewrite_data_files`` analog — incremental appends
        accumulate small files; at web scale the scan's split planning
        drowns in them). The new snapshot REPLACES the file list; older
        snapshots keep reading their own immutable files."""
        parent = self.snapshot_id()
        sid = parent + 1
        data_dir = os.path.join(self.root, "data", f"commit-{sid}")
        current = self.read()
        writer = (current.repartition(target_partitions)
                  .write.mode("overwrite"))
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(data_dir)
        if self.partition_cols:
            files = [data_dir]
        else:
            files = sorted(
                os.path.join(data_dir, f)
                for f in os.listdir(data_dir) if f.endswith(".parquet"))
        manifest = {"snapshot_id": sid, "parent": parent, "files": files,
                    "compacted": True}
        self._commit_manifest(sid, manifest)
        return sid

    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """Drop manifests (and data files referenced by NO retained
        snapshot) older than the last ``keep_last`` snapshots. Returns the
        expired snapshot ids. Time travel to expired ids stops working —
        exactly Iceberg's ``expire_snapshots`` contract."""
        head = self.snapshot_id()
        retained = set(range(max(1, head - keep_last + 1), head + 1))
        keep_files: set[str] = set()
        for sid in retained:
            keep_files.update(self._manifest(sid)["files"])
        expired = []
        for sid in range(1, max(1, head - keep_last + 1)):
            mpath = os.path.join(self.root, "_icelite", "commits",
                                 f"{sid}.json")
            if not os.path.exists(mpath):
                continue
            for f in self._manifest(sid)["files"]:
                if f not in keep_files and os.path.exists(f):
                    if os.path.isdir(f):
                        import shutil
                        shutil.rmtree(f, ignore_errors=True)
                    else:
                        os.remove(f)
            os.remove(mpath)
            expired.append(sid)
        return expired
