"""``icelite`` Structured Streaming source — a Spark 4 Python Data
Source (``pyspark.sql.datasource``) that streams an icelite table's
COMMITS as micro-batches, the Iceberg Spark-streaming-read analog:

    from sanskrit_ocr_spark.streaming.source import IceliteDataSource
    spark.dataSource.register(IceliteDataSource)
    df = (spark.readStream.format("icelite")
          .option("path", table_root).load())

* Offsets are snapshot ids: each micro-batch reads exactly the data
  files ADDED by commits in ``(start, end]``, straight from the delta
  manifests — O(new data) per batch, never a table diff. The
  checkpoint + deterministic offset ranges give the standard
  Structured Streaming exactly-once replay contract downstream.
* ``latestOffset`` / ``partitions`` run on the DRIVER against manifest
  JSON only (no Spark jobs); ``read`` runs on EXECUTORS and yields
  Arrow record batches straight out of the parquet files (zero-copy
  into Spark, one InputPartition per data file so a big commit fans
  out across the cluster).
* Append-only contract (same as Iceberg's streaming read): a
  merge-on-read equality delete inside a batch range FAILS the stream
  by default (the stream cannot represent a retraction);
  ``.option("skipDeletes", "true")`` turns the stream into the
  insert-event log instead (every committed row version exactly once —
  downstream keyed MERGEs make that the last-writer-wins view).
  Ranges that crossed a compaction/seal fail with the same
  ``ValueError`` as ``read_changes`` — per-commit provenance is gone
  there; restart the stream from a fresh checkpoint.
* ``.option("changelog", "true")`` — streaming CDC (the
  ``read_changelog`` semantics as a live feed): every row gains
  ``_change_type`` (``'insert'`` | ``'delete'``) and ``_commit_sid``;
  in-range equality deletes emit full pre-image ``delete`` events at
  the EARLIEST delete that applies, so a downstream incremental
  aggregate stays exact under re-crawls. Delete micro-batches scan
  the data visible at the end offset against the (small,
  O(recrawl-batch)) delete-key schedule shipped inside each
  partition; the per-file fate lookup is one pandas dict-map, no
  joins. Mutually exclusive with ``skipDeletes``.
* ``.option("starting", "latest")`` begins at the current head
  (default ``earliest`` = snapshot 0, i.e. the whole table history
  first, then the live tail).

Hive-partitioned icelite layouts are rejected at stream start (their
partition values live in directory names, not the files; the batch
ingest path covers them) — the synthetic ``__bucket`` level of
bucket-layout tables is fine (the key column itself is stored in the
files).

Known limitation: no per-trigger rate limit (Iceberg/Delta's
``maxFilesPerTrigger``). The Spark 4 Python Data Source API exposes no
admission control — ``latestOffset()`` takes no start offset, so a
reader-side cap could return an offset BELOW a restored checkpoint
after restart and corrupt the range. Until the API grows admission
control, a backfill over deep history arrives as one large (but still
one-partition-per-file, fully parallel) micro-batch; bound it by
starting the stream at ``starting=latest`` and batch-ingesting the
history once.

Schema: user-provided via ``.schema(...)``, else derived on the driver
from the manifest chain's recorded schema (schema-evolved tables) or
the newest data file's parquet footer. Files written before a schema
evolution lack the later columns; ``read`` fills them with typed nulls
(the same name-based resolution contract as ``IceliteTable.read``).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_BATCH_ROWS = 8192


def _offline_handle(root: str):
    """Driver-side metadata-only IceliteTable handle (no SparkSession:
    only manifest/footer helpers are used)."""
    from sanskrit_ocr_spark.tables.icelite import IceliteTable

    if not os.path.isdir(os.path.join(root, "_icelite")):
        raise ValueError(f"no icelite table at {root}")
    return IceliteTable(None, root, StructType([]))


def _offline_schema(root: str) -> StructType:
    """Current table schema without a SparkSession: the manifest
    chain's recorded schema when present (exact across evolution),
    else the newest data file's parquet footer."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    t = _offline_handle(root)
    head = t.snapshot_id()
    cur = head
    while cur:
        m = t._manifest(cur)
        if "schema" in m:
            return t.schema_at(head)
        cur = m.get("parent", 0)
    for entry in reversed(t.files_at(head)):
        for p in reversed(t._parquet_under(entry)):
            return from_arrow_schema(pq.read_schema(p))
    raise ValueError(
        f"cannot derive a schema for the empty table at {root}; "
        "pass one with .schema(...)")


class _FilesPartition(InputPartition):
    """``mode='insert'``: emit the file's rows (``csid`` stamps
    ``_commit_sid`` in changelog mode). ``mode='delete'``: emit the
    file's rows whose fate (earliest delete sid newer than ``csid`` in
    ``schedule``) lands in ``(start, end]`` — full pre-images."""

    def __init__(self, files: list[str], mode: str = "insert",
                 csid: int = 0, key: str | None = None,
                 schedule: dict | None = None,
                 rng: tuple[int, int] | None = None):
        self.files = files
        self.mode = mode
        self.csid = csid
        self.key = key
        self.schedule = schedule
        self.rng = rng


class _IceliteStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        root = options.get("path")
        if not root:
            raise ValueError("the icelite source requires .option('path', "
                             "<table root>)")
        self.root = root
        t = _offline_handle(root)
        part_cols = t.stored_partition_cols(root)
        if part_cols:
            raise ValueError(
                f"table at {root} uses the hive layout {part_cols}; the "
                "streaming source supports flat/bucket layouts only")
        self.skip_deletes = str(
            options.get("skipDeletes", options.get("skipdeletes",
                                                   "false"))).lower() == "true"
        self.changelog = str(
            options.get("changelog", "false")).lower() == "true"
        if self.changelog and self.skip_deletes:
            raise ValueError(
                "changelog and skipDeletes are mutually exclusive: CDC "
                "mode REPRESENTS deletes, skipDeletes drops them")
        starting = str(options.get("starting", "earliest")).lower()
        if starting not in ("earliest", "latest"):
            raise ValueError("starting must be 'earliest' or 'latest'")
        self._initial = t.snapshot_id() if starting == "latest" else 0
        from pyspark.sql.pandas.types import to_arrow_schema

        self.arrow_schema = to_arrow_schema(schema)

    def _handle(self):
        return _offline_handle(self.root)

    def initialOffset(self) -> dict:
        return {"sid": self._initial}

    def latestOffset(self) -> dict:
        return {"sid": self._handle().snapshot_id()}

    def partitions(self, start: dict, end: dict):
        import pyarrow.parquet as pq

        t = self._handle()
        lo, hi = start["sid"], end["sid"]
        groups, range_deletes = t._range_walk(lo, hi)
        if range_deletes and not (self.skip_deletes or self.changelog):
            raise ValueError(
                f"commits ({lo}, {hi}] carry merge-on-read equality "
                "deletes; an append-only stream cannot represent the "
                "retraction — set .option('skipDeletes', 'true') for "
                "the insert-event log or .option('changelog', 'true') "
                "for CDC events")
        parts = [_FilesPartition([p], mode="insert", csid=csid)
                 for csid, fs in groups for entry in fs
                 for p in t._parquet_under(entry)]
        if self.changelog and range_deletes:
            # delete pre-images: ship the full pending delete schedule
            # (all deletes visible at the end offset — an earlier delete
            # decides a row died BEFORE this range) and scan every data
            # file it could kill. The schedule is O(recrawl batch): the
            # driver reads the small delete-key parquets once per batch,
            # exactly the frame read_changelog broadcasts.
            all_groups, all_deletes = t._groups_at(hi)
            if len({d["key"] for d in all_deletes}) > 1:
                raise ValueError(
                    "the changelog stream supports one delete key "
                    "column; this table has pending deletes on several")
            by_key: dict[str, dict] = {}
            for d in all_deletes:
                sched = by_key.setdefault(d["key"], {})
                for p in t._parquet_under(d["dir"]):
                    for v in pq.read_table(
                            p, columns=[d["key"]])[d["key"]].to_pylist():
                        sched.setdefault(v, []).append(d["sid"])
            max_dsid = max(d["sid"] for d in range_deletes)
            for key, sched in sorted(by_key.items()):
                sched = {v: sorted(s) for v, s in sched.items()}
                for csid, fs in all_groups:
                    if csid >= max_dsid:
                        continue  # nothing newer can kill these in-range
                    for entry in fs:
                        for p in t._parquet_under(entry):
                            parts.append(_FilesPartition(
                                [p], mode="delete", csid=csid, key=key,
                                schedule=sched, rng=(lo, hi)))
        # one partition per file: a large commit fans out across the
        # cluster; an all-metadata range still plans one (empty) batch
        return parts or [_FilesPartition([])]

    def _base_fields(self):
        return [f for f in self.arrow_schema
                if f.name not in ("_change_type", "_commit_sid")]

    def _project(self, tbl):
        """File columns → the base target schema (typed-null fill for
        pre-evolution files)."""
        import pyarrow as pa

        cols, fields = [], self._base_fields()
        for field in fields:
            if field.name in tbl.column_names:
                cols.append(tbl[field.name].cast(field.type))
            else:
                cols.append(pa.nulls(len(tbl), field.type))
        return pa.table(cols, schema=pa.schema(fields))

    def read(self, partition: _FilesPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        for f in partition.files:
            base = self._project(pq.read_table(f))
            if not self.changelog:
                yield from base.to_batches(max_chunksize=_BATCH_ROWS)
                continue
            if partition.mode == "insert":
                out = base.append_column(
                    "_change_type",
                    pa.array(["insert"] * len(base))).append_column(
                    "_commit_sid",
                    pa.array([partition.csid] * len(base), pa.int64()))
                yield from out.to_batches(max_chunksize=_BATCH_ROWS)
                continue
            # delete pre-images: fate = earliest schedule sid newer than
            # this file's commit; emit rows whose fate ∈ (lo, hi]. One
            # dict-map over the key column (pandas, C-speed), no joins.
            import bisect

            lo, hi = partition.rng
            csid, sched = partition.csid, partition.schedule
            fate_of = {}
            for v, sids in sched.items():
                i = bisect.bisect_right(sids, csid)
                if i < len(sids) and lo < sids[i] <= hi:
                    fate_of[v] = sids[i]
            if not fate_of:
                continue
            keys = base[partition.key].to_pandas()
            fate = keys.map(fate_of)
            mask = pa.array(fate.notna().to_numpy())
            hit = base.filter(mask)
            out = hit.append_column(
                "_change_type",
                pa.array(["delete"] * len(hit))).append_column(
                "_commit_sid",
                pa.array(fate.dropna().astype("int64").to_numpy(),
                         pa.int64()))
            yield from out.to_batches(max_chunksize=_BATCH_ROWS)

    def commit(self, end: dict) -> None:
        pass  # progress lives in the query checkpoint


class IceliteDataSource(DataSource):
    """``spark.dataSource.register(IceliteDataSource)`` →
    ``spark.readStream.format("icelite")`` (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "icelite"

    def schema(self) -> StructType:
        from pyspark.sql.types import LongType, StringType, StructField

        root = self.options.get("path")
        if not root:
            raise ValueError("the icelite source requires .option('path', "
                             "<table root>)")
        s = _offline_schema(root)
        if str(self.options.get("changelog", "false")).lower() == "true":
            s = StructType(list(s.fields) + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_sid", LongType(), False)])
        return s

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _IceliteStreamReader(schema, dict(self.options))
