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
* ``.option("starting", "latest")`` begins at the current head
  (default ``earliest`` = snapshot 0, i.e. the whole table history
  first, then the live tail).

Hive-partitioned icelite layouts are rejected at stream start (their
partition values live in directory names, not the files; the batch
ingest path covers them) — the synthetic ``__bucket`` level of
bucket-layout tables is fine (the key column itself is stored in the
files).

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
    def __init__(self, files: list[str]):
        self.files = files


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
        t = self._handle()
        groups, deletes = t._range_walk(start["sid"], end["sid"])
        if deletes and not self.skip_deletes:
            raise ValueError(
                f"commits ({start['sid']}, {end['sid']}] carry "
                "merge-on-read equality deletes; an append-only stream "
                "cannot represent the retraction — set "
                ".option('skipDeletes', 'true') to stream the "
                "insert-event log instead")
        files = [p for _, fs in groups for entry in fs
                 for p in t._parquet_under(entry)]
        # one partition per file: a large commit fans out across the
        # cluster; an all-metadata range still plans one (empty) batch
        return ([_FilesPartition([f]) for f in files]
                or [_FilesPartition([])])

    def read(self, partition: _FilesPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = self.arrow_schema
        for f in partition.files:
            tbl = pq.read_table(f)
            cols = []
            for field in target:
                if field.name in tbl.column_names:
                    cols.append(tbl[field.name].cast(field.type))
                else:
                    # pre-evolution file: typed nulls, the name-based
                    # resolution contract
                    cols.append(pa.nulls(len(tbl), field.type))
            out = pa.table(cols, schema=target)
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
        root = self.options.get("path")
        if not root:
            raise ValueError("the icelite source requires .option('path', "
                             "<table root>)")
        return _offline_schema(root)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _IceliteStreamReader(schema, dict(self.options))
