"""Stateful streaming dedup — ``applyInPandasWithState``.

The reference dedups with an in-memory driver-side ``set`` in stream order
(``datagen/h5_to_parquet.py:27,45-48``) — O(#distinct) memory in one
process, the scalability wall SURVEY.md §4 flags. This operator is the
Spark-native upgrade: first-wins dedup by key over an unbounded stream with
**partitioned, checkpointed state** (RocksDB/HDFS state store on a real
cluster), so the "seen" set shards across executors and survives failures.

State per key: a single flag (seen yes/no). First occurrence of a key in
the stream is emitted; every later occurrence — in the same micro-batch or
any later one — is dropped. Within a micro-batch, first-wins order is
``order_col`` ascending (the reference's stable-stream-order semantics made
key-based).

At 10^12 docs the state store is the product of distinct keys — bound it in
production with ``GroupStateTimeout.ProcessingTimeTimeout`` + re-MERGE
against the committed table (the batch path) for keys older than the
timeout horizon.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([StructField("seen", BooleanType(), False)])


def dedup_stream(stream: DataFrame, key_col: str = "url",
                 order_col: str = "warc_ts") -> DataFrame:
    """Streaming first-wins dedup by ``key_col``; emits each key once."""
    out_schema = stream.schema

    def emit_first(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier micro-batch
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = pdf.sort_values(order_col).head(1)
            if first is None or (cand[order_col].iloc[0]
                                 < first[order_col].iloc[0]):
                first = cand
        if first is not None:
            state.update((True,))
            yield first

    return (stream.groupBy(key_col)
            .applyInPandasWithState(
                emit_first,
                outputStructType=out_schema,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
