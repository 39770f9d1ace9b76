"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _has_unorderable(dt) -> bool:
    """True when the (possibly nested) type contains a MapType — the one
    common type Spark cannot order, which rules out the min-over-struct
    fast path in :func:`keep_first`."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.StructType):
        return any(_has_unorderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _has_unorderable(dt.elementType)
    return False


def keep_first(df: DataFrame, key: Column | str,
               order_cols: list[Column | str]) -> DataFrame:
    """Skew-proof first-wins dedup (the D1 rule, reference
    h5_to_parquet.py:45-48 made key-based): keep, per distinct ``key``,
    the row that sorts first by ``order_cols``.

    Implemented as ``groupBy(xxhash64(key), key).agg(min_by(struct(*cols),
    struct(*order_cols)))`` rather than a ``row_number`` window. Semantics
    are identical, but a window has NO partial aggregation — every row of
    a duplicate group crosses the shuffle and lands in one task, so a text
    duplicated 10^6–10^9× (parked-domain/boilerplate pages on a real
    crawl) becomes one straggler task holding gigabytes. ``min_by`` is a
    declarative aggregate: map-side partial aggregation collapses each
    map task's contribution to ONE candidate row per key before the
    shuffle, so the hot group costs one row per upstream partition no
    matter its multiplicity. The 8-byte ``xxhash64`` leads the grouping
    key so shuffle/compare work touches the hash, not whole documents;
    the raw key column stays in the key only for collision safety.

    Deterministic whenever ``order_cols`` are unique within a key group;
    on exact ties the row whose full column tuple sorts first wins (r7 —
    strictly MORE deterministic than the previous ``min_by``, which
    picked an arbitrary tied row; any choice among tied rows satisfies
    the contract).

    r7 implementation note: ``min(struct(*order, struct(*cols)))``
    rather than ``min_by(struct(*cols), struct(*order))`` — identical
    winners, same partial-aggregation skew-proofness, but measured 2-3×
    cheaper on wide/nested rows (80k extracted rows on local[32]:
    min_by 1.3-2.6s vs min-struct 0.67s): the ordered comparison
    short-circuits on the leading order fields instead of min_by's
    separate ordering/value buffer churn."""
    key_col = F.col(key) if isinstance(key, str) else key
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    cols = df.columns
    if _has_unorderable(df.schema):
        # maps are not orderable in Spark — min(struct(.., payload))
        # would fail to analyze; fall back to min_by, whose VALUE side
        # is never compared (same winners where order_cols are unique)
        return (df
                .groupBy(F.xxhash64(key_col).alias("__kh"),
                         key_col.alias("__k"))
                .agg(F.min_by(F.struct(*cols),
                              F.struct(*order)).alias("__w"))
                .select("__w.*"))
    return (df
            .groupBy(F.xxhash64(key_col).alias("__kh"),
                     key_col.alias("__k"))
            .agg(F.min(F.struct(*order, F.struct(*cols).alias("__p")))
                 .alias("__w"))
            .select("__w.__p.*"))


def mark_first(df: DataFrame, key: str,
               order_cols: list[str], flag: str = "kept") -> DataFrame:
    """Keep-ALL variant of :func:`keep_first` for sub-document dedup:
    returns ``df`` plus a boolean ``flag`` column that is true on the
    first row per ``key`` (ordered by ``order_cols``) and false on the
    rest, without a window.

    Two-step shape: (1) ``groupBy(key).agg(min(struct(order_cols)))`` —
    partial aggregation, one winner row per distinct key; (2) join the
    winners back on the key and compare. The big side crosses the shuffle
    once (same as the window form), but as a JOIN probe side it streams —
    and AQE's skew-join split can divide a hot key's partition across
    tasks, which a window fundamentally cannot (the whole partition must
    be co-located and buffered for ``row_number``). ``order_cols`` and
    ``key`` must be plain column names present in ``df``; ``order_cols``
    must be unique within each key group (on exact ties EVERY tied row
    is flagged, where ``row_number`` would arbitrarily pick one — same
    determinism caveat as :func:`keep_first`). NULL keys form their own
    group (null-safe join), exactly like a window partition."""
    win = (df.groupBy(key)
           .agg(F.min(F.struct(*order_cols)).alias("__win"))
           .withColumnRenamed(key, "__wk"))
    return (df.join(win, F.col(key).eqNullSafe(F.col("__wk")))
            .withColumn(flag, F.struct(*order_cols) == F.col("__win"))
            .drop("__win", "__wk"))


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition a (small-bytes, expensive-per-row) input across the
    cluster before an expensive map/explode/UDF stage: byte-based scan
    split sizing is the wrong parallelism signal for compute-bound
    stages — a bench-scale documents table is ONE split, which would
    serialize the whole stage into a single task regardless of core
    count (the same lesson as the extraction pipeline's
    ``salt_partitions``; spread BEFORE the expensive map). Output sets
    are order-insensitive, so the shuffle changes no pinned value;
    measured 3.5s → ~1.9s for mm_feature_extract at sf0.1 on local[32]
    (BENCH/PLANS.md r4).

    SCALE-ADAPTIVE (r7): a no-op when the input already has enough
    partitions — a 100 TB scan yields thousands of splits and must NOT
    pay a full round-robin shuffle for "parallelism" it already has
    (guide §2.4: accidental repartition is the classic needless
    exchange). The partition probe is driver-side plan inspection, no
    job runs.

    ``factor``: width multiplier on ``defaultParallelism`` — 2 (default)
    for Python-UDF stages (uneven per-row cost needs slack for stragglers,
    measured in r4); 1 for JVM-compute stages whose output is re-scanned
    by several downstream stages (narrower spread = fewer tiny tasks per
    re-scan at small scale, same parallelism)."""
    n = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def subdoc_keep_first(ex: DataFrame, totals: DataFrame,
                      doc_cols: list[str], order_cols: list[str],
                      key: str = "ph", pos: str = "pos",
                      para: str = "para") -> DataFrame:
    """Sub-document (paragraph-level) keep-first dedup — the C4/
    MassiveText rule — WITHOUT materializing a per-row kept flag.

    Key insight: the winners of ``groupBy(key).agg(min_by(...))`` ARE the
    kept rows, and ``min_by`` can carry the paragraph text and the owning
    document's keys in its struct. So the plan is three partial-aggregated
    groupBys and one doc-level join:

    1. winners: one shuffle on the paragraph hash, ``min_by(struct(doc,
       pos, para), struct(order))`` — map-side partial aggregation makes a
       paragraph duplicated 10^9× cost one candidate row per map task (no
       row_number window straggler, and ~2× faster than the
       flag-join form even at bench scale: the paragraph strings cross
       one shuffle once and nothing rejoins the exploded set);
    2. reassembly: winners → ``groupBy(doc_cols)`` ordered collect (each
       winner row belongs to the doc that keeps it);
    3. ``totals``: caller-supplied per-doc frame ``(*doc_cols, n_paras)``
       — computable NARROWLY from the source row (``ceil(n_tokens /
       PARA_WORDS)``), so the corpus is scanned and exploded exactly
       once;
    4. a doc-level join of (3) with (2) — unique keys, skew-free; docs
       whose every paragraph lost elsewhere keep ``n_kept=0`` and an
       empty ``clean_text``.

    Returns ``(*doc_cols, n_paras, n_kept, clean_text)``.
    """
    winners = (ex.groupBy(key)
               .agg(F.min_by(F.struct(*doc_cols, pos, para),
                             F.struct(*order_cols)).alias("__w"))
               .select("__w.*"))
    kept = (winners.groupBy(*doc_cols)
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.struct(pos, para))),
                         lambda x: x[para]),
                     " ").alias("clean_text")))
    return (totals.join(kept, list(doc_cols), "left")
            .select(*doc_cols, "n_paras",
                    F.coalesce("n_kept", F.lit(0).cast("long"))
                    .alias("n_kept"),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text")))
