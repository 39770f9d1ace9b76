"""Relational operators from SURVEY.md §2, each with a DuckDB oracle.

Parity rules used throughout (so the driver's order-insensitive value-hash
matches):

* every computed column is aliased identically in Spark and SQL;
* money/measure sums cast each input to exact DECIMAL *before* any
  arithmetic, accumulate in decimal, and emit DOUBLE — exact accumulation
  makes the result independent of summation order and of the engines'
  divergent double-rounding tie behavior;
* top-k queries always carry a unique tie-break key;
* dedup/first-wins uses ``row_number`` over an explicit stable order —
  never ``dropDuplicates`` (SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col, prec="20,2"):
    return col.cast(f"decimal({prec})")


def _dec_sum(col, alias):
    """Order-independent cross-engine money sum: cast each term to exact
    decimal BEFORE any arithmetic, sum in decimal, emit double. (Rounding
    doubles per-term is NOT portable — DuckDB and Spark disagree on .xx5
    ties; decimal casts of 2-decimal data are unambiguous.)"""
    return F.sum(_dec(col)).cast("double").alias(alias)


# --- P1: content filter (reference h5_to_parquet.py:17-21; ASCII analog on
# --- the English `documents` table — the Devanagari class itself is exercised
# --- by the extraction pipeline's golden tests) -------------------------------

def p1_content_filter(spark, sf):
    return t(spark, sf, "documents").select(
        "doc_id",
        F.trim(F.regexp_replace("text", "[^a-z ]+", "")).alias("clean"),
    )


P1_SQL = """
SELECT doc_id, trim(regexp_replace(text, '[^a-z ]+', '', 'g')) AS clean
FROM documents
"""


# --- F1: empty-after-clean filter (h5_to_parquet.py:41-43) --------------------

def f1_empty_filter(spark, sf):
    clean = F.trim(F.regexp_replace("text", "[^qxz]+", ""))
    return (t(spark, sf, "documents")
            .select("doc_id", clean.alias("clean"))
            .filter(F.length("clean") > 0))


F1_SQL = """
SELECT doc_id, trim(regexp_replace(text, '[^qxz]+', '', 'g')) AS clean
FROM documents
WHERE length(trim(regexp_replace(text, '[^qxz]+', '', 'g'))) > 0
"""


# --- D1: first-wins exact dedup (h5_to_parquet.py:27,45-48) -------------------

def d1_dedup_first_wins(spark, sf):
    # Partition the window by xxhash64(text) FIRST, full text second: the
    # shuffle/sort comparisons short-circuit on the 8-byte hash instead of
    # comparing whole documents; the text column stays in the key only as
    # the collision tie-break, so the semantics are byte-exact.
    w = Window.partitionBy(F.xxhash64("text"), "text") \
              .orderBy(F.col("doc_id").asc())
    return (t(spark, sf, "documents")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "text"))


D1_SQL = """
SELECT doc_id, text FROM (
  SELECT doc_id, text,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
"""


# --- J1: positional zip-join made keyed (h5_to_parquet.py:33-36) --------------

def j1_keyed_join(spark, sf):
    docs = t(spark, sf, "documents")
    ids = docs.select("doc_id", "source")
    texts = docs.select("doc_id", "text")
    return ids.join(texts, "doc_id", "inner").select("doc_id", "source", "text")


J1_SQL = """
SELECT i.doc_id AS doc_id, i.source AS source, x.text AS text
FROM (SELECT doc_id, source FROM documents) i
JOIN (SELECT doc_id, text FROM documents) x USING (doc_id)
"""


# --- J3: resume anti-join (translate_bookcorpus.py:43-44,79 → left anti) ------

def j3_resume_anti_join(spark, sf):
    # "pages not yet extracted" shape: customers with no committed
    # high-value order (filter keeps the result non-vacuous at every sf)
    cust = t(spark, sf, "customer")
    done = (t(spark, sf, "orders")
            .filter(F.col("o_totalprice") > 400000)
            .select(F.col("o_custkey").alias("c_custkey")))
    return (cust.join(done, "c_custkey", "left_anti")
            .select("c_custkey", "c_name"))


J3_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
"""


# --- A1: grouped doc counts (h5_to_parquet.py:55-56 → lineage doc_count) ------

def a1_group_count(spark, sf):
    return (t(spark, sf, "documents").groupBy("source")
            .agg(F.count("*").alias("doc_count")))


A1_SQL = "SELECT source, count(*) AS doc_count FROM documents GROUP BY source"


# --- A2: histogram (render_text.py:443-445 style sampling tally) --------------

def a2_event_histogram(spark, sf):
    return (t(spark, sf, "events").groupBy("event_type")
            .agg(F.count("*").alias("n")))


A2_SQL = "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"


# --- A3: token-count sum (h5_to_parquet.py:107-142, the disabled tokenizer) ---

def a3_token_sum(spark, sf):
    ntok = F.when(F.trim(F.col("text")) == "", F.lit(0)) \
            .otherwise(F.size(F.split(F.trim(F.col("text")), " +")))
    return (t(spark, sf, "documents")
            .groupBy("source")
            .agg(F.sum(ntok.cast("long")).alias("n_tokens")))


A3_SQL = """
SELECT source,
       sum(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), ' +')) END)::BIGINT
         AS n_tokens
FROM documents GROUP BY source
"""


# --- A5: failure tallies per partition (north_rule lineage analog) ------------

def a5_failure_tally(spark, sf):
    return (t(spark, sf, "events")
            .filter(F.col("event_type") == "error")
            .groupBy(F.pmod(F.col("user_id"), F.lit(16)).alias("part"))
            .agg(F.count("*").alias("fail_count")))


A5_SQL = """
SELECT user_id % 16 AS part, count(*) AS fail_count
FROM events WHERE event_type = 'error' GROUP BY user_id % 16
"""


# --- O2: limit / top-k (translate_bookcorpus.py:158-159) ----------------------

def o2_topk(spark, sf):
    return (t(spark, sf, "documents")
            .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
            .select("doc_id", "n_chars").limit(10))


O2_SQL = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id ASC LIMIT 10
"""


# --- P3: prompt/template projection (translate_bookcorpus.py:130-133) ---------

def p3_prompt_format(spark, sf):
    return t(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.lit("Translate this passage: "),
                 F.substring("text", 1, 30)).alias("prompt"),
    )


P3_SQL = """
SELECT doc_id, 'Translate this passage: ' || substr(text, 1, 30) AS prompt
FROM documents
"""


# --- P6: id formatting (generate_dataset.py:37) -------------------------------

def p6_id_format(spark, sf):
    return t(spark, sf, "documents").select(
        "doc_id", F.format_string("img_%04d.png", "doc_id").alias("img_name"))


P6_SQL = "SELECT doc_id, printf('img_%04d.png', doc_id) AS img_name FROM documents"


# --- P7: monotonically increasing id (translate_bookcorpus.py:148-152) --------

def dense_id(df: DataFrame, order_col: str, n_buckets: int = 32) -> DataFrame:
    """Scale-safe dense sequence number in ``order_col`` order — the
    partition-offset (zipWithIndex-style) technique instead of a global
    single-task window:

    1. one aggregation pass computes ``n_buckets`` quantile boundaries of
       the order key (``percentile_approx`` — deterministic, and the exact
       boundary values don't matter: any contiguous range split yields the
       same final ranks);
    2. one aggregation pass counts rows per range bucket (``n_buckets``
       rows to the driver — the same driver-side footprint as Spark's own
       ``zipWithIndex``);
    3. the final plan ranks within each bucket (parallel windows) and adds
       the bucket's cumulative offset from a literal map.

    Every shuffle is on the small bucket id; no single-task global sort.

    CONTRACT: ``df`` must be deterministic across re-evaluation — the
    input is computed THREE times (quantile probe, bucket-count collect,
    final ranking plan), so a non-deterministic source (e.g. a fresh
    ``rand()`` column, a non-idempotent UDF, or a table mutated between
    actions) can disagree between passes and silently duplicate or skip
    seq values. Callers with such inputs must ``persist()`` (or
    checkpoint) first; every in-repo call site feeds a deterministic
    parquet-backed projection.
    """
    key = F.col(order_col)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(F.percentile_approx(order_col, qs, 10000).alias("b")).head()
    bounds = row["b"] if row and row["b"] is not None else []
    bucket = F.lit(0)
    if bounds:
        bucket = F.aggregate(
            F.array(*[F.lit(b) for b in bounds]), F.lit(0),
            lambda acc, b: acc + F.when(key > b, 1).otherwise(0))
    with_b = df.withColumn("__bkt", bucket)
    counts = {r["__bkt"]: r["n"]
              for r in with_b.groupBy("__bkt").agg(F.count("*").alias("n"))
              .collect()}
    offs, acc = [], 0
    for b in range(n_buckets):
        offs.append(acc)
        acc += counts.get(b, 0)
    off_map = F.create_map(*[x for b in range(n_buckets)
                             for x in (F.lit(b), F.lit(offs[b]))])
    w = Window.partitionBy("__bkt").orderBy(key.asc())
    return (with_b
            .withColumn("seq", (F.row_number().over(w).cast("long")
                                + off_map[F.col("__bkt")]))
            .drop("__bkt"))


def p7_dense_id(spark, sf):
    return (dense_id(t(spark, sf, "documents").select("doc_id"), "doc_id")
            .select("doc_id", F.col("seq").cast("int").alias("seq")))


P7_SQL = """
SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS seq FROM documents
"""


# --- P5: danda document join (generate_dataset.py:30) -------------------------

def p5_danda_join(spark, sf):
    agg = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
            lambda s: s["text"],
        ),
        " ।\n",
    )
    return (t(spark, sf, "documents").groupBy("source")
            .agg(F.concat(agg, F.lit("।।")).alias("scroll")))


P5_SQL = """
SELECT source, string_agg(text, ' ।\n' ORDER BY doc_id) || '।।' AS scroll
FROM documents GROUP BY source
"""


# --- Q1-style pricing summary (scan + filter + grouped agg) -------------------

def _disc_price_dec():
    """Exact-decimal ``extendedprice * (1 - discount)`` (see _dec_sum)."""
    return _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(12,2)") - _dec(F.col("l_discount"), "12,2"))


_DISC_PRICE_SQL = ("(l_extendedprice::DECIMAL(20,2)"
                   " * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)))")


def q1_pricing_summary(spark, sf):
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(_dec_sum(F.col("l_quantity"), "sum_qty"),
                 _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
                 F.sum(_disc_price_dec()).cast("double")
                 .alias("sum_disc_price"),
                 F.count("*").alias("count_order")))


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity::DECIMAL(20,2))::DOUBLE AS sum_qty,
       sum(l_extendedprice::DECIMAL(20,2))::DOUBLE AS sum_base_price,
       sum({_DISC_PRICE_SQL})::DOUBLE AS sum_disc_price,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3-style 3-way join + top-k revenue --------------------------------------

def q3_top_revenue(spark, sf):
    cust = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey)
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.sum(_disc_price_dec()).cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
            .limit(10))


Q3_SQL = f"""
SELECT o_orderkey, o_orderdate,
       sum({_DISC_PRICE_SQL})::DOUBLE AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


# --- Broadcast dimension join (SURVEY §2.4 rebuild posture) -------------------

def j_broadcast_dims(spark, sf):
    region = F.broadcast(t(spark, sf, "region"))
    nation = F.broadcast(t(spark, sf, "nation"))
    cust = t(spark, sf, "customer")
    return (cust.join(nation, cust.c_nationkey == nation.n_nationkey)
            .join(region, nation.n_regionkey == region.r_regionkey)
            .groupBy("r_name")
            .agg(F.count("*").alias("n_customers"),
                 _dec_sum(F.col("c_acctbal"), "sum_acctbal")))


JB_SQL = """
SELECT r_name, count(*) AS n_customers,
       sum(c_acctbal::DECIMAL(20,2))::DOUBLE AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- W1: top event per user (window rank) -------------------------------------

def w1_top_event_per_user(spark, sf):
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(),
                                              F.col("event_id").asc())
    return (t(spark, sf, "events")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id", "value"))


W1_SQL = """
SELECT user_id, event_id, value FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rn
  FROM events) WHERE rn = 1
"""


# --- W2: gap-based sessionization (batch analog of session windows) -----------

def w2_sessionize(spark, sf):
    ev = t(spark, sf, "events")
    w_ord = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                                  F.col("event_id").asc())
    # Compare gaps in MICROSECONDS on both engines: the events carry
    # sub-second precision, and truncating to whole seconds (cast to long)
    # disagrees with DuckDB's epoch() at 1800s boundaries.
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w_ord)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = F.sum(new_sess).over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ev.withColumn("session_id", sess)
            .groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start")))


W2_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events, min(ts) AS session_start
FROM sess GROUP BY user_id, session_id
"""


# --- W3: as-of join (custom operator; Spark lacks it natively) -----------------

def w3_asof_join(spark, sf):
    """Each click event joined to the user's most recent prior-or-equal view:
    implemented as a single-pass window (union events, carry-forward the
    last view timestamp) — no join, one shuffle on user_id. The DuckDB
    oracle uses its NATIVE ``ASOF JOIN``, so the semantics are checked
    against an independent implementation, not a re-derivation.
    """
    ev = t(spark, sf, "events").filter(F.col("event_type").isin("click", "view"))
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts").asc(),
                  # views sort before clicks at equal ts → a same-instant
                  # view is visible to the click (ASOF >= semantics)
                  F.when(F.col("event_type") == "view", 0).otherwise(1),
                  F.col("event_id").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    return (ev.withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
            .filter(F.col("event_type") == "click")
            .select("event_id", "user_id", "ts", "last_view_ts"))


W3_SQL = """
SELECT c.event_id, c.user_id, c.ts, v.ts AS last_view_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


# --- Set op: EXCEPT (SURVEY §2.9 — the anti-join-shaped set op) ----------------

def s1_except_custkeys(spark, sf):
    orders = t(spark, sf, "orders")
    all_keys = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    f_keys = (orders.filter(F.col("o_orderstatus") == "F")
              .select(F.col("o_custkey").alias("custkey")).distinct())
    return all_keys.subtract(f_keys)


S1_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders
EXCEPT
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
"""


# --- Hourly rollup: date_trunc + grouped agg (SURVEY §2.12 date ops) ----------

def e1_hourly_rollup(spark, sf):
    ev = t(spark, sf, "events")
    return (ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
            .agg(F.count("*").alias("n"),
                 _dec_sum(F.col("value"), "sum_value")))


E1_SQL = """
SELECT date_trunc('hour', ts) AS hour_start, count(*) AS n,
       sum(value::DECIMAL(20,2))::DOUBLE AS sum_value
FROM events GROUP BY date_trunc('hour', ts)
"""


# --- Q6-style forecasting scan (filter-heavy single-table agg) ----------------

def q6_revenue_delta(spark, sf):
    li = (t(spark, sf, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1997-01-01")
                  & (F.col("l_discount") >= 0.05)
                  & (F.col("l_discount") <= 0.07)
                  & (F.col("l_quantity") < 24)))
    rev = F.sum(_dec(F.col("l_extendedprice"))
                * _dec(F.col("l_discount"), "12,2")).cast("double")
    return li.agg(rev.alias("revenue"))


Q6_SQL = """
SELECT sum(l_extendedprice::DECIMAL(20,2)
           * l_discount::DECIMAL(12,2))::DOUBLE AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- R1: rollup (grouping-sets family; subtotals + grand total) ---------------

def r1_event_rollup(spark, sf):
    ev = t(spark, sf, "events")
    return (ev.rollup("event_type")
            .agg(F.count("*").alias("n"),
                 _dec_sum(F.col("value"), "sum_value"))
            .select(F.coalesce(F.col("event_type"), F.lit("<ALL>"))
                    .alias("event_type"), "n", "sum_value"))


R1_SQL = """
SELECT coalesce(event_type, '<ALL>') AS event_type, count(*) AS n,
       sum(value::DECIMAL(20,2))::DOUBLE AS sum_value
FROM events GROUP BY ROLLUP(event_type)
"""


def r2_event_cube(spark, sf):
    """CUBE over (event_type, json k): every grouping-set combination in
    one pass — Spark expands to a union of partial aggregates under one
    shuffle, same as the SQL GROUP BY CUBE. Rolled-up dimensions surface
    as sentinels so the NULL-vs-missing distinction stays hashable."""
    ev = t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.select("event_type", k.alias("k"), "value")
            .cube("event_type", "k")
            .agg(F.grouping_id().cast("long").alias("gid"),
                 F.count("*").alias("n"),
                 _dec_sum(F.col("value"), "sum_value"))
            .select(F.coalesce(F.col("event_type"), F.lit("<ALL>"))
                    .alias("event_type"),
                    F.coalesce(F.col("k"), F.lit(-1)).alias("k"),
                    "gid", "n", "sum_value"))


R2_SQL = """
SELECT coalesce(event_type, '<ALL>') AS event_type,
       coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k,
       CAST(GROUPING(event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS gid,
       count(*) AS n, sum(value::DECIMAL(20,2))::DOUBLE AS sum_value
FROM events
GROUP BY CUBE(event_type, CAST(json_extract_string(props, '$.k') AS BIGINT))
"""


# --- P8: JSON path extraction (lineage-payload shape, SURVEY §2.12) ----------

def p8_json_extract(spark, sf):
    ev = t(spark, sf, "events")
    return (ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("k").agg(F.count("*").alias("n")))


P8_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
FROM events GROUP BY 1
"""


# --- G1/G2: remaining dimension tables (part, supplier) -----------------------

def g1_part_brand_stats(spark, sf):
    return (t(spark, sf, "part").groupBy("p_brand")
            .agg(F.count("*").alias("n_parts"),
                 _dec_sum(F.col("p_retailprice"), "sum_retail"),
                 F.max("p_size").alias("max_size")))


G1_SQL = """
SELECT p_brand, count(*) AS n_parts,
       sum(p_retailprice::DECIMAL(20,2))::DOUBLE AS sum_retail,
       max(p_size) AS max_size
FROM part GROUP BY p_brand
"""


def g2_supplier_nation(spark, sf):
    sup = t(spark, sf, "supplier")
    nation = F.broadcast(t(spark, sf, "nation"))
    return (sup.join(nation, sup.s_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_suppliers"),
                 _dec_sum(F.col("s_acctbal"), "sum_acctbal")))


G2_SQL = """
SELECT n_name, count(*) AS n_suppliers,
       sum(s_acctbal::DECIMAL(20,2))::DOUBLE AS sum_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


QUERIES = {
    "p1_content_filter": p1_content_filter,
    "f1_empty_filter": f1_empty_filter,
    "d1_dedup_first_wins": d1_dedup_first_wins,
    "j1_keyed_join": j1_keyed_join,
    "j3_resume_anti_join": j3_resume_anti_join,
    "a1_group_count": a1_group_count,
    "a2_event_histogram": a2_event_histogram,
    "a3_token_sum": a3_token_sum,
    "a5_failure_tally": a5_failure_tally,
    "o2_topk": o2_topk,
    "p3_prompt_format": p3_prompt_format,
    "p6_id_format": p6_id_format,
    "p7_dense_id": p7_dense_id,
    "p5_danda_join": p5_danda_join,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_revenue": q3_top_revenue,
    "j_broadcast_dims": j_broadcast_dims,
    "w1_top_event_per_user": w1_top_event_per_user,
    "w2_sessionize": w2_sessionize,
    "s1_except_custkeys": s1_except_custkeys,
    "e1_hourly_rollup": e1_hourly_rollup,
    "p8_json_extract": p8_json_extract,
    "g1_part_brand_stats": g1_part_brand_stats,
    "g2_supplier_nation": g2_supplier_nation,
    "q6_revenue_delta": q6_revenue_delta,
    "w3_asof_join": w3_asof_join,
    "r1_event_rollup": r1_event_rollup,
    "r2_event_cube": r2_event_cube,
}

ORACLES = {
    "p1_content_filter": P1_SQL,
    "f1_empty_filter": F1_SQL,
    "d1_dedup_first_wins": D1_SQL,
    "j1_keyed_join": J1_SQL,
    "j3_resume_anti_join": J3_SQL,
    "a1_group_count": A1_SQL,
    "a2_event_histogram": A2_SQL,
    "a3_token_sum": A3_SQL,
    "a5_failure_tally": A5_SQL,
    "o2_topk": O2_SQL,
    "p3_prompt_format": P3_SQL,
    "p6_id_format": P6_SQL,
    "p7_dense_id": P7_SQL,
    "p5_danda_join": P5_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_top_revenue": Q3_SQL,
    "j_broadcast_dims": JB_SQL,
    "w1_top_event_per_user": W1_SQL,
    "w2_sessionize": W2_SQL,
    "s1_except_custkeys": S1_SQL,
    "e1_hourly_rollup": E1_SQL,
    "p8_json_extract": P8_SQL,
    "g1_part_brand_stats": G1_SQL,
    "g2_supplier_nation": G2_SQL,
    "q6_revenue_delta": Q6_SQL,
    "w3_asof_join": W3_SQL,
    "r1_event_rollup": R1_SQL,
    "r2_event_cube": R2_SQL,
}
