"""Text-analysis operators a training-data pipeline needs, over ``documents``.

All JVM-side (built-in functions only — no Python in these hot paths); each
has a DuckDB oracle. The fingerprint op's rolling hash stays in modular
arithmetic so it is overflow-free under Spark 4's ANSI mode and bit-exact
across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sanskrit_ocr_spark.ops.relational import t

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_STOP_SQLLIST = ", ".join(f"'{w}'" for w in STOPWORDS)

TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


# --- language-ID heuristic (n-gram/char-class ratios) --------------------------

def ts_lang_id(spark, sf):
    docs = t(spark, sf, "documents")
    vowels = F.length(F.regexp_replace("text", "[^aeiou]+", ""))
    ratio = F.round(vowels.cast("double") / F.length("text"), 4)
    return docs.select(
        "doc_id",
        ratio.alias("vowel_ratio"),
        F.when(ratio > 0.2, "en").otherwise("unk").alias("pred_lang"),
    )


LANG_SQL = """
SELECT doc_id,
       round(length(regexp_replace(text, '[^aeiou]+', '', 'g'))::DOUBLE
             / length(text), 4) AS vowel_ratio,
       CASE WHEN round(length(regexp_replace(text, '[^aeiou]+', '', 'g'))::DOUBLE
                       / length(text), 4) > 0.2
            THEN 'en' ELSE 'unk' END AS pred_lang
FROM documents
"""


# --- quality scoring (length / stopword / word-shape ratios) --------------------

def ts_quality_score(spark, sf):
    docs = t(spark, sf, "documents").withColumn(
        "toks", F.split(F.trim(F.col("text")), " +"))
    n_tok = F.size("toks").cast("double")
    stop_ratio = (F.size(F.expr(
        f"filter(toks, w -> w IN ({_STOP_SQLLIST}))")).cast("double") / n_tok)
    mean_wlen = (F.length(F.regexp_replace("text", " ", "")).cast("double")
                 / n_tok)
    return (docs.filter(F.size("toks") > 0)
            .select("doc_id",
                    F.round(stop_ratio, 4).alias("stop_ratio"),
                    F.round(mean_wlen, 4).alias("mean_word_len"),
                    F.round(0.5 * stop_ratio + 0.1 * mean_wlen, 4)
                    .alias("quality")))


QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), ' +') AS toks,
         length(regexp_replace(text, ' ', '', 'g'))::DOUBLE AS n_nonspace
  FROM documents
)
SELECT doc_id,
       round(len(list_filter(toks, w -> w IN ({_STOP_SQLLIST})))::DOUBLE
             / len(toks), 4) AS stop_ratio,
       round(n_nonspace / len(toks), 4) AS mean_word_len,
       round(0.5 * (len(list_filter(toks, w -> w IN ({_STOP_SQLLIST})))::DOUBLE
                    / len(toks))
             + 0.1 * (n_nonspace / len(toks)), 4) AS quality
FROM base WHERE len(toks) > 0
"""


# --- token counting (whitespace + BPE-ish regex) --------------------------------

def ts_token_count(spark, sf):
    docs = t(spark, sf, "documents")
    ws = F.when(F.trim(F.col("text")) == "", F.lit(0)) \
          .otherwise(F.size(F.split(F.trim(F.col("text")), " +")))
    rx = F.regexp_count(F.col("text"), F.lit(TOKEN_PATTERN))
    return docs.select("doc_id",
                       ws.cast("long").alias("n_ws_tokens"),
                       rx.cast("long").alias("n_rx_tokens"))


TOKEN_SQL = f"""
SELECT doc_id,
       (CASE WHEN trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), ' +')) END)::BIGINT
         AS n_ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_PATTERN}'))::BIGINT AS n_rx_tokens
FROM documents
"""


# --- document fingerprinting (rolling hash + md5) --------------------------------

FP_MOD = 1_000_000_007
FP_MUL = 31


def ts_fingerprint(spark, sf):
    docs = t(spark, sf, "documents")
    rolling = F.expr(
        f"aggregate(transform(split(text, ''), c -> ascii(c)), 0L,"
        f" (acc, x) -> (acc * {FP_MUL} + x) % {FP_MOD})")
    return docs.select("doc_id",
                       rolling.alias("fp"),
                       F.md5(F.encode("text", "UTF-8")).alias("md5_hex"))


FP_SQL = f"""
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT,
                   list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
                   (acc, x) -> (acc * {FP_MUL} + x) % {FP_MOD}) AS fp,
       md5(text) AS md5_hex
FROM documents
"""


# --- repetition signals (Gopher/RefinedWeb-style repetition filters) ------------

def ts_repetition(spark, sf):
    """Per-document repetition signals from the published web-pipeline
    quality rules (Gopher's "fraction of characters in the most common
    n-gram", RefinedWeb's duplicate-token ratios): top word-bigram
    fraction + distinct-token ratio. One explode + one (doc_id, bigram)
    aggregation — the shuffle key carries ~one row per distinct bigram
    per doc (map-side combined), so the op scales like the shingle ops."""
    docs = (t(spark, sf, "documents")
            .withColumn("toks", F.split(F.trim(F.col("text")), " +"))
            .filter(F.size("toks") >= 2))
    distinct_ratio = F.round(
        F.size(F.array_distinct("toks")).cast("double") / F.size("toks"), 4)
    bigrams = docs.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(toks)-1),"
            " i -> concat(element_at(toks,i), ' ', element_at(toks,i+1)))"
        )).alias("bg"))
    top = (bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
           .groupBy("doc_id").agg(F.max("c").alias("max_bg"),
                                  F.sum("c").alias("n_bg")))
    return (docs.select("doc_id", distinct_ratio.alias("distinct_ratio"))
            .join(top, "doc_id")
            .select("doc_id", "distinct_ratio",
                    F.round(F.col("max_bg").cast("double") / F.col("n_bg"), 4)
                    .alias("top_bigram_frac")))


REPETITION_SQL = """
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS toks
  FROM documents
), docs AS (
  SELECT doc_id,
         round(len(list_distinct(toks))::DOUBLE / len(toks), 4)
           AS distinct_ratio,
         toks
  FROM base WHERE len(toks) >= 2
), bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM docs
), cnt AS (
  SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg
), top AS (
  SELECT doc_id, max(c) AS max_bg, sum(c) AS n_bg FROM cnt GROUP BY doc_id
)
SELECT d.doc_id, d.distinct_ratio,
       round(t.max_bg::DOUBLE / t.n_bg, 4) AS top_bigram_frac
FROM docs d JOIN top t USING (doc_id)
"""


QUERIES = {
    "ts_lang_id": ts_lang_id,
    "ts_quality_score": ts_quality_score,
    "ts_token_count": ts_token_count,
    "ts_fingerprint": ts_fingerprint,
    "ts_repetition": ts_repetition,
}

ORACLES = {
    "ts_lang_id": LANG_SQL,
    "ts_quality_score": QUALITY_SQL,
    "ts_token_count": TOKEN_SQL,
    "ts_fingerprint": FP_SQL,
    "ts_repetition": REPETITION_SQL,
}
