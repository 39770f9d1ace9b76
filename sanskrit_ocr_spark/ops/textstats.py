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


# --- per-document stats composite (lang-ID + quality + tokens + fingerprint) ----

def ts_doc_stats(spark, sf):
    """The narrow per-document text-stats suite in ONE projection — the
    driver-checked composite of ``ts_lang_id`` + ``ts_quality_score`` +
    ``ts_token_count`` + ``ts_fingerprint`` (r3 VERDICT #1 consolidation;
    the individual ops remain above as building blocks, each still
    pytest-pinned against its own SQL). All JVM built-ins fused into the
    scan: language-ID vowel-ratio heuristic, stopword/word-shape quality
    score, whitespace + BPE-ish regex token counts, and the cross-engine
    rolling-hash + md5 fingerprints. Pure narrow map — one scan, no
    shuffle, scales with the corpus."""
    docs = t(spark, sf, "documents").withColumn(
        "toks", F.split(F.trim(F.col("text")), " +"))
    n_tok = F.size("toks").cast("double")
    vowels = F.length(F.regexp_replace("text", "[^aeiou]+", ""))
    vowel_ratio = F.round(vowels.cast("double") / F.length("text"), 4)
    stop_ratio = (F.size(F.expr(
        f"filter(toks, w -> w IN ({_STOP_SQLLIST}))")).cast("double") / n_tok)
    mean_wlen = (F.length(F.regexp_replace("text", " ", "")).cast("double")
                 / n_tok)
    rolling = F.expr(
        f"aggregate(transform(split(text, ''), c -> ascii(c)), 0L,"
        f" (acc, x) -> (acc * {FP_MUL} + x) % {FP_MOD})")
    return (docs.filter(F.size("toks") > 0)
            .select("doc_id",
                    vowel_ratio.alias("vowel_ratio"),
                    F.when(vowel_ratio > 0.2, "en").otherwise("unk")
                    .alias("pred_lang"),
                    F.round(stop_ratio, 4).alias("stop_ratio"),
                    F.round(mean_wlen, 4).alias("mean_word_len"),
                    F.round(0.5 * stop_ratio + 0.1 * mean_wlen, 4)
                    .alias("quality"),
                    F.size("toks").cast("long").alias("n_ws_tokens"),
                    F.regexp_count(F.col("text"), F.lit(TOKEN_PATTERN))
                    .cast("long").alias("n_rx_tokens"),
                    rolling.alias("fp"),
                    F.md5(F.encode("text", "UTF-8")).alias("md5_hex")))


DOC_STATS_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), ' +') AS toks,
         length(regexp_replace(text, ' ', '', 'g'))::DOUBLE AS n_nonspace
  FROM documents
)
SELECT doc_id,
       round(length(regexp_replace(text, '[^aeiou]+', '', 'g'))::DOUBLE
             / length(text), 4) AS vowel_ratio,
       CASE WHEN round(length(regexp_replace(text, '[^aeiou]+', '',
                                             'g'))::DOUBLE
                       / length(text), 4) > 0.2
            THEN 'en' ELSE 'unk' END AS pred_lang,
       round(len(list_filter(toks, w -> w IN ({_STOP_SQLLIST})))::DOUBLE
             / len(toks), 4) AS stop_ratio,
       round(n_nonspace / len(toks), 4) AS mean_word_len,
       round(0.5 * (len(list_filter(toks, w -> w IN ({_STOP_SQLLIST})))::DOUBLE
                    / len(toks))
             + 0.1 * (n_nonspace / len(toks)), 4) AS quality,
       len(toks)::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_PATTERN}'))::BIGINT
         AS n_rx_tokens,
       list_reduce(list_prepend(0::BIGINT,
                   list_transform(string_split(text, ''),
                                  c -> ascii(c)::BIGINT)),
                   (acc, x) -> (acc * {FP_MUL} + x) % {FP_MOD}) AS fp,
       md5(text) AS md5_hex
FROM base WHERE len(toks) > 0
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


# --- PII scrub (email/phone redaction — standard pre-training scrub) ------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def _pii_exprs():
    """(raw, scrubbed) column expressions for the planted-contact corpus —
    shared by ``ts_pii_scrub`` and the ``x5_web_curate`` composite."""
    d = F.col("doc_id")
    contact = F.when(
        d % 5 == 0,
        F.concat(F.lit(" contact "), F.col("source"), F.lit(".team"),
                 (d % 7).cast("string"), F.lit("@crawl"),
                 (d % 3).cast("string"), F.lit(".example.org"))
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 7 == 0,
        F.concat(F.lit(" call 415-"),
                 F.lpad((d % 1000).cast("string"), 3, "0"), F.lit("-"),
                 F.lpad(((d * 31) % 10000).cast("string"), 4, "0"))
    ).otherwise(F.lit(""))
    raw = F.concat(F.col("text"), contact, phone)
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>")
    return raw, scrubbed


def ts_pii_scrub(spark, sf):
    """PII redaction (the standard web-corpus scrub before training): mask
    email addresses and phone-like sequences, count the redactions. The
    synthetic corpus is bag-of-words text, so contact strings are PLANTED
    deterministically from (doc_id, source) — by the same formula on the
    Spark and DuckDB sides — while the scrub itself (regex + counts) is
    computed independently by each engine. All JVM built-ins
    (regexp_replace / regexp_count), a pure narrow map: no shuffle, scales
    as a scan."""
    docs = t(spark, sf, "documents")
    raw, scrubbed = _pii_exprs()
    return docs.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.regexp_count(raw, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(raw, F.lit(PHONE_RE)).cast("long").alias("n_phones"))


PII_SQL = """
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact ' || source || '.team'
                      || (doc_id % 7)::VARCHAR || '@crawl'
                      || (doc_id % 3)::VARCHAR || '.example.org'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call 415-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
                      || '-' || lpad(((doc_id * 31) % 10000)::VARCHAR, 4, '0')
                 ELSE '' END AS raw
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g'),
         '\\d{3}-\\d{3}-\\d{4}', '<PHONE>', 'g') AS scrubbed,
       len(regexp_extract_all(raw,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT
         AS n_emails,
       len(regexp_extract_all(raw, '\\d{3}-\\d{3}-\\d{4}'))::BIGINT AS n_phones
FROM planted
"""


# --- URL canonicalization (crawl dedup-key normalization) ------------------------

def ts_url_canonicalize(spark, sf):
    """Crawl-URL canonicalization — the normalization every web pipeline
    applies before using ``url`` as the dedup/checkpoint key (our
    north-rule key): lowercase scheme+authority, strip the default port,
    drop the fragment, strip ``www.``, remove tracking parameters
    (``utm_*``/``fbclid``/``gclid``), tidy dangling separators, and emit
    the registrable domain. Noisy URLs are PLANTED deterministically from
    (doc_id, source) by the same formula on both engines; the
    canonicalization is computed independently by each. Pure narrow map,
    JVM regex only."""
    docs = t(spark, sf, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"), F.lit("-news.Example.COM"),
        F.when(d % 4 == 0, F.lit(":443"))
         .when(d % 4 == 1, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/Articles/"), d.cast("string"),
        F.when(d % 3 == 0,
               F.concat(F.lit("?utm_source=feed&id="),
                        (d % 97).cast("string"), F.lit("&utm_campaign=x")))
         .when(d % 3 == 1, F.concat(F.lit("?id="), (d % 97).cast("string")))
         .otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("#section-2")).otherwise(F.lit("")))
    out = (docs.select("doc_id", url.alias("url"))
           .withColumn("u", F.regexp_replace("url", "#.*$", ""))
           .withColumn("pfx", F.regexp_extract("u", "^[^/]*//[^/]*", 0))
           .withColumn("u", F.concat(F.lower("pfx"),
                                     F.expr("substring(u, length(pfx)+1)")))
           .withColumn("u", F.regexp_replace(
               "u", r"^(https://[^/:]+):443(/|$)", r"$1$2"))
           .withColumn("u", F.regexp_replace(
               "u", r"^(http://[^/:]+):80(/|$)", r"$1$2"))
           .withColumn("u", F.regexp_replace(
               "u", r"^(https?://)www\.", r"$1"))
           .withColumn("u", F.regexp_replace(
               "u", r"(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", ""))
           .withColumn("u", F.regexp_replace("u", r"[?&]$", "")))
    return out.select(
        "doc_id", "url", F.col("u").alias("canon"),
        F.regexp_extract("u", r"^https?://([^/:]+)", 1).alias("domain"))


URL_SQL = """
WITH planted AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END)
         || '://'
         || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
         || source || '-news.Example.COM'
         || (CASE WHEN doc_id % 4 = 0 THEN ':443'
                  WHEN doc_id % 4 = 1 THEN ':80' ELSE '' END)
         || '/Articles/' || doc_id::VARCHAR
         || (CASE WHEN doc_id % 3 = 0
                  THEN '?utm_source=feed&id=' || (doc_id % 97)::VARCHAR
                       || '&utm_campaign=x'
                  WHEN doc_id % 3 = 1
                  THEN '?id=' || (doc_id % 97)::VARCHAR
                  ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END) AS url
  FROM documents
), s1 AS (
  SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u FROM planted
), s2 AS (
  SELECT doc_id, url,
         lower(regexp_extract(u, '^[^/]*//[^/]*'))
           || substring(u, length(regexp_extract(u, '^[^/]*//[^/]*')) + 1)
           AS u
  FROM s1
), s3 AS (
  SELECT doc_id, url,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(u, '^(https://[^/:]+):443(/|$)', '\\1\\2'),
                 '^(http://[^/:]+):80(/|$)', '\\1\\2'),
               '^(https?://)www\\.', '\\1'),
             '(utm_[a-z]+|fbclid|gclid)=[^&#]*&?', '', 'g'),
           '[?&]$', '') AS u
  FROM s2
)
SELECT doc_id, url, u AS canon,
       regexp_extract(u, '^https?://([^/:]+)', 1) AS domain
FROM s3
"""


# --- training-sequence packing (token-budget chunking) ---------------------------

# Token capacity per packed training sequence. 512 (not a production 2-8k)
# so the per-source streams at driver-test scale (~1.3k tokens/source) span
# several sequences — the boundary logic is actually exercised, not
# vacuously seq_id=0 everywhere.
SEQ_CAP = 512


def ts_seq_pack(spark, sf):
    """Training-sequence packing: concatenate documents per source in
    doc_id order into a token stream and chunk it into ``SEQ_CAP``-token
    sequences — each doc gets the sequence id where its first token lands
    (the streaming-pack rule every trainer's data loader applies when
    packing documents into fixed-length contexts). One window over
    (source, doc_id): a single shuffle on source, no driver state. At
    100 TB the partition key is (source, day-bucket) so no single window
    partition exceeds executor memory — the cumsum is associative, so
    bucketing only renumbers sequences, never splits one incorrectly."""
    docs = t(spark, sf, "documents")
    from pyspark.sql import Window

    n_tok = F.size(F.split(F.trim(F.col("text")), " +")).cast("long")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (docs.select("doc_id", "source", n_tok.alias("n_tokens"))
            .withColumn("offset", F.coalesce(F.sum("n_tokens").over(w),
                                             F.lit(0).cast("long")))
            .withColumn("seq_id", F.floor(F.col("offset") / F.lit(SEQ_CAP)))
            .select("doc_id", "source", "n_tokens", "offset", "seq_id"))


SEQ_PACK_SQL = f"""
SELECT doc_id, source,
       len(regexp_split_to_array(trim(text), ' +'))::BIGINT AS n_tokens,
       coalesce(sum(len(regexp_split_to_array(trim(text), ' +')))
                OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0)::BIGINT AS offset,
       floor(coalesce(sum(len(regexp_split_to_array(trim(text), ' +')))
                      OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING),
                      0) / {SEQ_CAP})::BIGINT AS seq_id
FROM documents
"""


# --- canonical-url first-wins dedup (crawl dedup key in action) ------------------

URL_DEDUP_PATHS = 150  # planted path collisions: ~3-4 docs share a page


def dedup_url_canonical(spark, sf):
    """First-wins dedup keyed on the CANONICAL url — the reason
    ``ts_url_canonicalize`` exists: crawlers see the same page under
    scheme-case/www/default-port/tracking-param/fragment variants, and
    the dedup key must be the normalized form. This is the driver-checked
    composite of the FULL canonicalization chain (the ``ts_url_canonicalize``
    rules: fragment strip, scheme+authority lowercase, :443/:80 default-port
    strip, www. strip, utm/fbclid/gclid removal, separator tidy, registrable-
    domain extraction) applied as the dedup key (r3 VERDICT #1
    consolidation; ``ts_url_canonicalize`` itself remains above,
    pytest-pinned). Urls are planted with deliberate path collisions
    (``p = doc_id % URL_DEDUP_PATHS``) wrapped in per-doc_id variant noise
    — every noise axis cancels under canonicalization, so each engine
    independently converges each collision group to one canonical row.
    Emits (canon, domain, keeper, n_dups)."""
    docs = t(spark, sf, "documents")
    d = F.col("doc_id")
    p = d % URL_DEDUP_PATHS
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("news"), (p % 4).cast("string"), F.lit(".Example.COM"),
        F.when(d % 4 == 0, F.lit(":443"))
         .when(d % 4 == 1, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/Articles/"), p.cast("string"),
        F.when(d % 3 == 0,
               F.concat(F.lit("?utm_source=feed&id="),
                        (p % 97).cast("string"), F.lit("&utm_campaign=x")))
         .when(d % 3 == 1, F.concat(F.lit("?id="), (p % 97).cast("string")))
         .otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("#section-2")).otherwise(F.lit("")))
    canon = (docs.select("doc_id", url.alias("u"))
             .withColumn("u", F.regexp_replace("u", "#.*$", ""))
             .withColumn("pfx", F.regexp_extract("u", "^[^/]*//[^/]*", 0))
             .withColumn("u", F.concat(
                 F.lower("pfx"), F.expr("substring(u, length(pfx)+1)")))
             .withColumn("u", F.regexp_replace(
                 "u", r"^(https://[^/:]+):443(/|$)", r"$1$2"))
             .withColumn("u", F.regexp_replace(
                 "u", r"^(http://[^/:]+):80(/|$)", r"$1$2"))
             .withColumn("u", F.regexp_replace(
                 "u", r"^(https?://)www\.", r"$1"))
             .withColumn("u", F.regexp_replace(
                 "u", r"(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", ""))
             .withColumn("canon", F.regexp_replace("u", r"[?&]$", "")))
    return (canon
            .groupBy("canon")
            .agg(F.min("doc_id").alias("keeper"),
                 F.count("*").cast("long").alias("n_dups"))
            .select("canon",
                    F.regexp_extract("canon", r"^https?://([^/:]+)", 1)
                    .alias("domain"),
                    "keeper", "n_dups"))


URL_DEDUP_SQL = f"""
WITH planted AS (
  SELECT doc_id, doc_id % {URL_DEDUP_PATHS} AS p,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END)
         || '://'
         || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
         || 'news' || ((doc_id % {URL_DEDUP_PATHS}) % 4)::VARCHAR
         || '.Example.COM'
         || (CASE WHEN doc_id % 4 = 0 THEN ':443'
                  WHEN doc_id % 4 = 1 THEN ':80' ELSE '' END)
         || '/Articles/' || (doc_id % {URL_DEDUP_PATHS})::VARCHAR
         || (CASE WHEN doc_id % 3 = 0
                  THEN '?utm_source=feed&id='
                       || ((doc_id % {URL_DEDUP_PATHS}) % 97)::VARCHAR
                       || '&utm_campaign=x'
                  WHEN doc_id % 3 = 1
                  THEN '?id=' || ((doc_id % {URL_DEDUP_PATHS}) % 97)::VARCHAR
                  ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END) AS u
  FROM documents
), s1 AS (
  SELECT doc_id, regexp_replace(u, '#.*$', '') AS u FROM planted
), s2 AS (
  SELECT doc_id,
         lower(regexp_extract(u, '^[^/]*//[^/]*'))
           || substring(u, length(regexp_extract(u, '^[^/]*//[^/]*')) + 1)
           AS u
  FROM s1
), s3 AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(u, '^(https://[^/:]+):443(/|$)', '\\1\\2'),
                 '^(http://[^/:]+):80(/|$)', '\\1\\2'),
               '^(https?://)www\\.', '\\1'),
             '(utm_[a-z]+|fbclid|gclid)=[^&#]*&?', '', 'g'),
           '[?&]$', '') AS canon
  FROM s2
)
SELECT canon, regexp_extract(canon, '^https?://([^/:]+)', 1) AS domain,
       min(doc_id) AS keeper, count(*)::BIGINT AS n_dups
FROM s3 GROUP BY canon
"""


# --- unigram LM quality score (CCNet-style perplexity-filter analog) -------------

# Vocabulary cap + out-of-vocabulary floor — what CCNet actually does (a
# FIXED pretrained LM scores the crawl; unseen tokens get a floor
# probability). The cap is the 100 TB safety property: the web's distinct
# token set (typos, urls, numbers) is itself billions of rows, so the
# scoring join must broadcast a BOUNDED top-K table, never the full
# vocabulary (r3 VERDICT "what's wrong #3"). 16 < the synthetic corpus's
# 31 distinct tokens so the OOV arm is actually exercised by the oracle.
LM_TOP_K = 16
LM_OOV_COUNT = 0.5  # pseudo-count for unseen tokens


def ts_lm_score(spark, sf):
    """Unigram language-model score per document — the exactly-computable
    analog of CCNet's LM-perplexity quality filter: top-``LM_TOP_K``
    corpus unigram probabilities (ties broken (count desc, token asc) so
    both engines pick the same cap set), OOV floor for everything else,
    each document scored by its mean token log-probability. Low scores =
    rare-token-heavy documents (the tail CCNet's filter trims).

    Scale shape: one explode → one groupBy(token) for the vocabulary
    (map-side combined), top-K via orderBy+limit (TakeOrdered — no global
    window), the scalar token total as a 1-row broadcast, then a
    broadcast join of tokens→counts (bounded at K rows — the full-vocab
    broadcast this op used to force is gone) and one groupBy(doc_id).
    ln() differs from DuckDB's by ≤1 ulp; the per-doc mean rounds at 4
    decimals, far above the noise."""
    docs = t(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), " +")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("total"))
    topk = (vocab.orderBy(F.col("c").desc(), F.col("tok").asc())
            .limit(LM_TOP_K))
    logp = F.log(
        F.coalesce(F.col("c").cast("double"), F.lit(LM_OOV_COUNT))
        / F.col("total"))
    return (toks.join(F.broadcast(topk), "tok", "left")
            .crossJoin(F.broadcast(total))
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.round(F.avg(logp), 4).alias("avg_logp")))


LM_SCORE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT sum(c)::DOUBLE AS total FROM vocab
), topk AS (
  SELECT tok, c FROM vocab ORDER BY c DESC, tok ASC LIMIT {LM_TOP_K}
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       round(avg(ln(coalesce(k.c::DOUBLE, {LM_OOV_COUNT}) / total)), 4)
         AS avg_logp
FROM toks t LEFT JOIN topk k USING (tok), tot
GROUP BY doc_id
"""


# --- deterministic train/val/test split (hash-bucketed holdout) ------------------

SPLIT_BUCKETS = 100
SPLIT_TRAIN_LT = 90  # [0,90) train, [90,95) val, [95,100) test


def ts_hash_split(spark, sf):
    """Deterministic content-hash train/val/test split — the holdout rule
    a training pipeline needs to be REPRODUCIBLE across engines and runs:
    bucket = polynomial rolling hash of the text mod ``SPLIT_BUCKETS``
    (content-keyed, so re-crawls of the same document land in the same
    split and near-duplicate leakage across splits is visible to the dedup
    ops, unlike a random split). Pure narrow map, no shuffle, scales as a
    scan. The rolling hash is the ts_fingerprint parity formula — the one
    hash both engines compute bit-identically."""
    docs = t(spark, sf, "documents")
    rolling = F.expr(
        f"aggregate(transform(split(text, ''), c -> ascii(c)), 0L,"
        f" (acc, x) -> (acc * {FP_MUL} + x) % {FP_MOD})")
    bucket = F.pmod(rolling, F.lit(SPLIT_BUCKETS)).cast("long")
    return (docs.select("doc_id", bucket.alias("bucket"))
            .withColumn("split",
                        F.when(F.col("bucket") < SPLIT_TRAIN_LT, "train")
                        .when(F.col("bucket") < SPLIT_TRAIN_LT + 5, "val")
                        .otherwise("test")))


HASH_SPLIT_SQL = f"""
WITH h AS (
  SELECT doc_id,
         list_reduce(list_prepend(0::BIGINT,
                     list_transform(string_split(text, ''),
                                    c -> ascii(c)::BIGINT)),
                     (acc, x) -> (acc * {FP_MUL} + x) % {FP_MOD})
           % {SPLIT_BUCKETS} AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < {SPLIT_TRAIN_LT} THEN 'train'
            WHEN bucket < {SPLIT_TRAIN_LT + 5} THEN 'val'
            ELSE 'test' END AS split
FROM h
"""


# --- source mixing weights (temperature-scaled sampling) -------------------------

def ts_source_mix(spark, sf):
    """Per-source sampling weights for corpus mixing — the α=0.5
    temperature rule (w_s ∝ n_s^α, the multilingual-sampling smoothing
    from the XLM/mBERT lineage) over per-source token counts. sqrt is
    IEEE-exact on both engines; the weight denominator is summed as
    DECIMAL so the total is order-independent (double summation order
    differs between engines). One aggregation + a broadcast scalar —
    scales as a scan."""
    from pyspark.sql import Window

    docs = t(spark, sf, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), " +")).cast("long")
    per = (docs.groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum(n_tok).alias("n_tokens")))
    per = per.withColumn("s", F.sqrt(F.col("n_tokens"))
                         .cast("decimal(30,15)"))
    # denominator via a global window over the ALREADY-AGGREGATED frame
    # (#sources rows) — one scan of documents total, not one per reference
    tot = F.sum("s").over(Window.partitionBy())
    return per.select("source", "n_docs", "n_tokens",
                      F.round(F.col("s").cast("double")
                              / tot.cast("double"), 6).alias("weight"))


SOURCE_MIX_SQL = """
WITH per AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len(regexp_split_to_array(trim(text), ' +')))::BIGINT
           AS n_tokens
  FROM documents GROUP BY source
), s AS (
  SELECT source, n_docs, n_tokens,
         CAST(sqrt(n_tokens) AS DECIMAL(30,15)) AS s
  FROM per
), tot AS (
  SELECT sum(s) AS tot FROM s
)
SELECT source, n_docs, n_tokens,
       round(s::DOUBLE / tot::DOUBLE, 6) AS weight
FROM s, tot
"""


# --- mixing-weight execution: deterministic stratified sample --------------------

MIX_SAMPLE_FRACTION = 0.5  # sample half the corpus per the mixing weights


def ts_mix_sample(spark, sf):
    """Execute the ``ts_source_mix`` weights: draw a deterministic
    stratified sample whose per-source composition follows the
    temperature-scaled distribution. Per source, the take rate is
    ``fraction × w_s × N / n_s`` (how CCNet/The Pile materialize a mixing
    recipe into an actual corpus), and membership is decided by the
    content rolling hash — reproducible across engines and runs, and
    duplicates sample together. Both engines evaluate the IDENTICAL
    double expression on identical rounded operands, so the floor'd
    threshold compare is bit-exact. One aggregation + one broadcast join
    + a narrow filter: scales as a scan."""
    from pyspark.sql import Window

    docs = t(spark, sf, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), " +")).cast("long")
    per = (docs.groupBy("source")
           .agg(F.count("*").alias("n_docs"), F.sum(n_tok).alias("n_tok")))
    per = per.withColumn("s", F.sqrt(F.col("n_tok")).cast("decimal(30,15)"))
    w_tot = Window.partitionBy()
    # weight = the ts_source_mix α=0.5 temperature weight; carried onto
    # every sampled row so one driver row checks both the mixing weights
    # and their execution (r3 VERDICT #1 consolidation; ts_source_mix
    # itself remains above, pytest-pinned)
    weight = F.round(F.col("s").cast("double")
                     / F.sum("s").over(w_tot).cast("double"), 6)
    rates = per.select(
        "source",
        weight.alias("weight"),
        F.least(F.lit(1.0),
                F.lit(MIX_SAMPLE_FRACTION) * weight
                * F.sum("n_docs").over(w_tot).cast("double")
                / F.col("n_docs").cast("double")).alias("rate"))
    rolling = F.expr(
        f"aggregate(transform(split(text, ''), c -> ascii(c)), 0L,"
        f" (acc, x) -> (acc * {FP_MUL} + x) % {FP_MOD})")
    bucket = F.pmod(rolling, F.lit(1000000)).cast("long")
    return (docs.select("doc_id", "source", bucket.alias("bucket"))
            .join(F.broadcast(rates), "source")
            .filter(F.col("bucket") < F.floor(F.col("rate") * 1000000))
            .select("doc_id", "source", "bucket", "weight"))


MIX_SAMPLE_SQL = f"""
WITH per AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         CAST(sqrt(sum(len(regexp_split_to_array(trim(text), ' +'))))
              AS DECIMAL(30,15)) AS s
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(s) AS st, sum(n_docs) AS nd FROM per
), rates AS (
  SELECT source,
         round(s::DOUBLE / st::DOUBLE, 6) AS weight,
         least(1.0, {MIX_SAMPLE_FRACTION}
                    * round(s::DOUBLE / st::DOUBLE, 6)
                    * nd::DOUBLE / n_docs::DOUBLE) AS rate
  FROM per, tot
), b AS (
  SELECT doc_id, source,
         list_reduce(list_prepend(0::BIGINT,
                     list_transform(string_split(text, ''),
                                    c -> ascii(c)::BIGINT)),
                     (acc, x) -> (acc * {FP_MUL} + x) % {FP_MOD})
           % 1000000 AS bucket
  FROM documents
)
SELECT doc_id, b.source, bucket, weight
FROM b JOIN rates ON rates.source = b.source
WHERE bucket < floor(rate * 1000000)
"""


# --- x5: the full web-curation composite (scrub → gate → dedup → split) ----------

CURATE_MIN_TOKENS = 30


def x5_web_curate(spark, sf):
    """The whole curation DAG in one driver-checked query — what a user of
    this engine actually runs over a crawl: PII scrub → minimum-length
    quality gate → paragraph-level keep-first dedup (on the scrubbed
    text) → deterministic content-hash train/val/test split. Each stage
    is the already-oracle-checked operator; the composite pins that they
    COMPOSE correctly (the paragraph window sees post-gate rows only, the
    split hashes the original content so scrubbing can't move a doc
    across splits).

    Plan shape (r5): narrow scrub+gate fused into the scan, materialized
    ONCE under a scoped DISK_ONLY persist (``subdoc_keep_first`` consumes
    it twice — winners + totals — and the per-char rolling-hash split is
    the expensive stage; measured interleaved at sf0.1: persist 1.84s ==
    the old window form's 1.85s, recompute 2.76s), then the skew-proof
    paragraph dedup and the doc-level totals join. The persist registers
    in the shared scoped-cache registry (released by ``release_caches``,
    same discipline as the minhash shingle cache)."""
    from pyspark import StorageLevel

    from sanskrit_ocr_spark.ops.dedup import _SHINGLE_CACHE, PARA_WORDS

    docs = t(spark, sf, "documents")
    _, scrubbed = _pii_exprs()
    rolling = F.expr(
        f"aggregate(transform(split(text, ''), c -> ascii(c)), 0L,"
        f" (acc, x) -> (acc * {FP_MUL} + x) % {FP_MOD})")
    bucket = F.pmod(rolling, F.lit(SPLIT_BUCKETS)).cast("long")
    gated = (docs
             .withColumn("scrubbed", scrubbed)
             .withColumn("toks", F.split(F.trim(F.col("scrubbed")), " +"))
             .withColumn("split",
                         F.when(bucket < SPLIT_TRAIN_LT, "train")
                         .when(bucket < SPLIT_TRAIN_LT + 5, "val")
                         .otherwise("test"))
             .filter(F.size("toks") >= CURATE_MIN_TOKENS)
             .select("doc_id", "split", "toks")
             .persist(StorageLevel.DISK_ONLY))
    _SHINGLE_CACHE.append(gated)
    paras = F.expr(
        f"transform(sequence(0, cast(ceil(size(toks) / {PARA_WORDS}.0) as"
        f" int) - 1), i -> array_join(slice(toks, i * {PARA_WORDS} + 1,"
        f" {PARA_WORDS}), ' '))")
    from sanskrit_ocr_spark.ops.util import subdoc_keep_first

    ex = (gated.select("doc_id", "split",
                       F.posexplode(paras).alias("pos", "para"))
          .withColumn("ph", F.md5(F.encode("para", "UTF-8"))))
    # skew-proof keep-first without a row_number window OR a per-row
    # kept flag: the min_by winners per paragraph hash ARE the kept rows
    # (see ops.util.subdoc_keep_first)
    totals = gated.select(
        "doc_id", "split",
        F.ceil(F.size("toks") / PARA_WORDS).cast("long").alias("n_paras"))
    return subdoc_keep_first(ex, totals, ["doc_id", "split"],
                             ["doc_id", "pos"])


X5_SQL = f"""
WITH planted AS (
  SELECT doc_id, text,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact ' || source || '.team'
                      || (doc_id % 7)::VARCHAR || '@crawl'
                      || (doc_id % 3)::VARCHAR || '.example.org'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call 415-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
                      || '-' || lpad(((doc_id * 31) % 10000)::VARCHAR, 4, '0')
                 ELSE '' END AS raw
  FROM documents
), scrub AS (
  SELECT doc_id, text,
         regexp_replace(
           regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '\\d{{3}}-\\d{{3}}-\\d{{4}}', '<PHONE>', 'g') AS scrubbed
  FROM planted
), gated AS (
  SELECT doc_id,
         regexp_split_to_array(trim(scrubbed), ' +') AS tk,
         list_reduce(list_prepend(0::BIGINT,
                     list_transform(string_split(text, ''),
                                    c -> ascii(c)::BIGINT)),
                     (acc, x) -> (acc * {FP_MUL} + x) % {FP_MOD})
           % {SPLIT_BUCKETS} AS bucket
  FROM scrub
  WHERE len(regexp_split_to_array(trim(scrubbed), ' +'))
        >= {CURATE_MIN_TOKENS}
), ex AS (
  SELECT doc_id,
         CASE WHEN bucket < {SPLIT_TRAIN_LT} THEN 'train'
              WHEN bucket < {SPLIT_TRAIN_LT + 5} THEN 'val'
              ELSE 'test' END AS split,
         i - 1 AS pos,
         array_to_string(list_slice(tk, (i - 1) * {{pw}} + 1,
                                    (i - 1) * {{pw}} + {{pw}}), ' ') AS para
  FROM gated, unnest(generate_series(1, cast(ceil(len(tk) / {{pw}}.0)
                                             AS INT))) AS u(i)
), fl AS (
  SELECT doc_id, split, pos, para,
         row_number() OVER (PARTITION BY md5(para)
                            ORDER BY doc_id, pos) = 1 AS kept
  FROM ex
)
SELECT doc_id, split, count(*)::BIGINT AS n_paras,
       sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       coalesce(string_agg(CASE WHEN kept THEN para END, ' '
                           ORDER BY pos), '') AS clean_text
FROM fl GROUP BY doc_id, split
"""


def _x5_sql() -> str:
    from sanskrit_ocr_spark.ops.dedup import PARA_WORDS
    return X5_SQL.replace("{pw}", str(PARA_WORDS))


# Consolidated registry (r3 VERDICT #1): the merged-away r3 names map as
#   ts_lang_id + ts_quality_score
#     + ts_token_count + ts_fingerprint → ts_doc_stats
#   ts_url_canonicalize                 → dedup_url_canonical (full chain)
#   ts_source_mix                       → ts_mix_sample (weight column)
# The individual ops stay defined above; tests/test_legacy_oracles.py keeps
# each pinned against its own SQL, LEGACY_ORACLES below is that contract.
QUERIES = {
    "ts_doc_stats": ts_doc_stats,
    "ts_repetition": ts_repetition,
    "ts_pii_scrub": ts_pii_scrub,
    "ts_seq_pack": ts_seq_pack,
    "ts_hash_split": ts_hash_split,
    "dedup_url_canonical": dedup_url_canonical,
    "ts_lm_score": ts_lm_score,
    "ts_mix_sample": ts_mix_sample,
    "x5_web_curate": x5_web_curate,
}

ORACLES = {
    "ts_doc_stats": DOC_STATS_SQL,
    "ts_repetition": REPETITION_SQL,
    "ts_pii_scrub": PII_SQL,
    "ts_seq_pack": SEQ_PACK_SQL,
    "ts_hash_split": HASH_SPLIT_SQL,
    "dedup_url_canonical": URL_DEDUP_SQL,
    "ts_lm_score": LM_SCORE_SQL,
    "ts_mix_sample": MIX_SAMPLE_SQL,
    "x5_web_curate": _x5_sql(),
}

# Building-block ops folded into composites above — no driver slot, still
# oracle-pinned in pytest (tests/test_legacy_oracles.py).
LEGACY_ORACLES = {
    ts_lang_id: LANG_SQL,
    ts_quality_score: QUALITY_SQL,
    ts_token_count: TOKEN_SQL,
    ts_fingerprint: FP_SQL,
    ts_url_canonicalize: URL_SQL,
    ts_source_mix: SOURCE_MIX_SQL,
}
