"""Deduplication family over the ``documents`` table.

The reference's only dedup is the in-memory exact-text set
(``h5_to_parquet.py:27,45-48``) — O(#distinct) driver memory, the
scalability wall SURVEY.md §4 calls out. Here the same semantics and its
web-scale generalizations, all shuffle-based:

* ``dedup_exact_hash``    — exact dedup by content hash (md5 groupBy);
* ``dedup_ngram_jaccard`` — exact word-bigram Jaccard pairs (the oracle-
  checkable ground truth for near-dup);
* ``dedup_minhash_lsh``   — MinHash signatures + banded LSH bucket join,
  candidates verified by true Jaccard (rows-only: LSH candidate recall is
  probabilistic, so no SQL oracle; pytest asserts recall vs the exact op);
* ``dedup_simhash``       — 64-bit SimHash via a vectorized pandas UDF,
  Hamming-banded candidate join verified with ``bit_count(xor)``
  (rows-only for the same reason).

Scale notes: every op is a shingle-explode → shuffle-on-shingle/band →
pair-group pipeline; nothing is collected to the driver. For 10^12 docs the
band join is the classic MinHash-LSH layout (band hash = shuffle key), and
the exact-Jaccard verifier only runs on LSH candidates (tiny fraction).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sanskrit_ocr_spark.conf import FIXTURES_DIR
from sanskrit_ocr_spark.ops.relational import t

NUM_MINHASH = 16
# 4 bands × 4 rows: P(candidate | j) = 1-(1-j^4)^4 — ≈0.999 at j=0.95,
# ≈8e-4 at j=0.12 (the background similarity of the synthetic corpus).
# Wider bands (8×2) flood the candidate join with low-similarity pairs and
# turn the verify stage quadratic — measured 58s → ~5s at sf0.1.
LSH_BANDS = 4
JACCARD_THRESHOLD = 0.5
SIMHASH_MAX_HAMMING = 3


def _with_shingles(docs: DataFrame) -> DataFrame:
    """doc_id + exploded distinct word-bigram shingles."""
    toks = F.split(F.trim(F.col("text")), " +")
    return (docs
            .withColumn("toks", toks)
            .filter(F.size("toks") >= 2)
            .withColumn("sh", F.explode(F.array_distinct(F.expr(
                "transform(sequence(1, size(toks)-1),"
                " i -> concat(element_at(toks,i), ' ', element_at(toks,i+1)))"
            ))))
            .select("doc_id", "sh"))


def _shingle_sizes(sh: DataFrame) -> DataFrame:
    return sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))


def _true_jaccard(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """pairs(a_id,b_id) → + inter, size_a, size_b, jaccard (exact).

    The shingle self-join is restricted to docs that appear in ``pairs``
    BEFORE joining (semi-join pushdown by hand) — without this the
    all-pairs shingle join is quadratic in corpus size instead of linear
    in candidate count.

    ``pairs`` and the candidate-restricted shingle set are MATERIALIZED
    (scoped persist, released with the shingle cache) rather than left as
    lazy subtrees (r7): the result plan references ``pairs`` in 7 branches
    and ``sh_c`` in 3, and each un-materialized reference re-executed the
    ENTIRE candidate-generation DAG — the signature groupBy ran 14× per
    query (stage-profiled). At 10^12 rows that replication is a
    scale-killer regardless of partitioning; materializing the two small
    frames makes every stage consume its input exactly once.
    """
    pairs = pairs.persist()
    _SHINGLE_CACHE.append(pairs)
    cand_ids = (pairs.select(F.col("a_id").alias("doc_id"))
                .union(pairs.select(F.col("b_id").alias("doc_id")))
                .distinct())
    sh_c = sh.join(cand_ids, "doc_id", "left_semi").persist()
    _SHINGLE_CACHE.append(sh_c)
    a = sh_c.select(F.col("doc_id").alias("a_id"), "sh")
    b = sh_c.select(F.col("doc_id").alias("b_id"), "sh")
    inter = (a.join(b, "sh")
             .filter(F.col("a_id") < F.col("b_id"))
             .join(pairs, ["a_id", "b_id"], "left_semi")
             .groupBy("a_id", "b_id")
             .agg(F.count("*").alias("inter")))
    # sizes over the REDUCED set: sh_c holds every shingle of every doc
    # that appears in a pair (the semi-join filters whole docs), so the
    # counts are identical for every row the final joins keep — and the
    # aggregation shrinks from |corpus shingles| to |candidate shingles|
    sizes = _shingle_sizes(sh_c)
    return (inter
            .join(sizes.select(F.col("doc_id").alias("a_id"),
                               F.col("n_sh").alias("size_a")), "a_id")
            .join(sizes.select(F.col("doc_id").alias("b_id"),
                               F.col("n_sh").alias("size_b")), "b_id")
            .withColumn("jaccard", F.round(
                F.col("inter") /
                (F.col("size_a") + F.col("size_b") - F.col("inter")), 4)))


# --- exact dedup by content hash ----------------------------------------------

def dedup_exact_hash(spark, sf):
    return (t(spark, sf, "documents")
            .groupBy(F.md5(F.encode("text", "UTF-8")).alias("h"))
            .agg(F.min("doc_id").alias("keeper"),
                 F.count("*").alias("n_copies")))


EXACT_SQL = """
SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# --- exact n-gram Jaccard pairs (oracle ground truth) --------------------------

NGRAM_SUBSET = 300  # exhaustive pair space bounded for the oracle


def dedup_ngram_jaccard(spark, sf):
    docs = t(spark, sf, "documents").filter(F.col("doc_id") < NGRAM_SUBSET)
    sh = _with_shingles(docs)
    all_pairs = (sh.select(F.col("doc_id").alias("a_id"), "sh")
                 .join(sh.select(F.col("doc_id").alias("b_id"), "sh"), "sh")
                 .filter(F.col("a_id") < F.col("b_id"))
                 .select("a_id", "b_id").distinct())
    return (_true_jaccard(sh, all_pairs)
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("a_id", "b_id", "inter", "size_a", "size_b", "jaccard"))


NGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS tk
  FROM documents WHERE doc_id < {NGRAM_SUBSET}
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(tk) - 1),
           i -> tk[i] || ' ' || tk[i + 1]))) AS sh
  FROM toks WHERE len(tk) >= 2
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id, inter, sa.n_sh AS size_a, sb.n_sh AS size_b,
       round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = a_id
           JOIN sizes sb ON sb.doc_id = b_id
WHERE round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 4) >= {JACCARD_THRESHOLD}
"""


# --- MinHash + banded LSH (the scale path; rows-only) ---------------------------

def minhash_signatures(sh: DataFrame) -> DataFrame:
    """shingles(doc_id, sh) → m0..m{NUM_MINHASH-1} signature (JVM xxhash64).

    All NUM_MINHASH permutation-mins come out of ONE groupBy — one shuffle
    for the whole signature, not one per hash function. Each shingle
    STRING is hashed exactly once; the 16 permutation hashes derive from
    the 8-byte digest (hashing a long is far cheaper than re-hashing a
    ~20-byte string 16×, and the pre-shuffle projection means the groupBy
    moves longs, not shingle strings).
    """
    hashed = sh.select("doc_id", F.xxhash64("sh").alias("h"))
    mins = [F.min(F.xxhash64(F.col("h"), F.lit(s))).alias(f"m{s}")
            for s in range(NUM_MINHASH)]
    return hashed.groupBy("doc_id").agg(*mins)


def lsh_candidates(sig: DataFrame) -> DataFrame:
    """Banded LSH: same band-hash in any band → candidate pair.

    The output is a candidate MULTISET (a pair agreeing in k bands
    appears k times, bounded by LSH_BANDS) — r7: the former trailing
    ``.distinct()`` was a whole extra exchange+aggregate whose set
    semantics every consumer already restores for free
    (``_true_jaccard`` consumes pairs via LEFT SEMI joins and a
    distinct'd id union). Verified result-identical; ~1.4× on the
    bench minhash query."""
    rows_per_band = NUM_MINHASH // LSH_BANDS
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"m{b * rows_per_band + r}")
                         for r in range(rows_per_band)]).alias("bh"),
        )
        for b in range(LSH_BANDS)
    ])
    exploded = (sig.select("doc_id", F.explode(bands).alias("bd"))
                .select("doc_id", F.col("bd.band").alias("band"),
                        F.col("bd.bh").alias("bh")))
    a = exploded.select(F.col("doc_id").alias("a_id"), "band", "bh")
    b = exploded.select(F.col("doc_id").alias("b_id"), "band", "bh")
    return (a.join(b, ["band", "bh"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id"))


# Persisted shingle DataFrames from prior invocations: unpersisted on the
# next call (and releasable explicitly) so repeated bench/driver loops never
# accumulate cached blocks in executor memory.
_SHINGLE_CACHE: list[DataFrame] = []


def release_caches() -> None:
    """Unpersist scoped caches left by ``dedup_minhash_lsh`` /
    ``_true_jaccard`` / the x5/x6 composites (call after the result has
    been materialized). Blocking (r7): the default async unpersist left
    dropped blocks lingering into the NEXT query's timed region; the
    synchronous wait runs between queries where it costs nothing."""
    while _SHINGLE_CACHE:
        _SHINGLE_CACHE.pop().unpersist(blocking=True)


def cap_shingle_df(sh: DataFrame, df_cap: int) -> DataFrame:
    """Drop shingles that appear in more than ``df_cap`` documents — the
    hot-shingle guard for the verify join (VERDICT r01: a shingle shared
    by millions of documents makes ``a.join(b, "sh")`` quadratic in that
    shingle's document frequency at 100 TB; such shingles carry no
    near-duplicate signal, so capping them is the standard stop-shingle
    treatment). The capped universe applies to BOTH the signature and the
    verify side, so the reported jaccard stays exact over that universe."""
    hot = (sh.groupBy("sh").agg(F.count("*").alias("df"))
           .filter(F.col("df") > df_cap)
           .select("sh"))
    return sh.join(F.broadcast(hot), "sh", "left_anti")


def dedup_minhash_lsh(spark, sf, df_cap: int | None = None):
    """MinHash+LSH near-dup pairs. ``df_cap``: optional document-frequency
    cap on shingles (see ``cap_shingle_df``) — the 100 TB scale path; at
    driver-test scale the default (None) keeps the shingle universe exact.
    """
    docs = t(spark, sf, "documents")
    release_caches()
    # The shingle explode feeds both the signature groupBy and the verify
    # join — persist it so the tokenize/explode runs once, not twice. The
    # cache is scoped: released on the next invocation or via
    # ``release_caches()`` once the caller has materialized the result.
    sh = _with_shingles(docs)
    if df_cap is not None:
        # persist the PRE-cap shingles too (r7): cap_shingle_df consumes
        # them twice (document-frequency build + the anti-join left side)
        # and an unmaterialized reference re-ran the whole tokenize/
        # explode per consumer
        sh = sh.persist()
        _SHINGLE_CACHE.append(sh)
        sh = cap_shingle_df(sh, df_cap)
    sh = sh.persist()
    _SHINGLE_CACHE.append(sh)
    cand = lsh_candidates(minhash_signatures(sh))
    return (_true_jaccard(sh, cand)
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("a_id", "b_id", "jaccard"))


# --- Hamming-ball candidate index (Manku-style permuted-block tables) -----------

# Manku et al. 2007 ("Detecting Near-Duplicates for Web Crawling", WWW) —
# the production simhash-dedup layout: split the 64-bit hash into
# HAM_BLOCKS blocks; a pair within Hamming distance ≤ HAM_MAX differs in
# at most HAM_MAX blocks, so it agrees EXACTLY on some
# (HAM_BLOCKS − HAM_MAX)-block combination — and every such combination
# is one of the C(HAM_BLOCKS, HAM_BLOCKS−HAM_MAX) table keys enumerated
# below. Full recall like a 4×16-bit chunk join, but each key carries
# ~64·(1 − HAM_MAX/HAM_BLOCKS) ≈ 32 bits instead of 16: expected random
# collisions drop from 4·n²/2^16 to 20·n²/2^32 — ~2^14 fewer candidate
# pairs, which is what keeps the verify stage linear at 10^9+ docs
# (r3 VERDICT "what's wrong #2"; measured counts in BENCH/PLANS.md).
HAM_BLOCKS = 6
HAM_MAX = 3  # == SIMHASH_MAX_HAMMING / PHASH_MAX_HAMMING


def _ham_block_bounds(bits: int = 64,
                      blocks: int = HAM_BLOCKS) -> list[tuple[int, int]]:
    """(offset, size) per block — sizes 11,11,11,11,10,10 for 64/6."""
    sizes = [bits // blocks + (1 if i < bits % blocks else 0)
             for i in range(blocks)]
    out, off = [], 0
    for s in sizes:
        out.append((off, s))
        off += s
    return out


def hamming_candidates(sig: DataFrame, hash_col: str,
                       id_col: str = "doc_id",
                       max_hamming: int = HAM_MAX) -> DataFrame:
    """(id, 64-bit hash) → candidate pairs ``(a_id, b_id, ha, hb)`` with
    FULL recall for pairs within ``max_hamming`` bits.

    One explode (C(6,3)=20 table keys per row, each the xxhash64 of a
    block combination — an 8-byte shuffle key) → one self-join on the
    key. Key-hash collisions across tables only ADD candidates (the
    caller's exact bit_count verify removes them); recall is exact by the
    pigeonhole argument above."""
    from itertools import combinations

    bounds = _ham_block_bounds()
    blocks = [F.shiftrightunsigned(F.col(hash_col), off)
              .bitwiseAND(F.lit((1 << size) - 1))
              for off, size in bounds]
    keep = HAM_BLOCKS - max_hamming
    tables = F.array(*[
        F.xxhash64(F.lit(tid), *[blocks[i] for i in combo])
        for tid, combo in enumerate(
            combinations(range(HAM_BLOCKS), keep))])
    ex = sig.select(id_col, hash_col, F.explode(tables).alias("bh"))
    a = ex.select(F.col(id_col).alias("a_id"),
                  F.col(hash_col).alias("ha"), "bh")
    b = ex.select(F.col(id_col).alias("b_id"),
                  F.col(hash_col).alias("hb"), "bh")
    return (a.join(b, "bh")
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", "ha", "hb"))


# --- SimHash (vectorized pandas UDF + bit_count verify; rows-only) --------------

_BIT_IDX = np.arange(64, dtype=np.uint64)
_BIT_WEIGHTS = [1 << i for i in range(64)]  # Python ints: no overflow


def _vote64(hs: np.ndarray) -> int:
    """uint64 per-token hashes → 64-bit SimHash by majority bit vote,
    returned in signed-int64 range for a LongType column. One numpy
    broadcast over all tokens; bit-identical to the scalar per-token/
    per-bit definition (pinned by pytest)."""
    n = hs.size
    if n == 0:
        return 0  # zero votes → no bit set
    votes = ((hs[:, None] >> _BIT_IDX) & np.uint64(1)).sum(axis=0)
    set_bits = votes * 2 > n  # acc_i > 0  ⇔  ones > n/2
    out = sum(w for w, b in zip(_BIT_WEIGHTS, set_bits) if b)
    return out - (1 << 64) if out >= (1 << 63) else out


def _vote64_flat(flat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Core batch vote: ``flat`` int64 token hashes for a whole Arrow
    batch, ``lens`` tokens-per-doc → int64 SimHash per doc, with NO
    per-row Python loop. The hashes expand to a (total_tokens, 64) uint8
    bit matrix via ``np.unpackbits`` and per-doc bit votes come from
    ``np.add.reduceat`` at the doc offsets — one vectorized pass per
    batch. Bit-identical to mapping :func:`_vote64` over the rows
    (pinned by pytest)."""
    out = np.zeros(len(lens), dtype=np.uint64)
    nz = lens > 0
    if not nz.any():
        return out.view(np.int64)
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    # (tokens, 64) uint8 bit matrix: little-endian byte+bit order makes
    # column i exactly (hash >> i) & 1 on this (LE) platform
    bits = np.unpackbits(flat.view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little")
    offsets = np.zeros(int(nz.sum()), dtype=np.int64)
    np.cumsum(lens[nz][:-1], out=offsets[1:])
    votes = np.add.reduceat(bits, offsets, axis=0, dtype=np.int64)
    set_bits = votes * 2 > lens[nz][:, None]
    out[nz] = np.packbits(set_bits, axis=1,
                          bitorder="little").view(np.uint64).ravel()
    return out.view(np.int64)


def _vote64_batch(arrs) -> np.ndarray:
    """Sequence-of-arrays convenience wrapper over :func:`_vote64_flat`
    (used by the differential pytest)."""
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64,
                       count=len(arrs))
    flat = (np.concatenate([np.asarray(a, dtype=np.int64)
                            for a in arrs if len(a)])
            if lens.sum() else np.empty(0, dtype=np.int64))
    return _vote64_flat(flat, lens)


def _simhash64(text: str) -> int:
    """Pure-Python/md5 SimHash — the r4 signature definition, retained
    as the differential check for the JVM-hashed path (same vote, an
    independent token-hash source)."""
    toks = text.split()
    if not toks:
        return 0
    digest = b"".join(hashlib.md5(t.encode("utf-8")).digest()[:8]
                      for t in toks)
    return _vote64(np.frombuffer(digest, dtype=">u8").astype(np.uint64))


def simhash_df(docs: DataFrame) -> DataFrame:
    """Signature stage — per-token ``hashlib.md5`` in an Arrow-batched
    Python map, batch-vectorized numpy vote.

    r5 note (VERDICT r4 #3 investigated, hypothesis REFUTED by
    measurement): this "Python hot loop" was A/B'd against three
    Spark-side alternatives at 100k docs / 15M tokens on local[32]
    (BENCH/PLANS.md r5 table) — JVM ``xxhash64`` inside a ``transform``
    HOF with the vote in numpy (1.6× slower: HOF lambdas evaluate boxed,
    interpreter-style, per token), a codegen ``explode`` + flat Arrow
    transfer (2.6× slower: 15M-row Arrow hand-off), and a fully-JVM
    64-column bit-sum ``groupBy`` (3.1× slower). ``hashlib.md5`` is a C
    hot loop, not a Python one; the per-token work beats every JVM
    re-expression measured. :func:`simhash_df_jvm` keeps the best
    JVM-hashed variant as a differential check and as the escape hatch
    for clusters where Python workers, not cores, are the scarce
    resource."""
    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "simhash": pd.array([_simhash64(s) for s in pdf["text"]],
                                    dtype="int64"),
            })

    from sanskrit_ocr_spark.ops.util import spread

    # spread the tiny-bytes/expensive-per-row input before the Python
    # stage (see ops.util.spread — one scan split would serialize every
    # simhash into a single task)
    return (spread(docs.select("doc_id", "text"))
            .mapInPandas(body, schema="doc_id long, simhash long"))


def simhash_df_jvm(docs: DataFrame) -> DataFrame:
    """JVM-hashed signature variant: ``xxhash64`` inside ``transform``
    over the whitespace ``split`` (token hashing on the JVM), with only
    the 64-lane majority vote in Python — the token-hash arrays arrive
    over Arrow and reduce via one ``np.unpackbits``/``reduceat`` pass per
    batch (no per-row Python). Token split mirrors ``str.split()``:
    regex ``\\s+``, empty fragments filtered.

    NOT the default: measured 1.6× slower than :func:`simhash_df` at
    100k docs (boxed HOF evaluation per token — see BENCH/PLANS.md r5).
    Signatures are xxhash64-based, i.e. deliberately NOT equal to
    :func:`simhash_df`'s md5-based ones; the differential pytest checks
    its vote against a scalar reference over the same JVM hashes."""
    toks = F.filter(F.split(F.col("text"), r"\s+"),
                    lambda x: x != F.lit(""))
    hashed = docs.select(
        "doc_id",
        F.transform(toks, lambda x: F.xxhash64(x)).alias("th"))

    def body(batches):
        import pyarrow as pa

        for batch in batches:
            lst = batch.column(1)
            # flat token hashes + doc offsets straight off the Arrow
            # ListArray — no per-row materialization at all
            offs = lst.offsets.to_numpy(zero_copy_only=False)
            flat = lst.flatten().to_numpy(zero_copy_only=False)
            sig = _vote64_flat(flat, np.diff(offs))
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(sig, type=pa.int64())],
                names=["doc_id", "simhash"])

    from sanskrit_ocr_spark.ops.util import spread

    return (spread(hashed)
            .mapInArrow(body, schema="doc_id long, simhash long"))


def dedup_simhash(spark, sf):
    """Near-dup pairs by SimHash: Manku permuted-block candidate tables
    (``hamming_candidates`` — full recall for hamming ≤ 3, ~32-bit keys),
    exact verify with bit_count(xor) ≤ SIMHASH_MAX_HAMMING."""
    sig = simhash_df(t(spark, sf, "documents"))
    cand = hamming_candidates(sig, "simhash",
                              max_hamming=SIMHASH_MAX_HAMMING)
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand
            .select("a_id", "b_id", ham.alias("hamming")).distinct()
            .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING))


# --- duplicate-cluster connected components (oracle via recursive CTE) ---------

def _dup_edges(spark, sf) -> DataFrame:
    """Deterministic duplicate-pair edge set: exact-content star edges
    (every doc → the min doc_id of its md5 group) plus the exact n-gram
    Jaccard near-dup pairs over the bounded oracle subset."""
    docs = t(spark, sf, "documents")
    hashed = docs.select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("h"))
    keepers = hashed.groupBy("h").agg(F.min("doc_id").alias("a_id"))
    exact = (hashed.join(keepers, "h")
             .filter(F.col("doc_id") != F.col("a_id"))
             .select("a_id", F.col("doc_id").alias("b_id")))
    near = dedup_ngram_jaccard(spark, sf).select("a_id", "b_id")
    return exact.union(near).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond", alg. 2): for each node u, connect every
    STRICTLY LARGER neighbor to min(Γ(u) ∪ {u}). The min is a plain
    aggregation (map-side partial — a 10^9-degree hub collapses to one
    candidate per map task), the emit is a join whose probe side streams
    (AQE-splittable)."""
    s = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mn = (s.groupBy("u").agg(F.min("v").alias("mv"))
          .select("u", F.least("mv", F.col("u")).alias("m")))
    return (s.join(mn, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round (ibid., alg. 3): orient every edge toward the
    smaller endpoint, then for each node u connect all its
    smaller-or-equal neighbors AND u itself to min(Γ(u) ∪ {u})."""
    o = e.select(F.greatest("u", "v").alias("u"),
                 F.least("u", "v").alias("v"))
    mn = (o.groupBy("u").agg(F.min("v").alias("mv"))
          .select("u", F.least("mv", F.col("u")).alias("m")))
    return (o.join(mn, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mn.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def connected_components(edges: DataFrame,
                         max_rounds: int = 50) -> tuple[DataFrame, int]:
    """Connected components by ALTERNATING large-star/small-star rounds
    (Kiveris et al. 2014) — O(log n) rounds on any graph, no diameter
    cap: a path graph of length L converges in ~log L alternations where
    plain min-label propagation needs L rounds (pinned by the long-chain
    pytest). Each round is two aggregations + two streaming joins on
    8-byte node ids; the only driver action is one 3-scalar fixed-point
    probe per round.

    ``edges``: distinct undirected pairs ``(u, v)``, one orientation,
    ``u != v``. Returns ``(star_edges, rounds)`` where ``star_edges`` is
    the converged star forest — exactly one row ``(u → component_min)``
    per non-root node; roots (and isolated nodes) don't appear."""
    e = edges.select("u", "v")
    prev = None
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        # localCheckpoint truncates the iterative lineage — without it
        # each round's plan embeds every previous round and analysis/
        # optimization time grows exponentially with round count (the
        # standard Spark iterative-algorithm trap)
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # multiset fingerprint of the edge set: count + order-insensitive
        # xor + sum of bounded per-edge hashes (ANSI-safe)
        cur = tuple(e.agg(
            F.count(F.lit(1)),
            F.bit_xor(F.xxhash64("u", "v")),
            F.sum(F.pmod(F.xxhash64("v", "u"), F.lit(1 << 32)))).first())
        if cur == prev:
            break
        prev = cur
    return e, rounds


def dedup_cluster_cc(spark, sf):
    """Duplicate-cluster assignment — the step every production MinHash
    dedup needs AFTER pair generation: connected components over the
    duplicate-pair graph, labeling each document with the minimum doc_id
    of its cluster (so "keep one per cluster" is ``doc_id == component``).

    r5 (VERDICT r4 #4): the bounded min-label-propagation loop was
    upgraded to the alternating large-star/small-star algorithm its
    docstring previously named (:func:`connected_components`) — O(log n)
    rounds, the ``CC_MAX_ITERS`` diameter cap gone. Same components as
    the recursive-CTE DuckDB oracle."""
    docs = t(spark, sf, "documents").select("doc_id")
    e0 = _dup_edges(spark, sf)
    stars, _ = connected_components(
        e0.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")))
    labels = (docs.join(stars.withColumnRenamed("u", "doc_id"),
                        "doc_id", "left")
              .select("doc_id",
                      F.coalesce("v", "doc_id").alias("lbl")))
    sizes = labels.groupBy("lbl").agg(F.count("*").alias("cluster_size"))
    return (labels.join(sizes, "lbl")
            .select("doc_id", F.col("lbl").alias("component"), "cluster_size"))


# The oracle computes the same components independently via a recursive CTE:
# labels propagate along edges (pruned to lbl < target — the component min
# reaches every member through monotone-decreasing paths), then min per node.
CC_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS tk
  FROM documents WHERE doc_id < {NGRAM_SUBSET}
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(tk) - 1),
           i -> tk[i] || ' ' || tk[i + 1]))) AS sh
  FROM toks WHERE len(tk) >= 2
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), near AS (
  SELECT a_id, b_id
  FROM inter JOIN sizes sa ON sa.doc_id = a_id
             JOIN sizes sb ON sb.doc_id = b_id
  WHERE round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 4)
        >= {JACCARD_THRESHOLD}
), hashes AS (
  SELECT doc_id, md5(text) AS h FROM documents
), keep AS (
  SELECT h, min(doc_id) AS a_id FROM hashes GROUP BY h
), exact AS (
  SELECT k.a_id, x.doc_id AS b_id
  FROM hashes x JOIN keep k USING (h) WHERE x.doc_id <> k.a_id
), e0 AS (
  SELECT a_id, b_id FROM exact UNION SELECT a_id, b_id FROM near
), e AS (
  SELECT a_id AS src, b_id AS dst FROM e0
  UNION SELECT b_id, a_id FROM e0
), reach AS (
  SELECT doc_id AS id, doc_id AS lbl FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.id WHERE r.lbl < e.dst
), comp AS (
  SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
)
SELECT doc_id, component,
       count(*) OVER (PARTITION BY component) AS cluster_size
FROM comp
"""


# --- paragraph-level exact dedup (C4/MassiveText sub-document dedup) ------------

PARA_WORDS = 10  # fixed-width word chunks stand in for paragraph breaks


def dedup_paragraphs(spark, sf):
    """Paragraph-level keep-first dedup (the C4 rule applied at
    sub-document granularity, as in MassiveText): split each document into
    ``PARA_WORDS``-word chunks, keep only the globally FIRST occurrence of
    each distinct chunk (first = min (doc_id, pos)), and reconstruct the
    cleaned text from the surviving chunks in original order.

    Scale shape (r5, ``subdoc_keep_first``): posexplode (narrow) → ONE
    shuffle on the paragraph hash whose ``min_by`` winners ARE the kept
    rows (map-side partial aggregation — a boilerplate paragraph repeated
    10^9× collapses to one candidate per map task, no row_number window
    straggler) → winners reassemble per doc → a doc-level join with the
    narrowly-computed per-doc paragraph totals. The paragraph strings
    cross exactly one shuffle; no per-row kept flag is ever
    materialized. At 100 TB this is the standard sub-document dedup —
    no driver state, no all-pairs anything."""
    from sanskrit_ocr_spark.ops.util import subdoc_keep_first

    docs = t(spark, sf, "documents")
    toks = F.split(F.trim(F.col("text")), " +")
    n_paras = F.ceil(F.size("toks") / PARA_WORDS).cast("long")
    paras = F.expr(
        f"transform(sequence(0, cast(ceil(size(toks) / {PARA_WORDS}.0) as int)"
        f" - 1), i -> array_join(slice(toks, i * {PARA_WORDS} + 1,"
        f" {PARA_WORDS}), ' '))")
    with_toks = docs.withColumn("toks", toks)
    ex = (with_toks
          .select("doc_id", F.posexplode(paras).alias("pos", "para"))
          .withColumn("ph", F.md5(F.encode("para", "UTF-8"))))
    totals = with_toks.select("doc_id", n_paras.alias("n_paras"))
    return subdoc_keep_first(ex, totals, ["doc_id"], ["doc_id", "pos"])


PARA_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS tk
  FROM documents
), ex AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(tk, (i - 1) * {PARA_WORDS} + 1,
                                    (i - 1) * {PARA_WORDS} + {PARA_WORDS}),
                         ' ') AS para
  FROM w, unnest(generate_series(1, cast(ceil(len(tk) / {PARA_WORDS}.0)
                                         AS INT))) AS t(i)
), fl AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY md5(para)
                            ORDER BY doc_id, pos) = 1 AS kept
  FROM ex
)
SELECT doc_id, count(*)::BIGINT AS n_paras,
       sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       coalesce(string_agg(CASE WHEN kept THEN para END, ' '
                           ORDER BY pos), '') AS clean_text
FROM fl GROUP BY doc_id
"""


# --- benchmark decontamination (eval-set n-gram overlap; oracle) ----------------

CONTAM_K = 8  # shared-shingle width; GPT-3 used 13-grams, Llama 2 uses 8+


def _word_shingles(words, k: int):
    """k-word shingle array, empty when the doc is shorter than k (guard
    matters: sequence(0, negative) would DESCEND in Spark)."""
    return (F.when(F.size(words) >= k,
                   F.transform(F.sequence(F.lit(0), F.size(words) - k),
                               lambda i: F.array_join(
                                   F.slice(words, i + 1, k), " ")))
            .otherwise(F.array().cast("array<string>")))


def dedup_contamination(spark, sf):
    """Benchmark decontamination (the published GPT-2/3/Llama methodology):
    flag every training document that shares at least one ``CONTAM_K``-word
    shingle with a held-out eval slice (here ``doc_id % 20 == 0`` stands in
    for the benchmark suite). Emits one row per contaminated
    (train doc, eval doc) pair with the distinct-shared-shingle count.

    Scale shape: a real decontamination pass has a TINY eval side (a
    benchmark suite) against a 100 TB train side — so the eval shingle set
    is broadcast, the train side explodes shingles map-side, and the only
    wide operation is the final per-pair aggregate whose key space is
    bounded by actual contamination."""
    docs = t(spark, sf, "documents")
    words = F.split(F.trim(F.col("text")), " +")
    sh = docs.select("doc_id",
                     F.explode(_word_shingles(words, CONTAM_K)).alias("g"))
    ev = F.broadcast(sh.filter(F.col("doc_id") % 20 == 0)
                     .select(F.col("doc_id").alias("eval_id"), "g")
                     .distinct())
    train = sh.filter(F.col("doc_id") % 20 != 0).distinct()
    return (train.join(ev, "g")
            .groupBy("doc_id", "eval_id")
            .agg(F.count("*").alias("n_shared")))


CONTAM_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS ws
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i + {CONTAM_K - 1}], ' ') AS g
  FROM w, unnest(generate_series(1, greatest(len(ws) - {CONTAM_K - 1}, 0)))
         AS t(i)
), ev AS (
  SELECT DISTINCT doc_id AS eval_id, g FROM sh WHERE doc_id % 20 = 0
)
SELECT s.doc_id, e.eval_id, count(*) AS n_shared
FROM sh s JOIN ev e USING (g)
WHERE s.doc_id % 20 <> 0
GROUP BY s.doc_id, e.eval_id
"""


QUERIES = {
    "dedup_exact_hash": dedup_exact_hash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_contamination": dedup_contamination,
    "dedup_cluster_cc": dedup_cluster_cc,
    "dedup_paragraphs": dedup_paragraphs,
}

ORACLES = {
    "dedup_exact_hash": EXACT_SQL,
    "dedup_ngram_jaccard": NGRAM_SQL,
    "dedup_contamination": CONTAM_SQL,
    "dedup_cluster_cc": CC_SQL,
    "dedup_paragraphs": PARA_SQL,
    # dedup_minhash_lsh / dedup_simhash are probabilistic in RECALL but
    # fully deterministic in VALUE (fixed xxhash64/md5 hash derivations over
    # fixed testdata), so their sf0.01 outputs are pinned as committed
    # golden parquet — the same regression-pin regime as golden_x1_500
    # (regenerate via tools/regen_fixtures.py with any intentional change;
    # recall vs the exact ops stays asserted in pytest as the semantic
    # ground truth).
    "dedup_minhash_lsh":
        f"SELECT * FROM read_parquet('{FIXTURES_DIR}/golden_minhash_lsh_sf001.parquet')",
    "dedup_simhash":
        f"SELECT * FROM read_parquet('{FIXTURES_DIR}/golden_simhash_sf001.parquet')",
}
