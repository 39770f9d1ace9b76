"""Property tests for the r5 skew-proof first-wins helpers: differential
against brute-force Python on randomized corpora (duplicates, empties,
ties, hot keys)."""

import random

from pyspark.sql import functions as F

from sanskrit_ocr_spark.ops.util import keep_first, mark_first, subdoc_keep_first


def _corpus(seed, n):
    rng = random.Random(seed)
    texts = [f"t{i}" for i in range(max(1, n // 3))]
    rows = []
    for i in range(n):
        # hot key: text index 0 drawn with high probability
        t = texts[0] if rng.random() < 0.4 else rng.choice(texts)
        rows.append((i, rng.randrange(5), t))
    return rows


def test_keep_first_matches_bruteforce(spark):
    for seed in (1, 7, 42):
        rows = _corpus(seed, 200)
        df = spark.createDataFrame(rows, "doc_id long, ts long, text string")
        got = {(r["doc_id"], r["ts"], r["text"])
               for r in keep_first(df, "text", ["ts", "doc_id"]).collect()}
        best = {}
        for doc_id, ts, text in rows:
            k = text
            if k not in best or (ts, doc_id) < (best[k][1], best[k][0]):
                best[k] = (doc_id, ts, text)
        assert got == set(best.values()), f"seed {seed}"


def test_mark_first_matches_bruteforce(spark):
    rows = _corpus(3, 150)
    df = spark.createDataFrame(rows, "doc_id long, ts long, text string")
    got = {(r["doc_id"]): r["kept"]
           for r in mark_first(df, "text", ["ts", "doc_id"]).collect()}
    winners = {}
    for doc_id, ts, text in rows:
        if text not in winners or (ts, doc_id) < winners[text]:
            winners[text] = (ts, doc_id)
    for doc_id, ts, text in rows:
        assert got[doc_id] == (winners[text] == (ts, doc_id)), doc_id


def test_subdoc_keep_first_matches_bruteforce(spark):
    """Random docs built from a small paragraph pool (heavy duplication,
    docs that lose every paragraph, singleton docs): n_paras, n_kept and
    the reassembled clean_text must equal the sequential keep-first
    replay."""
    rng = random.Random(11)
    pool = [f"para{i}" for i in range(12)]
    docs = []
    for d in range(40):
        k = rng.randrange(1, 6)
        docs.append((d, [rng.choice(pool) for _ in range(k)]))

    ex_rows = [(d, pos, para) for d, paras in docs
               for pos, para in enumerate(paras)]
    ex = (spark.createDataFrame(ex_rows, "doc_id long, pos int, para string")
          .withColumn("ph", F.md5(F.encode("para", "UTF-8"))))
    totals = spark.createDataFrame(
        [(d, len(paras)) for d, paras in docs], "doc_id long, n_paras long")
    got = {r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
           for r in subdoc_keep_first(ex, totals, ["doc_id"],
                                      ["doc_id", "pos"]).collect()}

    seen = set()
    for d, paras in sorted(docs):  # (doc_id, pos) order == replay order
        kept = []
        for para in paras:
            if para not in seen:
                seen.add(para)
                kept.append(para)
        want = (len(paras), len(kept), " ".join(kept))
        assert got[d] == want, (d, got[d], want)
    assert set(got) == {d for d, _ in docs}
