"""Semantic unit tests for the web-pipeline ops added in round 3 —
independent expectations (numpy cosine / Python ``re``), not oracle
re-runs (oracle parity is covered by test_ops_oracle.py).

* ``ann_semantic_dedup``   — SemDeDup keep-first rule vs a numpy replay;
* ``dedup_contamination``  — n-gram overlap vs a pure-Python shingle set;
* ``ts_pii_scrub``         — redaction counts follow the planted formula,
                             scrubbed text matches ``re.sub``;
* ``ts_url_canonicalize``  — canonical form has no tracking params, ports,
                             fragments, www, or uppercase authority.
"""

import hashlib
import re

import numpy as np
import pandas as pd

from sanskrit_ocr_spark.ops.dedup import (
    CONTAM_K,
    JACCARD_THRESHOLD,
    NGRAM_SUBSET,
    PARA_WORDS,
    dedup_cluster_cc,
    dedup_contamination,
    dedup_paragraphs,
)
from sanskrit_ocr_spark.ops.simsearch import SEMDEDUP_COS, ann_semantic_dedup
from sanskrit_ocr_spark.ops.textstats import (
    EMAIL_RE,
    PHONE_RE,
    SEQ_CAP,
    ts_pii_scrub,
    ts_seq_pack,
    ts_source_mix,
    ts_url_canonicalize,
)

SF = "/root/testdata/sf0.001"


def test_semantic_dedup_matches_numpy_replay(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    survivors_expected = set()
    for label, grp in emb.groupby("label"):
        grp = grp.sort_values("vec_id")
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in grp["embedding"]])
        norms = np.sqrt((mat * mat).sum(axis=1))
        cos = np.round((mat @ mat.T) / np.outer(norms, norms), 4)
        ids = grp["vec_id"].to_numpy()
        for j in range(len(ids)):
            # pruned iff ANY lower-id vector in the cell is >= threshold
            if not any(cos[i, j] >= SEMDEDUP_COS for i in range(j)):
                survivors_expected.add((int(label), int(ids[j])))
    got = {(r["label"], r["vec_id"])
           for r in ann_semantic_dedup(spark, SF).collect()}
    assert got == survivors_expected
    # the rule keeps at least one vector per non-empty cell
    assert {lb for lb, _ in got} == set(emb["label"].unique())


def test_contamination_matches_python_shingles(spark):
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    shingles = {}
    for _, r in docs.iterrows():
        ws = re.split(" +", r["text"].strip())
        shingles[r["doc_id"]] = {
            " ".join(ws[i:i + CONTAM_K])
            for i in range(len(ws) - CONTAM_K + 1)}
    expected = {}
    eval_ids = [d for d in shingles if d % 20 == 0]
    for d, sh in shingles.items():
        if d % 20 == 0:
            continue
        for e in eval_ids:
            n = len(sh & shingles[e])
            if n:
                expected[(d, e)] = n
    got = {(r["doc_id"], r["eval_id"]): r["n_shared"]
           for r in dedup_contamination(spark, "/root/testdata/sf0.01")
           .collect()}
    assert got == expected
    assert len(got) > 0, "contamination check must be non-vacuous at sf0.01"


def test_pii_scrub_counts_follow_planted_formula(spark):
    rows = ts_pii_scrub(spark, SF).collect()
    assert any(r["n_emails"] > 0 for r in rows)
    assert any(r["n_phones"] > 0 for r in rows)
    for r in rows:
        # the base corpus is lowercase bag-of-words: the only matches are
        # the planted contact strings
        assert r["n_emails"] == (1 if r["doc_id"] % 5 == 0 else 0)
        assert r["n_phones"] == (1 if r["doc_id"] % 7 == 0 else 0)
        assert ("<EMAIL>" in r["scrubbed"]) == (r["doc_id"] % 5 == 0)
        assert ("<PHONE>" in r["scrubbed"]) == (r["doc_id"] % 7 == 0)
        assert not re.search(EMAIL_RE, r["scrubbed"])
        assert not re.search(PHONE_RE, r["scrubbed"])


def test_url_canonicalize_output_is_canonical(spark):
    rows = ts_url_canonicalize(spark, SF).collect()
    for r in rows:
        c = r["canon"]
        assert not re.search(r"utm_|fbclid|gclid", c)
        assert "#" not in c
        assert ":443" not in c and ":80" not in c
        assert "://www." not in c
        assert not c.endswith("?") and not c.endswith("&")
        authority = re.match(r"^[^/]*//[^/]*", c).group(0)
        assert authority == authority.lower()
        assert r["domain"] == re.match(r"^https?://([^/:]+)", c).group(1)
        # non-tracking params survive the strip
        if r["doc_id"] % 3 in (0, 1):
            assert f"?id={r['doc_id'] % 97}" in c
    d0 = {r["doc_id"]: r for r in rows}
    assert d0[0]["canon"] == "https://src0-news.example.com/Articles/0?id=0"
    assert d0[0]["domain"] == "src0-news.example.com"


def _union_find_components(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def test_cluster_cc_matches_union_find_replay(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    by_hash = {}
    for _, r in docs.iterrows():
        by_hash.setdefault(
            hashlib.md5(r["text"].encode()).hexdigest(), []).append(
            int(r["doc_id"]))
    edges = [(min(ids), d) for ids in by_hash.values()
             for d in ids if d != min(ids)]
    sub = docs[docs.doc_id < NGRAM_SUBSET]
    shingles = {}
    for _, r in sub.iterrows():
        ws = re.split(" +", r["text"].strip())
        if len(ws) >= 2:
            shingles[int(r["doc_id"])] = {
                f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)}
    ids = sorted(shingles)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(shingles[a] & shingles[b])
            if inter:
                j = round(inter / (len(shingles[a]) + len(shingles[b])
                                   - inter), 4)
                if j >= JACCARD_THRESHOLD:
                    edges.append((a, b))
    comp = _union_find_components(
        [int(d) for d in docs["doc_id"]], edges)
    got = {r["doc_id"]: (r["component"], r["cluster_size"])
           for r in dedup_cluster_cc(spark, SF).collect()}
    sizes = pd.Series(list(comp.values())).value_counts()
    assert got == {d: (c, int(sizes[c])) for d, c in comp.items()}
    assert any(s > 1 for _, s in got.values()), "non-vacuous"


def test_cluster_cc_merges_transitive_chain(spark, tmp_path):
    # doc 0 ~ doc 1 (near-dup, high bigram jaccard), doc 1 == doc 2
    # (exact dup), doc 3 isolated: CC must produce {0,1,2} + {3} even
    # though 0 and 2 share no direct edge.
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " tokX"
    pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [base, near, near, "something else entirely here"],
        "lang": ["en"] * 4,
        "source": ["s"] * 4,
        "n_chars": [len(base), len(near), len(near), 28],
    }).to_parquet(tmp_path / "documents.parquet")
    rows = {r["doc_id"]: r for r in
            dedup_cluster_cc(spark, str(tmp_path)).collect()}
    assert [rows[d]["component"] for d in range(4)] == [0, 0, 0, 3]
    assert [rows[d]["cluster_size"] for d in range(4)] == [3, 3, 3, 1]


def test_paragraph_dedup_python_replay(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    paras = []  # (doc_id, pos, para) in global keep-first order
    for _, r in docs.sort_values("doc_id").iterrows():
        ws = re.split(" +", r["text"].strip())
        for pos in range(-(-len(ws) // PARA_WORDS)):
            paras.append((int(r["doc_id"]), pos,
                          " ".join(ws[pos * PARA_WORDS:
                                      (pos + 1) * PARA_WORDS])))
    seen, expected = set(), {}
    for d, pos, p in sorted(paras):
        n, k, txt = expected.get(d, (0, 0, []))
        kept = p not in seen
        seen.add(p)
        expected[d] = (n + 1, k + kept, txt + ([p] if kept else []))
    got = {r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
           for r in dedup_paragraphs(spark, SF).collect()}
    assert got == {d: (n, k, " ".join(t))
                   for d, (n, k, t) in expected.items()}
    assert any(k < n for n, k, _ in got.values()), "non-vacuous"


def test_seq_pack_cumsum_replay(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["n_tokens"] = docs["text"].map(
        lambda s: len(re.split(" +", s.strip())))
    docs = docs.sort_values(["source", "doc_id"])
    docs["offset"] = (docs.groupby("source")["n_tokens"].cumsum()
                      - docs["n_tokens"])
    docs["seq_id"] = docs["offset"] // SEQ_CAP
    got = {r["doc_id"]: (r["n_tokens"], r["offset"], r["seq_id"])
           for r in ts_seq_pack(spark, SF).collect()}
    for _, r in docs.iterrows():
        assert got[r["doc_id"]] == (r["n_tokens"], r["offset"], r["seq_id"])
    assert max(s for _, _, s in got.values()) >= 1, "multiple sequences"


def test_source_mix_numpy_replay(spark):
    rows = ts_source_mix(spark, SF).collect()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["n_tokens"] = docs["text"].map(
        lambda s: len(re.split(" +", s.strip())))
    per = docs.groupby("source")["n_tokens"].sum()
    s = np.sqrt(per.to_numpy(dtype=np.float64))
    weights = dict(zip(per.index, np.round(s / s.sum(), 6)))
    for r in rows:
        assert abs(r["weight"] - weights[r["source"]]) < 2e-6
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    # smoothing: weights are flatter than raw proportions
    raw = per / per.sum()
    assert max(r["weight"] for r in rows) <= raw.max() + 1e-9


def test_hash_split_python_replay(spark):
    from sanskrit_ocr_spark.ops.textstats import (
        FP_MOD, FP_MUL, SPLIT_BUCKETS, SPLIT_TRAIN_LT, ts_hash_split)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    rows = {r["doc_id"]: r for r in ts_hash_split(spark, SF).collect()}
    for _, d in docs.iterrows():
        acc = 0
        for ch in d["text"]:
            acc = (acc * FP_MUL + ord(ch)) % FP_MOD
        b = acc % SPLIT_BUCKETS
        want = ("train" if b < SPLIT_TRAIN_LT
                else "val" if b < SPLIT_TRAIN_LT + 5 else "test")
        r = rows[d["doc_id"]]
        assert (r["bucket"], r["split"]) == (b, want)
    # content-keyed: exact duplicates always land in the same split
    by_text = docs.groupby("text")["doc_id"].agg(list)
    for ids in by_text:
        assert len({rows[i]["split"] for i in ids}) == 1
    assert {r["split"] for r in rows.values()} == {"train", "val", "test"}


def test_url_dedup_python_replay(spark):
    from sanskrit_ocr_spark.ops.textstats import (
        URL_DEDUP_PATHS, dedup_url_canonical)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    groups = {}
    for d in sorted(int(x) for x in docs["doc_id"]):
        # replay the canonical form every planted variant collapses to:
        # scheme/www/port/tracking/fragment noise cancels; d%2 and d%3 are
        # invariant within a path group because URL_DEDUP_PATHS % 6 == 0
        p = d % URL_DEDUP_PATHS
        scheme = "https" if d % 2 == 0 else "http"
        query = f"?id={p % 97}" if d % 3 in (0, 1) else ""
        canon = f"{scheme}://news{p % 4}.example.com/Articles/{p}{query}"
        groups.setdefault(canon, []).append(d)
    got = {r["canon"]: (r["domain"], r["keeper"], r["n_dups"])
           for r in dedup_url_canonical(spark, SF).collect()}
    want = {c: (f"news{(min(ids) % URL_DEDUP_PATHS) % 4}.example.com",
                min(ids), len(ids))
            for c, ids in groups.items()}
    assert got == want
    assert max(n for _, _, n in got.values()) > 1, "non-vacuous"


def test_lm_score_python_replay(spark):
    import math

    from sanskrit_ocr_spark.ops.textstats import (
        LM_OOV_COUNT, LM_TOP_K, ts_lm_score)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    counts = {}
    toks_by_doc = {}
    for _, r in docs.iterrows():
        ws = re.split(" +", r["text"].strip())
        toks_by_doc[int(r["doc_id"])] = ws
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    # the capped model: top-K unigrams (count desc, token asc), OOV floor
    topk = dict(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
                [:LM_TOP_K])
    assert len(counts) > LM_TOP_K, "cap must be exercised at this sf"
    got = {r["doc_id"]: (r["n_tokens"], r["avg_logp"])
           for r in ts_lm_score(spark, SF).collect()}
    for d, ws in toks_by_doc.items():
        want = round(sum(math.log(topk.get(w, LM_OOV_COUNT) / total)
                         for w in ws) / len(ws), 4)
        n, avg = got[d]
        assert n == len(ws)
        assert abs(avg - want) <= 1e-4  # summation-order ulp at the boundary
    # rare-token docs score lower than common-token docs
    assert min(a for _, a in got.values()) < max(a for _, a in got.values())


def test_mix_sample_python_replay(spark):
    import math

    from sanskrit_ocr_spark.ops.textstats import (
        FP_MOD, FP_MUL, MIX_SAMPLE_FRACTION, ts_mix_sample)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["n_tok"] = docs["text"].map(
        lambda s: len(re.split(" +", s.strip())))
    per = docs.groupby("source").agg(n_docs=("doc_id", "size"),
                                     n_tok=("n_tok", "sum"))
    # decimal(30,15) truncation replay: quantize sqrt to 15 decimals
    from decimal import Decimal, ROUND_HALF_UP
    s = per["n_tok"].map(lambda v: Decimal(repr(math.sqrt(v))).quantize(
        Decimal("1e-15"), rounding=ROUND_HALF_UP))
    st = float(sum(s))
    nd = float(per["n_docs"].sum())
    rates = {
        src: min(1.0, MIX_SAMPLE_FRACTION * round(float(s[src]) / st, 6)
                 * nd / per.loc[src, "n_docs"])
        for src in per.index}
    expected = set()
    for _, r in docs.iterrows():
        acc = 0
        for ch in r["text"]:
            acc = (acc * FP_MUL + ord(ch)) % FP_MOD
        if acc % 1000000 < math.floor(rates[r["source"]] * 1000000):
            expected.add(int(r["doc_id"]))
    got = {r["doc_id"] for r in ts_mix_sample(spark, SF).collect()}
    assert got == expected
    # composition sanity: roughly the target fraction overall
    assert 0.3 < len(got) / len(docs) < 0.7


def test_phash_robustness_and_neardup_correlation(spark):
    from sanskrit_ocr_spark.datagen.images import render_text_png
    from sanskrit_ocr_spark.kernels.png import decode_png, encode_png
    from sanskrit_ocr_spark.ops.dedup import dedup_ngram_jaccard
    from sanskrit_ocr_spark.ops.multimodal import (
        PHASH_MAX_HAMMING, mm_phash_dedup, phash64)

    # 1. a one-pixel perturbation moves the hash by at most a few bits
    def hamming64(x, y):
        # phash64 is SIGNED 64-bit (Spark long); mask before popcount —
        # bin() of a negative xor counts magnitude bits, not two's
        # complement
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    png = render_text_png("spark table scan merge join filter window")
    w, h, ch, pix = decode_png(png)
    buf = bytearray(pix)
    buf[len(buf) // 2] ^= 0x40
    perturbed = encode_png(bytes(buf), w, h, channels=ch)
    assert hamming64(phash64(png), phash64(perturbed)) <= PHASH_MAX_HAMMING

    # 2. unrelated texts are far apart
    other = render_text_png("completely different words entirely here now")
    assert hamming64(phash64(png), phash64(other)) > 10

    # 3. near-dup TEXTS mostly render to near-dup IMAGES (measured: 6 of
    # the 7 planted pairs land at hamming 2-6 vs random-pair median ~27;
    # one pair's renders differ in geometry and legitimately diverge),
    # and every emitted pair re-verifies under a direct recompute
    sf = "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sf}/documents.parquet").set_index("doc_id")

    def ham(a, b):
        ha = phash64(render_text_png(docs.loc[a, "text"]))
        hb = phash64(render_text_png(docs.loc[b, "text"]))
        return hamming64(ha, hb)

    text_pairs = {(r["a_id"], r["b_id"])
                  for r in dedup_ngram_jaccard(spark, sf).collect()}
    assert text_pairs
    close = sum(ham(a, b) <= 8 for a, b in text_pairs)
    assert close >= len(text_pairs) - 1
    img_pairs = {(r["a_id"], r["b_id"]): r["hamming"]
                 for r in mm_phash_dedup(spark, sf).collect()}
    assert img_pairs
    for (a, b), d in img_pairs.items():
        assert ham(a, b) == d <= PHASH_MAX_HAMMING


def test_cc_star_rounds_converge_on_long_chain(spark):
    """r5: the alternating large-star/small-star CC must collapse a
    50-node PATH graph (diameter 49 — the case the old min-label
    propagation's CC_MAX_ITERS=12 cap could not finish) into one
    component in O(log n) rounds."""
    from sanskrit_ocr_spark.ops.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(49)], "u long, v long")
    stars, rounds = connected_components(edges)
    rows = stars.collect()
    assert {r["v"] for r in rows} == {0}, "all nodes must point at min"
    assert {r["u"] for r in rows} == set(range(1, 50))
    assert rounds <= 10, f"expected O(log n) rounds, used {rounds}"


def test_cc_star_rounds_star_and_isolated(spark):
    from sanskrit_ocr_spark.ops.dedup import connected_components

    # two components: a clique-ish triangle {5,6,7} and a pair {1,9}
    edges = spark.createDataFrame(
        [(5, 6), (6, 7), (5, 7), (9, 1)], "u long, v long")
    stars, _ = connected_components(edges)
    got = {(r["u"], r["v"]) for r in stars.collect()}
    assert got == {(6, 5), (7, 5), (9, 1)}
