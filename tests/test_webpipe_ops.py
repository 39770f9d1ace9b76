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

import re

import numpy as np
import pandas as pd

from sanskrit_ocr_spark.ops.dedup import CONTAM_K, dedup_contamination
from sanskrit_ocr_spark.ops.simsearch import SEMDEDUP_COS, ann_semantic_dedup
from sanskrit_ocr_spark.ops.textstats import (
    EMAIL_RE,
    PHONE_RE,
    ts_pii_scrub,
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
