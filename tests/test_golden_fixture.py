"""Committed golden fixture (FIXTURES.md §A2): the pure kernels and datagen
must keep reproducing tests/fixtures/golden_extracted_300.parquet EXACTLY —
this pins extraction semantics across refactors (any intentional semantic
change must regenerate the fixture in the same commit and say why)."""

import json
import os

import pandas as pd

from sanskrit_ocr_spark.datagen.pages import pages_pandas
from sanskrit_ocr_spark.kernels.page import extract_page

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_extracted_300.parquet")


def test_kernels_reproduce_committed_goldens():
    golden = pd.read_parquet(FIXTURE).set_index("url")
    seen = set()
    checked = 0
    for _, r in pages_pandas(0, 300).iterrows():
        if r["url"] in seen:
            continue
        seen.add(r["url"])
        t, sp, n, st = extract_page(r["html"])
        g = golden.loc[r["url"]]
        assert t == g["text"], f"text drift for {r['url']}"
        assert json.dumps([{"start": a, "end": b} for a, b in sp]) \
            == g["sentences_json"], f"span drift for {r['url']}"
        assert n == g["n_graphemes"]
        assert st == g["status"]
        checked += 1
    assert checked == len(golden) == 294
