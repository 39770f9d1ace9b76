"""External-corpus robustness fixtures (r3 VERDICT #8): committed
real-world-style HTML pages through ``extract_page``, pinning charset
sniffing, malformed-markup recovery, suppressed containers and the
content filter beyond the synthetic generator's distribution. Golden
outputs regenerate via tools/regen_fixtures.py."""

import json
import os

import pandas as pd
import pytest

from sanskrit_ocr_spark.conf import FIXTURES_DIR
from sanskrit_ocr_spark.kernels.page import extract_page

SRC = os.path.join(FIXTURES_DIR, "realhtml")
GOLDEN = pd.read_parquet(
    os.path.join(FIXTURES_DIR, "golden_realhtml.parquet")).set_index("file")


def _run(name):
    with open(os.path.join(SRC, name), "rb") as f:
        return extract_page(f.read())


@pytest.mark.parametrize("name", sorted(GOLDEN.index))
def test_realhtml_golden(name):
    t, sp, n, st = _run(name)
    g = GOLDEN.loc[name]
    assert t == g["text"]
    assert json.dumps([{"start": a, "end": b} for a, b in sp]) \
        == g["sentences_json"]
    assert n == g["n_graphemes"]
    assert st == g["status"]


def test_realhtml_semantics():
    """Behavioral pins independent of the golden bytes."""
    # charset sniff: cp1252 bytes (invalid UTF-8) decode via the declared
    # meta charset, and numeric charrefs yield real Devanagari
    t, sp, n, st = _run("legacy_cp1252.html")
    assert st == "OK" and "विद्या धनम्।" in t
    # legacy chrome (curly-quote English) is filtered out entirely
    assert "hello" not in t

    # suppressed containers contribute nothing
    t, _, _, st = _run("tables_nested.html")
    assert st == "OK"
    for frag in ("nojs", "टेम्पलेट", "एसवीजी", "सारणी"):
        assert frag not in t
    assert "भीतरी कक्ष" in t and "बाहरी कक्ष॥" in t

    # broken markup recovers instead of raising; all three blocks survive
    t, sp, _, st = _run("broken_markup.html")
    assert st == "OK" and len(sp) >= 2
    assert "तीसरा खण्ड॥" in t

    # failure codes, not silent drops
    assert _run("english_only.html")[3] == "EMPTY"
    assert _run("undeclared_bytes.html")[3] == "DECODE_FAIL"


def test_realhtml_through_spark_pipeline(spark):
    """The same committed pages through the distributed path: statuses and
    text match the pure-kernel goldens byte-for-byte (one Arrow batch)."""
    from datetime import datetime

    from sanskrit_ocr_spark.extract.pipeline import extract_pages

    rows = []
    for name in sorted(GOLDEN.index):
        with open(os.path.join(SRC, name), "rb") as f:
            rows.append((f"https://fixtures.example.org/{name}",
                         datetime(2025, 7, 4), f.read(), "", "hi"))
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string,"
              " lang string")
    got = {os.path.basename(r["url"]): r
           for r in extract_pages(pages).collect()}
    for name in GOLDEN.index:
        g = GOLDEN.loc[name]
        assert got[name]["text"] == g["text"], name
        assert got[name]["status"] == g["status"], name
        assert got[name]["n_graphemes"] == g["n_graphemes"], name
