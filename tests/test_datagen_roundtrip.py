"""Round-trip property: synthesize page → extract → equals post-processed
source text (SURVEY.md §5 item 3), plus corpus-shape invariants."""

from sanskrit_ocr_spark.datagen.pages import pages_pandas
from sanskrit_ocr_spark.kernels.devanagari import devanagari_post
from sanskrit_ocr_spark.kernels.page import (
    STATUS_DECODE_FAIL,
    STATUS_EMPTY,
    STATUS_OK,
    STATUS_PARSE_FAIL,
    extract_page,
)

N = 300  # three full 100-row inventory blocks


def _corpus():
    return pages_pandas(0, N)


def test_determinism_and_partition_independence():
    a = pages_pandas(0, N)
    b0, b1 = pages_pandas(0, 117), pages_pandas(117, N - 117)
    assert a.iloc[0]["html"] == b0.iloc[0]["html"]
    assert a.iloc[200]["html"] == b1.iloc[200 - 117]["html"]
    assert (a["url"].iloc[:117].tolist() == b0["url"].tolist())


def test_roundtrip_wellformed_rows():
    """For every well-formed 'sa' row: extraction recovers exactly
    devanagari_post(source_text)."""
    df = _corpus()
    checked = 0
    for i, row in df.iterrows():
        kind = i % 100
        if kind in (67, 68, 88, 89) or 85 <= kind <= 87:
            continue  # failure rows (incl. warped PDFs), no round-trip
        # NB: degraded-but-recoverable rows (55-59 markup damage, 65 jitter,
        # 66 rotation) stay IN the contract — robustness means byte-equal.
        expected, exp_spans, exp_n = devanagari_post(row["text"])
        got_text, got_spans, got_n, status = extract_page(row["html"])
        assert status == STATUS_OK, (i, status)
        assert got_text == expected, (i, got_text, expected)
        assert got_spans == exp_spans
        assert got_n == exp_n
        checked += 1
    assert checked >= 270


def test_failure_rows_statuses():
    df = _corpus()
    for i, row in df.iterrows():
        kind = i % 100
        status = extract_page(row["html"])[3]
        if kind == 88:
            assert status == STATUS_DECODE_FAIL
        elif kind in (67, 68, 89):
            # 67/68: warped layouts (L9/L8) must fail cleanly, never emit
            # garbled reading order; 89: corrupt JSON
            assert status == STATUS_PARSE_FAIL
        elif 85 <= kind <= 87:
            assert status == STATUS_EMPTY


def test_duplicate_text_rows_match_block_head():
    df = _corpus()
    for base in (0, 100, 200):
        head = df.iloc[base]["text"]
        for k in range(80, 85):
            assert df.iloc[base + k]["text"] == head


def test_duplicate_url_rows():
    df = _corpus()
    for base in (0, 100, 200):
        for k in (98, 99):
            assert df.iloc[base + k]["url"] == df.iloc[base]["url"]
    # everything else unique
    non_dup = [u for i, u in enumerate(df["url"]) if i % 100 < 98]
    assert len(set(non_dup)) == len(non_dup)


def test_host_skew_present():
    df = _corpus()
    hosts = df["url"].str.extract(r"https://site(\d+)\.example")[0]
    frac0 = (hosts == "0").mean()
    assert 0.2 < frac0 < 0.45  # deliberate mega-host skew


def test_warc_ts_monotone():
    df = _corpus()
    assert df["warc_ts"].is_monotonic_increasing


def test_style_map_present_and_ignored():
    """L11 analog (render_text.py:429-436): every page samples one of four
    styles → ink/background CSS + body class. All four must appear across
    the corpus, deterministically, and extraction must ignore them
    (asserted transitively by the roundtrip + golden tests)."""
    import re

    df = _corpus()
    styles = []
    for _, row in df.iterrows():
        m = re.search(rb'<body class="(\w+)"', bytes(row["html"]))
        if m:
            styles.append(m.group(1).decode())
    assert set(styles) == {"lined", "old", "birch", "parchment"}
    again = []
    for _, row in _corpus().iterrows():
        m = re.search(rb'<body class="(\w+)"', bytes(row["html"]))
        if m:
            again.append(m.group(1).decode())
    assert styles == again
