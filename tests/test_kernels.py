"""Pure-kernel unit tests (no Spark). These pin the extraction semantics the
golden fixtures encode — SURVEY.md §5."""

import unicodedata

import pytest

from sanskrit_ocr_spark.kernels.devanagari import (
    devanagari_post,
    filter_devanagari,
    grapheme_clusters,
    grapheme_count,
    sentence_spans,
)
from sanskrit_ocr_spark.kernels.htmlx import extract_html
from sanskrit_ocr_spark.kernels.page import (
    STATUS_DECODE_FAIL,
    STATUS_EMPTY,
    STATUS_OK,
    STATUS_PARSE_FAIL,
    STATUS_TOO_LONG,
    MAX_HTML_BYTES,
    extract_page,
)
from sanskrit_ocr_spark.kernels.pdfish import PDF_MAGIC, extract_pdf_layout


# ---------------------------------------------------------------------------
# P1 — Devanagari content filter (reference h5_to_parquet.py:17-21)
# ---------------------------------------------------------------------------

def test_filter_keeps_devanagari_and_space():
    assert filter_devanagari("नमस्ते world १२३ ।") == "नमस्ते  १२३ ।"


def test_filter_strips_edges():
    assert filter_devanagari("  hello देव  ") == "देव"


def test_filter_keeps_danda_both_forms():
    assert filter_devanagari("क। ख॥") == "क। ख॥"


def test_filter_empty_result():
    assert filter_devanagari("english only!") == ""


def test_filter_preserves_interior_space_runs():
    # The reference regex deletes non-[dev|space] runs but leaves space runs
    # untouched — "a b" with tabs between becomes glued, spaces stay doubled.
    assert filter_devanagari("क  ख") == "क  ख"
    assert filter_devanagari("क\t\tख") == "कख"


# ---------------------------------------------------------------------------
# P5 inverse — danda sentence spans
# ---------------------------------------------------------------------------

def test_sentence_spans_basic():
    t = "क ख ग । घ ङ।।"
    spans = sentence_spans(t)
    assert [t[s:e] for s, e in spans] == ["क ख ग", "घ ङ"]


def test_sentence_spans_real_double_danda():
    t = "क ख॥"
    assert [t[s:e] for s, e in sentence_spans(t)] == ["क ख"]


def test_sentence_spans_no_trailing_danda():
    t = "क ख"
    assert [t[s:e] for s, e in sentence_spans(t)] == ["क ख"]


def test_sentence_spans_empty_segments_skipped():
    assert sentence_spans("।।") == []
    assert sentence_spans("") == []


# ---------------------------------------------------------------------------
# Grapheme clustering (conjunct-safe)
# ---------------------------------------------------------------------------

def test_grapheme_simple_syllable():
    assert grapheme_clusters("का") == ["का"]


def test_grapheme_conjunct_not_split():
    # क + ् + ष must be ONE cluster
    assert grapheme_clusters("क्ष") == ["क्ष"]


def test_grapheme_conjunct_with_zwj_zwnj():
    assert grapheme_clusters("क्‍ष") == ["क्‍ष"]
    assert grapheme_clusters("क्‌ष") == ["क्‌ष"]


def test_grapheme_word():
    # नमस्ते = न म स्ते -> clusters: न, म, स्ते
    assert grapheme_clusters("नमस्ते") == ["न", "म", "स्ते"]


def test_grapheme_count_ignores_spaces():
    assert grapheme_count("क ख") == 2


# ---------------------------------------------------------------------------
# devanagari_post composition
# ---------------------------------------------------------------------------

def test_post_flattens_newlines_before_filter():
    text, spans, n = devanagari_post("क ।\nख।।")
    assert text == "क । ख।।"
    assert [text[s:e] for s, e in spans] == ["क", "ख"]


def test_post_nfc_normalizes():
    # Precomposed nukta consonants (U+0958..) are composition exclusions:
    # NFC canonically decomposes क़ (U+0958) to क + ◌़ (U+0915 U+093C).
    assert unicodedata.normalize("NFC", "क़") == "क़"
    text, _, _ = devanagari_post("क़ी")
    assert text == "क़ी"


def test_post_idempotent():
    t1, s1, n1 = devanagari_post("क ।\nख locke।।")
    t2, s2, n2 = devanagari_post(t1)
    assert (t1, s1, n1) == (t2, s2, n2)


# ---------------------------------------------------------------------------
# HTML extraction — link-density / length boilerplate stripping
# ---------------------------------------------------------------------------

NAV = '<nav><a href="/">मुखपृष्ठ</a> <a href="/x">संपर्क</a></nav>'
PARA = "नमस्ते लोक यह एक लंबा वाक्य है ।"


def test_html_strips_nav_keeps_para():
    out = extract_html(f"<html><body>{NAV}<p>{PARA}</p></body></html>")
    assert out == PARA


def test_html_strips_script_style():
    out = extract_html(
        f"<body><script>var नमस्ते=1;</script><style>p{{}}</style><p>{PARA}</p></body>"
    )
    assert out == PARA


def test_html_short_block_promoted_next_to_good():
    # jusText near-good promotion: a short link-free block adjacent to a good
    # block is content (e.g. a heading above its paragraph).
    out = extract_html(f"<body><div>ठीक</div><p>{PARA}</p></body>")
    assert out == f"ठीक\n{PARA}"


def test_html_short_block_dropped_next_to_bad():
    # A short block whose only solid neighbors are link-dense chrome is
    # boilerplate (e.g. a button between nav and footer).
    links = "".join(f'<a href="/{i}">लिंक शब्द यहाँ और</a>' for i in range(6))
    out = extract_html(
        f"<body><p>{PARA}</p>"
        f"<div>{links}</div><div>ठीक</div><div>{links}</div></body>")
    assert out == PARA


def test_html_multiple_paras_joined_by_newline():
    out = extract_html(f"<body><p>{PARA}</p><p>{PARA}</p></body>")
    assert out == f"{PARA}\n{PARA}"


def test_html_link_dense_block_dropped_even_if_long():
    links = "".join(f'<a href="/{i}">लंबा शब्दसमूह यहाँ</a>' for i in range(6))
    out = extract_html(f"<body><div>{links}</div><p>{PARA}</p></body>")
    assert out == PARA


def test_html_heading_kept_when_linkfree():
    out = extract_html(f"<body><h1>शीर्षक यहाँ</h1><p>{PARA}</p></body>")
    assert out == f"शीर्षक यहाँ\n{PARA}"


# ---------------------------------------------------------------------------
# PDF layout — XY-cut + line merge
# ---------------------------------------------------------------------------

def _payload(words):
    import json
    return PDF_MAGIC + json.dumps({"words": words}, ensure_ascii=False).encode()


def test_pdf_single_line_sorted_by_x():
    words = [["ख", 50, 10, 70, 24], ["क", 10, 10, 30, 24], ["ग", 90, 10, 110, 24]]
    assert extract_pdf_layout(_payload(words)) == "क ख ग"


def test_pdf_lines_sorted_by_y_with_jitter():
    # ±2px baseline jitter (render_text.py:198-199) must not split lines
    words = [["ख", 50, 12, 70, 26], ["क", 10, 10, 30, 24],
             ["ग", 10, 40, 30, 54], ["घ", 50, 41, 70, 55]]
    assert extract_pdf_layout(_payload(words)) == "क ख ग घ"


def test_pdf_two_blocks_y_gap():
    words = [["क", 10, 10, 30, 24], ["ख", 10, 60, 30, 74]]
    assert extract_pdf_layout(_payload(words)) == "क\nख"


def test_pdf_two_columns_xycut():
    # Two columns, rows interleaved in y: reading order = left column then right
    words = [["क", 10, 10, 60, 24], ["ख", 10, 30, 60, 44],
             ["ग", 200, 10, 250, 24], ["घ", 200, 30, 250, 44]]
    assert extract_pdf_layout(_payload(words)) == "क ख\nग घ"


def test_pdf_bad_payload_raises():
    with pytest.raises(ValueError):
        extract_pdf_layout(b"not a pdf")


# ---------------------------------------------------------------------------
# extract_page dispatch + status codes
# ---------------------------------------------------------------------------

def test_page_ok():
    text, spans, n, status = extract_page(
        f"<body><p>{PARA}</p></body>".encode())
    assert status == STATUS_OK and text and n > 0


def test_page_empty():
    text, _, _, status = extract_page(
        b"<body><p>plain english paragraph long enough to keep</p></body>")
    assert status == STATUS_EMPTY and text == ""


def test_page_decode_fail():
    assert extract_page(b"<body>\xff\xfe\x80</body>")[3] == STATUS_DECODE_FAIL


def test_page_declared_charset_honored():
    # latin-1 page with a declared charset: devanagari can't appear, but the
    # decode must succeed (status EMPTY, not DECODE_FAIL)
    body = ("<html><head><meta charset=\"iso-8859-1\"></head>"
            "<body><p>caf\xe9 content long enough to classify</p></body>")
    payload = body.encode("iso-8859-1")
    assert extract_page(payload)[3] == STATUS_EMPTY


def test_page_lying_utf8_charset_is_decode_fail():
    payload = (b"<meta charset='utf-8'><body><p>\xff\xfe broken bytes"
               b" padding padding</p></body>")
    assert extract_page(payload)[3] == STATUS_DECODE_FAIL


def test_page_unknown_charset_is_decode_fail():
    payload = (b"<meta charset='no-such-enc'><body>\xff\xfe</body>")
    assert extract_page(payload)[3] == STATUS_DECODE_FAIL


def test_page_parse_fail_pdf():
    assert extract_page(PDF_MAGIC + b"{bad json")[3] == STATUS_PARSE_FAIL


def test_page_too_long():
    assert extract_page(b"x" * (MAX_HTML_BYTES + 1))[3] == STATUS_TOO_LONG


def test_page_none():
    assert extract_page(None)[3] == STATUS_PARSE_FAIL
