"""Property-based kernel tests (hypothesis) — SURVEY.md §5.3.

These pin invariants rather than examples: idempotence, char-class
containment, span reconstruction, permutation-invariance of layout reading
order.
"""

import json
import random as _random

from hypothesis import given, settings
from hypothesis import strategies as st

from sanskrit_ocr_spark.kernels.devanagari import (
    devanagari_post,
    filter_devanagari,
    grapheme_clusters,
    sentence_spans,
)
from sanskrit_ocr_spark.kernels.pdfish import PDF_MAGIC, extract_pdf_layout

# text drawing from Devanagari block + ASCII noise + controls
_dev = st.characters(min_codepoint=0x0900, max_codepoint=0x097F)
_noise = st.characters(min_codepoint=0x20, max_codepoint=0x2FFF)
_mixed_text = st.text(alphabet=st.one_of(_dev, _noise), max_size=300)


@given(_mixed_text)
@settings(max_examples=200, deadline=None)
def test_filter_output_charclass_and_idempotence(s):
    out = filter_devanagari(s)
    assert all("ऀ" <= c <= "ॿ" or c == " " for c in out)
    assert not out.startswith(" ") and not out.endswith(" ")
    assert filter_devanagari(out) == out


@given(_mixed_text)
@settings(max_examples=200, deadline=None)
def test_post_idempotent(s):
    t1, sp1, n1 = devanagari_post(s)
    t2, sp2, n2 = devanagari_post(t1)
    assert (t1, sp1, n1) == (t2, sp2, n2)


@given(st.text(alphabet=st.one_of(_dev, st.just(" ")), max_size=200))
@settings(max_examples=200, deadline=None)
def test_spans_reconstruct_sentences(s):
    spans = sentence_spans(s)
    for lo, hi in spans:
        seg = s[lo:hi]
        assert seg == seg.strip(" ") and seg
        assert "।" not in seg and "॥" not in seg
    # spans are strictly ordered and non-overlapping
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b <= c


@given(st.text(alphabet=_dev, max_size=120))
@settings(max_examples=200, deadline=None)
def test_grapheme_clusters_partition_text(s):
    clusters = grapheme_clusters(s)
    assert "".join(clusters) == s
    assert all(clusters)


@given(st.text(alphabet=st.one_of(_dev, st.just(" ")), max_size=120))
@settings(max_examples=300, deadline=None)
def test_grapheme_count_matches_cluster_path(s):
    from sanskrit_ocr_spark.kernels.devanagari import grapheme_count
    assert grapheme_count(s) == sum(
        1 for c in grapheme_clusters(s) if c != " ")


@given(st.lists(st.text(alphabet=st.characters(min_codepoint=0x0905,
                                               max_codepoint=0x0939),
                        min_size=1, max_size=6),
                min_size=1, max_size=30),
       st.integers(0, 2**32 - 1))
@settings(max_examples=100, deadline=None)
def test_xycut_reading_order_is_storage_order_invariant(words, seed):
    """Shuffling the storage order of word boxes must not change the
    extracted reading order (the kernel re-derives order from geometry)."""
    boxes = []
    x, y = 10.0, 10.0
    for i, w in enumerate(words):
        ww = 8.0 * len(w)
        if x + ww > 360:
            x, y = 10.0, y + 16.0
        boxes.append([w, x, y, x + ww, y + 14.0])
        x += ww + 6.0
    payload = PDF_MAGIC + json.dumps({"words": boxes},
                                     ensure_ascii=False).encode()
    base = extract_pdf_layout(payload)
    rng = _random.Random(seed)
    shuffled = list(boxes)
    rng.shuffle(shuffled)
    payload2 = PDF_MAGIC + json.dumps({"words": shuffled},
                                      ensure_ascii=False).encode()
    assert extract_pdf_layout(payload2) == base


@given(st.text(alphabet=st.one_of(_dev, st.just(" ")), max_size=120))
@settings(max_examples=300, deadline=None)
def test_grapheme_count_regex_fast_path_matches_loop(s):
    """The block-only regex fast path must count exactly what the explicit
    loop counts (and both equal the cluster-list reference)."""
    from sanskrit_ocr_spark.kernels.devanagari import (
        _BLOCK_ONLY_RE, grapheme_clusters, grapheme_count)
    expect = sum(1 for c in grapheme_clusters(s) if c != " ")
    assert grapheme_count(s) == expect
    if _BLOCK_ONLY_RE.match(s):  # fast path actually taken for block text
        from sanskrit_ocr_spark.kernels.devanagari import _CLUSTER_BLOCK_RE
        assert len(_CLUSTER_BLOCK_RE.findall(s)) == expect
