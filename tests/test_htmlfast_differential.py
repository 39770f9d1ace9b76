"""Differential test: the fast regex scanner must produce EXACTLY the same
extracted text as the stdlib-HTMLParser implementation, on the synthetic
corpus and on adversarial fuzzed markup."""

import time

from hypothesis import given, settings
from hypothesis import strategies as st

from sanskrit_ocr_spark.datagen.pages import pages_pandas
from sanskrit_ocr_spark.kernels.htmlfast import extract_html_fast
from sanskrit_ocr_spark.kernels.htmlx import extract_html


def test_corpus_equivalence():
    for _, r in pages_pandas(0, 300).iterrows():
        try:
            markup = bytes(r["html"]).decode("utf-8")
        except UnicodeDecodeError:
            continue
        if markup.startswith("%PDF"):
            continue
        assert extract_html_fast(markup) == extract_html(markup), r["url"]


_FRAGMENTS = st.sampled_from([
    "<div>", "</div>", "<p>", "</p>", "<a href='/x'>", "</a>", "<nav>",
    "</nav>", "<script>var x='<div>';</script>", "<style>p{}</style>",
    "<!-- c -->", "<!DOCTYPE html>", "<br/>", "<li>", "text देवनागरी यहाँ",
    "नमस्ते लोक यह एक लंबा वाक्य है ।", "&amp; &lt; &#2325;", "plain words",
    "< notatag", "<img src=x>", "  ", "<td>", "</td>", "<h1>", "</h1>",
    "<span attr=\"a>b\">", "</span>", "<unclosed", "&brokenentity",
    # ignore-element nesting: tags inside non-CDATA ignore elements are
    # still parsed (only data is suppressed) — ADVICE r01 divergence class
    "<noscript>", "</noscript>", "<noscript><a>x</a>", "<svg><p>in</p></svg>",
    "<template><div>t</div></template>", "<head>", "</head>",
    "<noscript><noscript>x</noscript>", "<svg/>", "<noscript/>",
    # CDATA corners
    "<script>", "</script>", "</script x>", "</scriptfoo>", "<script/>",
    "<style>a</ style>", "<SCRIPT>b</SCRIPT >",
    # recovery / bogus-comment / tolerant-endtag corners
    "<!-- unterminated", "<![CDATA[ x > y", "<!bogus>", "</>", "</ >",
    "</1>", "</div x>", "</ div>", "<?pi here>", "<![CDATA[cd]]>",
    "<![if ie]>x<![endif]>", "<!--->", "<!---->", "<!-- -- >", "<!>",
    "<?>", "<div", "<div class=\"a", "<div class=\"a>b\"", "<p.>", "<p:q>",
    "<p a=b\"c>d\">", "<p / >", "<p//>", "<p =x>", "a<", "</", "<!",
    "&amp", "a &lt b", "&notanentity;",
])


def _run(fn, markup):
    try:
        return ("ok", fn(markup))
    except Exception as e:  # both parsers must fail the same way
        return ("raise", type(e).__name__)


@given(st.lists(_FRAGMENTS, max_size=40))
@settings(max_examples=400, deadline=None)
def test_fuzzed_equivalence(parts):
    markup = "".join(parts)
    assert _run(extract_html_fast, markup) == _run(extract_html, markup)


@given(st.text(alphabet="<>!-/?ab &;#[]\"'=\n щ", max_size=80))
@settings(max_examples=400, deadline=None)
def test_char_soup_equivalence(soup):
    assert _run(extract_html_fast, soup) == _run(extract_html, soup)


def test_fast_is_actually_faster():
    docs = []
    for _, r in pages_pandas(0, 200).iterrows():
        try:
            m = bytes(r["html"]).decode("utf-8")
            if not m.startswith("%PDF"):
                docs.append(m)
        except UnicodeDecodeError:
            pass
    t0 = time.perf_counter()
    for m in docs:
        extract_html(m)
    slow = time.perf_counter() - t0
    t0 = time.perf_counter()
    for m in docs:
        extract_html_fast(m)
    fast = time.perf_counter() - t0
    assert fast < slow  # should be ~3x; assert directional only (CI noise)
