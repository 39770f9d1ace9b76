"""Fast HTML block scanner — drop-in replacement for the stdlib-parser path.

``htmlx._BlockParser`` (html.parser.HTMLParser) costs ~72% of per-document
kernel time (profiled in BENCH notes). This module re-implements the SAME
block model with a single regex tag scan:

* one pass over ``<tag …>`` / ``</tag>`` / comments / doctype matches;
* text between matches is character data (entity-decoded with
  ``html.unescape`` — the same HTML5 charref semantics HTMLParser's
  ``convert_charrefs=True`` applies);
* ``<script>/<style>/…`` content skipped by searching the matching close
  tag (CDATA-mode equivalent);
* identical block/link accounting → identical classification → identical
  extracted text.

Equivalence with the reference implementation is enforced two ways:
``tests/test_golden_fixture.py`` (committed goldens) and a differential
hypothesis test (``tests/test_htmlfast_differential.py``) that fuzzes both
parsers with adversarial markup. ``extract_html`` falls back to the stdlib
parser if the scanner raises.
"""

from __future__ import annotations

import re
from html import unescape

from sanskrit_ocr_spark.kernels import htmlx
from sanskrit_ocr_spark.kernels.htmlx import (
    _BLOCK_TAGS,
    _IGNORE_TAGS,
    _VOID_TAGS,
    _Block,
    _classify,
    _GOOD,
)

_TAG_RE = re.compile(
    r"<!--.*?(?:-->|$)"            # comment (possibly unterminated)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"  # cdata
    r"|<!DOCTYPE[^>]*>"            # doctype
    r"|<\?[^>]*>"                  # processing instruction
    r"|</([a-zA-Z][a-zA-Z0-9-]*)\s*>"        # end tag
    r"|<([a-zA-Z][a-zA-Z0-9-]*)"             # start tag name
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)(/?)>",  # attrs (quote-aware) + self-close
    re.DOTALL | re.IGNORECASE,
)

_AMP = "&"


def _scan_blocks(markup: str) -> list[_Block]:
    blocks: list[_Block] = []
    cur = _Block("body")
    link_depth = 0
    pos = 0
    n = len(markup)

    def flush(next_tag: str) -> None:
        nonlocal cur
        if cur.total_chars:
            blocks.append(cur)
        cur = _Block(next_tag)

    def data(segment: str) -> None:
        nonlocal cur
        if not segment:
            return
        if _AMP in segment:
            segment = unescape(segment)
        stripped = segment.strip()
        if not stripped:
            if cur.parts and not cur.parts[-1].endswith(" "):
                cur.parts.append(" ")
            return
        cur.parts.append(segment)
        k = len(stripped)
        cur.total_chars += k
        if link_depth:
            cur.link_chars += k

    while pos < n:
        lt = markup.find("<", pos)
        if lt < 0:
            data(markup[pos:])
            break
        if lt > pos:
            data(markup[pos:lt])
        m = _TAG_RE.match(markup, lt)
        if not m:
            # stray '<' — character data, exactly like HTMLParser
            data("<")
            pos = lt + 1
            continue
        pos = m.end()
        end_name, start_name = m.group(1), m.group(2)
        if end_name:
            tag = end_name.lower()
            if tag == "a":
                link_depth = max(0, link_depth - 1)
            elif tag in _BLOCK_TAGS:
                flush(cur.tag)
        elif start_name:
            tag = start_name.lower()
            if tag in _IGNORE_TAGS and tag not in _VOID_TAGS:
                # CDATA-mode skip to the matching close tag
                close = re.compile(rf"</{tag}\s*>", re.IGNORECASE)
                cm = close.search(markup, pos)
                pos = cm.end() if cm else n
            elif tag == "a":
                if not m.group(4):
                    link_depth += 1
            elif tag in _BLOCK_TAGS:
                flush(tag)
    if cur.total_chars:
        blocks.append(cur)
    return blocks


def extract_html_fast(markup: str) -> str:
    """Same contract as ``htmlx.extract_html``; ~3× faster. Falls back to
    the stdlib-parser implementation on any internal error."""
    try:
        blocks = _scan_blocks(markup)
    except Exception:
        return htmlx.extract_html(markup)
    cls = _classify(blocks)
    return "\n".join(b.text() for b, c in zip(blocks, cls) if c == _GOOD)
