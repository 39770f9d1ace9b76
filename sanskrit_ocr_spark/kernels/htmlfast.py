"""Fast HTML block scanner — drop-in replacement for the stdlib-parser path.

``htmlx._BlockParser`` (html.parser.HTMLParser) costs ~72% of per-document
kernel time (profiled in BENCH notes). This module produces the SAME event
stream as ``HTMLParser(convert_charrefs=True)`` — byte-identical block
accounting — while skipping everything the block model never needs:

* no ``updatepos`` line/column bookkeeping (a regex pass per data chunk);
* no attribute *extraction* (attribute spans are advanced over with the
  stdlib's own ``attrfind_tolerant`` but never materialized into lists);
* no incremental-feed buffering (the whole document is one string);
* ``<script>/<style>`` CDATA content is skipped by searching the closing
  tag directly instead of event-dispatching suppressed data.

Fidelity strategy: every tag-shaped decision is made with the *same
compiled regexes CPython's ``html.parser`` uses* (``tagfind_tolerant``,
``attrfind_tolerant``, ``endtagfind``, ``locatestarttagend_tolerant``,
``commentclose`` …), and the dispatch/recovery control flow mirrors
``HTMLParser.goahead`` / ``parse_starttag`` / ``parse_endtag`` /
``parse_html_declaration`` case by case — including the undocumented
corners: end-of-input recovery chunks (``<!-- unterminated``), bogus
comments (``<!x>``, ``</ >``), marked sections (``<![if …]>``), tolerant
end tags (``</div x>``), and non-CDATA ignore elements (``<noscript>``,
``<svg>``, ``<template>``, ``<head>``) whose *tags* are still parsed while
only their character data is suppressed — exactly like ``htmlx``.

Equivalence with the reference implementation is enforced two ways:
``tests/test_golden_fixture.py`` (committed goldens) and a differential
hypothesis test (``tests/test_htmlfast_differential.py``) that fuzzes both
parsers with adversarial markup, including ignore-element nesting and the
recovery corners above. ``extract_html`` falls back to the stdlib parser
if the scanner raises.
"""

from __future__ import annotations

import html.parser as _hp
import re
from html import unescape

from _markupbase import (  # the very regexes _markupbase decides with
    _declname_match,
    _markedsectionclose,
    _msmarkedsectionclose,
)

from sanskrit_ocr_spark.kernels import htmlx
from sanskrit_ocr_spark.kernels.htmlx import (
    _BLOCK_TAGS,
    _IGNORE_TAGS,
    _Block,
    _classify,
    _GOOD,
)

# CPython html.parser's own compiled regexes — single source of tag grammar.
_TAGFIND = _hp.tagfind_tolerant
_ATTRFIND = _hp.attrfind_tolerant
_ENDTAGFIND = _hp.endtagfind
_LOCATE_STARTTAG_END = _hp.locatestarttagend_tolerant
_COMMENTCLOSE = _hp.commentclose

_CDATA_ELEMS = ("script", "style")  # HTMLParser.CDATA_CONTENT_ELEMENTS
_CDATA_OPEN = {t: re.compile(rf"</\s*{t}", re.IGNORECASE) for t in _CDATA_ELEMS}

# Fast paths for the overwhelmingly common tag shapes. On this restricted
# grammar (plain names, well-formed attributes whose values contain no
# quote/angle surprises) the faithful parse below provably produces the
# same (tag, endpos, start-vs-startend) triple, so matching here is a pure
# shortcut; anything else falls through to the stdlib-regex mirror.
# (A single merged search regex was measured SLOWER than str.find('<') +
# two anchored matches — don't re-merge.)
_SIMPLE_START = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"(?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s>'\"=<`]+))?)*"
    r"\s*(/?)>")
_SIMPLE_END = re.compile(r"</([a-zA-Z][a-zA-Z0-9]*)\s*>")

_AMP = "&"


class _UnknownMarkedSection(Exception):
    """Raised where HTMLParser itself raises (e.g. ``<![foo>``) so the
    caller falls back to the stdlib parser and surfaces the same error."""


def _scan_blocks(markup: str) -> list[_Block]:
    blocks: list[_Block] = []
    cur = _Block("body")
    link_depth = 0
    ignore_depth = 0
    n = len(markup)

    # -- block/event semantics: exact mirror of htmlx._BlockParser ----------
    def flush(next_tag: str) -> None:
        nonlocal cur
        if cur.total_chars:
            blocks.append(cur)
            cur = _Block(next_tag)
        else:
            # empty block: reuse the object (flush fires on every block tag
            # — allocation here dominated the scan profile). A discarded
            # block's pending whitespace boundary is dropped with it,
            # exactly like allocating a fresh _Block.
            cur.tag = next_tag
            if cur.parts:
                cur.parts.clear()

    def on_data(segment: str) -> None:
        nonlocal cur
        if ignore_depth or not segment:
            return
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

    def on_text(segment: str) -> None:
        # normal character data: HTMLParser applies unescape() per chunk
        if _AMP in segment:
            segment = unescape(segment)
        on_data(segment)

    def on_start(tag: str) -> None:
        nonlocal link_depth, ignore_depth
        if tag in _IGNORE_TAGS:
            ignore_depth += 1
        elif tag == "a":
            link_depth += 1
        elif tag in _BLOCK_TAGS:
            flush(tag)

    def on_end(tag: str) -> None:
        nonlocal link_depth, ignore_depth
        if tag in _IGNORE_TAGS:
            ignore_depth = max(0, ignore_depth - 1)
        elif tag == "a":
            link_depth = max(0, link_depth - 1)
        elif tag in _BLOCK_TAGS:
            flush(cur.tag)

    def on_startend(tag: str) -> None:
        if tag in _BLOCK_TAGS:
            flush(tag)

    # -- construct parsers: mirrors of the HTMLParser.parse_* methods -------
    def recover(i: int) -> int:
        """goahead's end-of-input recovery for an incomplete construct:
        emit raw-through-'>' (else up to the next '<', else one char) as
        unescaped data and resume scanning after it."""
        k = markup.find(">", i + 1)
        if k < 0:
            k = markup.find("<", i + 1)
            k = i + 1 if k < 0 else k
        else:
            k += 1
        on_text(markup[i:k])
        return k

    def check_whole_starttag(i: int) -> int:
        # mirror of HTMLParser.check_for_whole_start_tag (buffer-boundary
        # returns collapse to "incomplete at EOF" since we parse one string)
        m = _LOCATE_STARTTAG_END.match(markup, i)
        if not m:
            raise _UnknownMarkedSection("start tag did not match")
        j = m.end()
        nxt = markup[j:j + 1]
        if nxt == ">":
            return j + 1
        if nxt == "/":
            if markup.startswith("/>", j):
                return j + 2
            return -1
        if nxt == "":
            return -1
        if nxt in "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ":
            return -1
        return j if j > i else i + 1

    def skip_cdata(i: int, tag: str) -> int:
        """Content of <script>/<style>: suppressed entirely; mode ends only
        at a strict ``</tag>`` (parse_endtag's cdata branches); other
        ``</tag…`` occurrences are data up to their '>'; unterminated
        content is dropped even at EOF (goahead's cdata break)."""
        nonlocal ignore_depth
        open_re = _CDATA_OPEN[tag]
        pos = i
        while pos < n:
            m = open_re.search(markup, pos)
            if not m:
                return n
            j = m.start()
            gt = markup.find(">", j + 1)
            if gt < 0:
                return n
            em = _ENDTAGFIND.match(markup, j)
            if em and em.group(1).lower() == tag:
                on_end(tag)  # decrements ignore_depth
                return em.end()
            pos = gt + 1  # suppressed data chunk; stay in cdata mode
        return n

    def parse_starttag(i: int) -> int:
        endpos = check_whole_starttag(i)
        if endpos < 0:
            return recover(i)
        m = _TAGFIND.match(markup, i + 1)
        tag = m.group(1).lower()
        k = m.end()
        while k < endpos:  # advance over attributes (values never kept)
            am = _ATTRFIND.match(markup, k)
            if not am:
                break
            k = am.end()
        end = markup[k:endpos].strip()
        if end not in (">", "/>"):
            # parse_starttag's junk-tail fallback: raw data, NOT unescaped
            on_data(markup[i:endpos])
            return endpos
        if end == "/>":
            on_startend(tag)
            return endpos
        on_start(tag)
        if tag in _CDATA_ELEMS:
            return skip_cdata(endpos, tag)
        return endpos

    def parse_endtag(i: int) -> int:
        gt = markup.find(">", i + 1)
        if gt < 0:
            return recover(i)
        m = _ENDTAGFIND.match(markup, i)
        if m:
            on_end(m.group(1).lower())
            return gt + 1
        nm = _TAGFIND.match(markup, i + 2)
        if not nm:
            if markup[i:i + 3] == "</>":
                return i + 3
            gt2 = markup.find(">", i + 2)  # bogus comment, no data
            return recover(i) if gt2 < 0 else gt2 + 1
        on_end(nm.group(1).lower())
        gt2 = markup.find(">", nm.end())
        return gt2 + 1

    def parse_html_declaration(i: int) -> int:
        if markup.startswith("<![", i):
            # parse_marked_section: <![keyword[…]]> / MS <![if …]>
            dm = _declname_match(markup, i + 3)
            if not dm:
                raise _UnknownMarkedSection(markup[i:i + 20])
            name = dm.group().strip().lower()
            if i + 3 + len(dm.group()) == n:
                return recover(i)
            if name in {"temp", "cdata", "ignore", "include", "rcdata"}:
                cm = _markedsectionclose.search(markup, i + 3)
            elif name in {"if", "else", "endif"}:
                cm = _msmarkedsectionclose.search(markup, i + 3)
            else:
                raise _UnknownMarkedSection(name)
            return cm.end() if cm else recover(i)
        if markup[i + 2:i + 9].lower() == "doctype":
            gt = markup.find(">", i + 9)
            return recover(i) if gt < 0 else gt + 1
        gt = markup.find(">", i + 2)  # bogus comment <!…>
        return recover(i) if gt < 0 else gt + 1

    # -- main loop: mirror of HTMLParser.goahead. The simple-tag fast paths
    # -- are fully inlined (no closure dispatch): tag handling is ~40 events
    # -- per document and dominated the scan profile otherwise.
    find = markup.find
    ss_match = _SIMPLE_START.match
    se_match = _SIMPLE_END.match
    ign_tags = _IGNORE_TAGS
    blk_tags = _BLOCK_TAGS
    pos = 0
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            on_text(markup[pos:])
            break
        if lt > pos:
            on_text(markup[pos:lt])
        # dispatch on the char after '<' FIRST: a start-tag regex attempt
        # at every '</...' (and vice versa) was ~half the match calls
        c = markup[lt + 1:lt + 2]
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            m = ss_match(markup, lt)
            if m:  # simple start tag (provably ≡ parse_starttag)
                tag = m.group(1)
                if not tag.islower():
                    tag = tag.lower()
                pos = m.end()
                if m.group(2):  # self-closing → handle_startendtag
                    if tag in blk_tags:
                        flush(tag)
                elif tag in ign_tags:
                    ignore_depth += 1
                    if tag in _CDATA_ELEMS:
                        pos = skip_cdata(pos, tag)
                elif tag == "a":
                    link_depth += 1
                elif tag in blk_tags:
                    flush(tag)
                continue
            pos = parse_starttag(lt)
        elif c == "/":
            m = se_match(markup, lt)
            if m:  # simple end tag
                tag = m.group(1)
                if not tag.islower():
                    tag = tag.lower()
                pos = m.end()
                if tag in ign_tags:
                    if ignore_depth:
                        ignore_depth -= 1
                elif tag == "a":
                    if link_depth:
                        link_depth -= 1
                elif tag in blk_tags:
                    flush(cur.tag)
                continue
            pos = parse_endtag(lt)
        elif markup.startswith("<!--", lt):
            cm = _COMMENTCLOSE.search(markup, lt + 4)
            pos = cm.end() if cm else recover(lt)
        elif c == "?":
            gt = markup.find(">", lt + 2)
            pos = recover(lt) if gt < 0 else gt + 1
        elif c == "!":
            pos = parse_html_declaration(lt)
        elif lt + 1 < n:
            on_data("<")
            pos = lt + 1
        else:  # lone '<' at EOF
            on_data("<")
            pos = n

    if cur.total_chars:
        blocks.append(cur)
    return blocks


def extract_html_fast(markup: str) -> str:
    """Same contract as ``htmlx.extract_html``; ~3× faster. Falls back to
    the stdlib-parser implementation on any internal error (including the
    marked-section forms where HTMLParser itself raises — the fallback then
    surfaces the identical exception)."""
    try:
        blocks = _scan_blocks(markup)
    except Exception:
        return htmlx.extract_html(markup)
    cls = _classify(blocks)
    return "\n".join(b.text() for b, c in zip(blocks, cls) if c == _GOOD)
