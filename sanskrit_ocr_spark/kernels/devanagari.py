"""Devanagari-aware text post-processing.

Re-implements, from its observable behavior, the text semantics of the
reference pipeline (KhoomeiK/sanskrit-ocr):

* the keep-only-``[\\u0900-\\u097F ]`` content filter
  (reference ``datagen/h5_to_parquet.py:17-21``);
* newline flattening before layout (``datagen/augmentations/render_text.py:158``);
* danda sentence delimiting — single danda U+0964 between sentences,
  ``।।`` double-danda document terminator
  (``datagen/augmentations/generate_dataset.py:30``) **and** the real
  double-danda ॥ U+0965 used by the demo text
  (``datagen/augmentations/render_text.py:485``) — both are treated as
  sentence delimiters here;
* plus rebuild-mandated additions (BASELINE.json north_star): Unicode NFC
  normalization and conjunct-safe grapheme clustering.

Everything here is pure CPython over ``str`` — no Spark, no third-party deps —
so the exact same bytes are produced by the golden-fixture generator and by
the pandas-UDF pipeline (which calls these functions on whole Arrow batches
via ``pandas.Series.map``-free vectorized helpers in
``sanskrit_ocr_spark/extract/pipeline.py``).
"""

from __future__ import annotations

import re
import unicodedata

# Keep only the Devanagari block U+0900–U+097F and ASCII space; delete every
# maximal run of anything else. Exact regex of the reference
# (h5_to_parquet.py:18). Compiled once per interpreter (worker) — same hoisting
# trick as the reference.
_NON_DEV_OR_SPACE = re.compile(r"[^ऀ-ॿ ]+")

# Sentence delimiters: runs of danda U+0964 and/or double danda U+0965.
_DANDA_RUN = re.compile(r"[।॥]+")

_VIRAMA = "्"
_ZWNJ = "‌"
_ZWJ = "‍"

# Precomputed character classes for the hot path: after the content filter
# the alphabet is exactly U+0900–U+097F plus space, so O(1) set lookups
# replace per-char unicodedata.category calls (2× faster grapheme pass).
_EXTEND_SET = frozenset(
    ch for ch in (chr(c) for c in range(0x0900, 0x0980))
    if unicodedata.category(ch) in ("Mn", "Mc", "Me")
) | {_ZWJ, _ZWNJ}
_CONSONANT_SET = frozenset(
    chr(c) for c in range(0x0915, 0x093A)
) | frozenset(chr(c) for c in range(0x0958, 0x0960))


def _is_extend(ch: str) -> bool:
    if ch in _EXTEND_SET:
        return True
    if "ऀ" <= ch <= "ॿ" or ch == " ":
        return False
    return unicodedata.category(ch) in ("Mn", "Mc", "Me")


def filter_devanagari(text: str) -> str:
    """Delete every maximal non-[Devanagari|space] run, then strip.

    Byte-compatible with the reference's ``filter_devanagari``
    (h5_to_parquet.py:20-21): keeps the whole U+0900–U+097F block (letters,
    matras, digits ०-९, danda ।/॥) plus ASCII space; interior space runs are
    preserved verbatim.
    """
    return _NON_DEV_OR_SPACE.sub("", text).strip()


def _is_dev_consonant(ch: str) -> bool:
    """Devanagari consonants that a preceding virama conjoins with.

    Covers the core consonant range क..ह (U+0915–U+0939) and the nukta
    consonants क़..य़ (U+0958–U+095F).
    """
    cp = ord(ch)
    return 0x0915 <= cp <= 0x0939 or 0x0958 <= cp <= 0x095F


def grapheme_clusters(text: str) -> list[str]:
    """Split into conjunct-safe grapheme clusters (UAX-29 subset).

    Implements the subset of extended-grapheme-cluster rules that matters for
    Devanagari, deterministically and without external libraries:

    * combining marks (general category Mn/Mc/Me — matras, anusvara, nukta,
      virama, vedic signs) extend the current cluster (GB9/GB9a);
    * ZWJ/ZWNJ extend the current cluster (GB9, conjunct control);
    * a consonant immediately following a virama (optionally with ZWJ/ZWNJ in
      between) continues the cluster — the Indic-conjunct-break rule (GB9c),
      so क्ष / क्‍ष / क्‌ष are each ONE cluster and conjuncts are never split.

    Spaces and danda are their own single-char clusters.
    """
    clusters: list[str] = []
    cur = ""
    pending_linker = False  # last scalar sequence ends in virama (+ZWJ/ZWNJ)
    for ch in text:
        if not cur:
            cur = ch
        elif _is_extend(ch):
            cur += ch
        elif pending_linker and ch in _CONSONANT_SET:
            cur += ch
        else:
            clusters.append(cur)
            cur = ch
        if ch == _VIRAMA:
            pending_linker = True
        elif ch in (_ZWJ, _ZWNJ):
            pass  # linker state survives join controls
        else:
            pending_linker = False
    if cur:
        clusters.append(cur)
    return clusters


# Fast path for post-filter text (alphabet exactly U+0900–U+097F + space,
# so ZWJ/ZWNJ and out-of-block combining marks cannot occur): one C-level
# regex pass counts precisely the clusters the loop below would. A cluster
# = any non-space char, extended by block combining marks (GB9/GB9a) or by
# a consonant whose immediately-preceding char is virama (GB9c) — the
# (?<=्) lookbehind IS the loop's pending_linker on this alphabet, since
# the join controls that could carry linker state are filtered out.
# Space clusters are skipped by construction ([^ ] start), matching the
# loop's space_only accounting (a mark after a space starts the match at
# the mark — different cluster CONTENT, same cluster COUNT).
_EXT_BLOCK = "".join(ch for ch in map(chr, range(0x0900, 0x0980))
                     if ch in _EXTEND_SET)
_CLUSTER_BLOCK_RE = re.compile(  # consonants \u0915-\u0939 + nukta \u0958-\u095F
    f"[^ ](?:[{_EXT_BLOCK}]|(?<=\u094d)[\u0915-\u0939\u0958-\u095F])*")
_BLOCK_ONLY_RE = re.compile(r"[ऀ-ॿ ]*\Z")


def grapheme_count(text: str) -> int:
    """Count non-space grapheme clusters — same cluster boundaries as
    ``grapheme_clusters`` (differentially tested) without building the
    cluster strings. Post-filter text (the hot path: every extracted
    document) takes the single-regex count; arbitrary input falls back to
    the explicit loop with ``_is_extend`` inlined."""
    if _BLOCK_ONLY_RE.match(text):
        return len(_CLUSTER_BLOCK_RE.findall(text))
    ext = _EXTEND_SET
    cons = _CONSONANT_SET
    category = unicodedata.category
    count = 0
    have = False          # a cluster is open
    space_only = False    # the open cluster is exactly " "
    pending_linker = False
    for ch in text:
        if not have:
            have = True
            space_only = ch == " "
        elif (ch in ext
              or (pending_linker and ch in cons)
              or (ch != " " and not ("ऀ" <= ch <= "ॿ")
                  and category(ch) in ("Mn", "Mc", "Me"))):
            space_only = False
        else:
            if not space_only:
                count += 1
            space_only = ch == " "
        if ch == _VIRAMA:
            pending_linker = True
        elif ch in (_ZWJ, _ZWNJ):
            pass
        else:
            pending_linker = False
    if have and not space_only:
        count += 1
    return count


def sentence_spans(text: str) -> list[tuple[int, int]]:
    """Danda-based sentence spans as ``(start, end)`` offsets into ``text``.

    A sentence is a maximal segment between danda runs (``।+`` or ``॥``),
    reported with surrounding spaces trimmed and the delimiter excluded.
    Empty segments (e.g. between ``।`` and ``॥``) produce no span. Offsets
    are Python ``str`` indices (code points) into the exact input string.
    """
    spans: list[tuple[int, int]] = []

    def _push(lo: int, hi: int) -> None:
        while lo < hi and text[lo] == " ":
            lo += 1
        while hi > lo and text[hi - 1] == " ":
            hi -= 1
        if hi > lo:
            spans.append((lo, hi))

    pos = 0
    for m in _DANDA_RUN.finditer(text):
        _push(pos, m.start())
        pos = m.end()
    _push(pos, len(text))
    return spans


def devanagari_post(text: str) -> tuple[str, list[tuple[int, int]], int]:
    """Full Devanagari post-processing: NFC → flatten newlines → content
    filter → sentence spans + grapheme count.

    Returns ``(clean_text, sentence_spans, n_graphemes)``. Newlines become
    single spaces *before* the filter (mirroring the reference's layout
    tokenizer ``text.strip().replace('\\n',' ')``, render_text.py:158) so that
    line boundaries collapse to word boundaries instead of gluing words.
    Idempotent: ``devanagari_post(clean)[0] == clean``.
    """
    t = unicodedata.normalize("NFC", text)
    t = t.replace("\n", " ")
    # Re-normalize AFTER the filter: stripping a non-Devanagari char can
    # make a base letter newly adjacent to a combining mark (e.g. र 0 ़ →
    # र ़, which NFC composes to ऱ U+0931) — without this the output is
    # not NFC and spans/graphemes differ on a second pass
    # (hypothesis-found: test_post_idempotent, input 'र0़').
    t = unicodedata.normalize("NFC", filter_devanagari(t))
    return t, sentence_spans(t), grapheme_count(t)
