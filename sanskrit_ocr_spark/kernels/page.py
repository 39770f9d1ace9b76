"""Unified per-page extraction: dispatch + failure codes.

Replaces the reference's silent batch-level error skip
(``datagen/translate_bookcorpus.py:141-146`` drops a whole 1024-row batch on
one ValueError) with per-row status codes — no row is ever dropped silently;
failures are counted in the lineage table (north_rule).

Status codes:

* ``OK``          — non-empty extracted text
* ``EMPTY``       — extraction succeeded but nothing survived the
                    Devanagari content filter (reference F1,
                    ``datagen/h5_to_parquet.py:41-43``)
* ``DECODE_FAIL`` — html bytes are not valid UTF-8
* ``PARSE_FAIL``  — DOM/layout parsing raised
* ``TOO_LONG``    — payload exceeds ``MAX_HTML_BYTES`` (the per-row analog of
                    the reference's 4096-token prompt-length skip,
                    translate_bookcorpus.py:141-146)
"""

from __future__ import annotations

import re

from sanskrit_ocr_spark.kernels.devanagari import devanagari_post
from sanskrit_ocr_spark.kernels.htmlfast import extract_html_fast as extract_html
from sanskrit_ocr_spark.kernels.pdfish import PDF_MAGIC, extract_pdf_layout

# Mirrors the spirit of max_model_len=4096 tokens (translate_bookcorpus.py:124):
# a hard per-document input bound so one pathological page cannot stall a task.
MAX_HTML_BYTES = 4 * 1024 * 1024

STATUS_OK = "OK"
STATUS_EMPTY = "EMPTY"
STATUS_DECODE_FAIL = "DECODE_FAIL"
STATUS_PARSE_FAIL = "PARSE_FAIL"
STATUS_TOO_LONG = "TOO_LONG"

# charset declared in <meta charset=…> / <meta http-equiv … content=…charset=…>
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_.:-]{2,24})")


def _decode_html(html: bytes) -> str | None:
    """UTF-8 first; on failure honor a declared ``<meta charset>`` within
    the first 2 KiB (real Common-Crawl pages are ~5% non-UTF-8). Returns
    None (→ DECODE_FAIL) when neither works — never ``errors='replace'``,
    which would silently corrupt the byte-identity contract."""
    try:
        return html.decode("utf-8")
    except UnicodeDecodeError:
        m = _CHARSET_RE.search(html[:2048])
        if not m:
            return None
        try:
            enc = m.group(1).decode("ascii")
            if enc.lower() in ("utf-8", "utf8"):  # lied; already failed
                return None
            return html.decode(enc)
        except (LookupError, UnicodeDecodeError):
            return None


def extract_page(html: bytes | None) -> tuple[str, list[tuple[int, int]], int, str]:
    """One page payload → ``(text, sentence_spans, n_graphemes, status)``.

    Dispatch: ``%PDF-FAKE`` magic → XY-cut layout path; anything else →
    HTML path. Never raises; failures become status codes with empty text.
    """
    if html is None:
        return "", [], 0, STATUS_PARSE_FAIL
    if len(html) > MAX_HTML_BYTES:
        return "", [], 0, STATUS_TOO_LONG
    try:
        if html.startswith(PDF_MAGIC):
            raw = extract_pdf_layout(html)
        else:
            markup = _decode_html(html)
            if markup is None:
                return "", [], 0, STATUS_DECODE_FAIL
            raw = extract_html(markup)
    except Exception:
        return "", [], 0, STATUS_PARSE_FAIL
    text, spans, n_graphemes = devanagari_post(raw)
    if not text:
        return "", [], 0, STATUS_EMPTY
    return text, spans, n_graphemes, STATUS_OK
