"""Pure-Python extraction kernels (no Spark imports).

These are the single source of truth for extraction semantics: the golden
fixtures are computed by calling them directly, and the Spark pipeline runs
the very same functions inside Arrow-batched pandas UDFs — so byte-identity
between pipeline output and goldens is identity of code, not a re-derivation.
"""

from sanskrit_ocr_spark.kernels.devanagari import (
    devanagari_post,
    filter_devanagari,
    grapheme_clusters,
    sentence_spans,
)
# Public extract_html IS the implementation the pipeline runs (the fast
# scanner with stdlib-parser fallback); htmlx.extract_html remains
# importable as the reference-only differential baseline.
from sanskrit_ocr_spark.kernels.htmlfast import extract_html_fast as extract_html
from sanskrit_ocr_spark.kernels.pdfish import extract_pdf_layout
from sanskrit_ocr_spark.kernels.page import extract_page

__all__ = [
    "devanagari_post",
    "filter_devanagari",
    "grapheme_clusters",
    "sentence_spans",
    "extract_html",
    "extract_pdf_layout",
    "extract_page",
]
