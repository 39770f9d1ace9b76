"""PDF-style layout analysis: XY-cut block ordering + line/word box merging.

The reference's renderer lays text out with greedy word-wrap, horizontal
centering and a 1.2·em line advance (``datagen/augmentations/render_text.py:
163-196,253-254``); reading the page back is the inverse problem — the same
problem pdfminer solves for PDFs. This kernel implements that inverse for
"PDF-bearing records": pages whose payload is a set of word boxes
``(text, x0, y0, x1, y1)`` in arbitrary order.

Algorithm (pdfminer/`XY-cut` style, fully deterministic):

1. **Recursive XY-cut**: split the box set at the widest horizontal gap
   (projection onto y), then at the widest vertical gap (projection onto x),
   recursing until no gap exceeds the thresholds. Leaves are emitted
   top-to-bottom, then left-to-right — multi-column reading order.
2. **Line clustering** inside each leaf: group words whose vertical intervals
   overlap by ≥ 50% of the smaller height (the pdfminer ``line_overlap``
   analog); absorbs the reference's ±2px baseline jitter
   (render_text.py:198-199).
3. **Within-line ordering** by x0 (render_text.py:192-196 inverse), words
   joined by single spaces; lines joined by single spaces into one block
   (the renderer flattened newlines before wrapping, render_text.py:158, so
   paragraph reconstruction is whitespace-lossless); blocks joined by
   ``\\n``.

Payload format (produced by ``sanskrit_ocr_spark.datagen.pages``): bytes
starting with ``%PDF-FAKE\\n`` followed by a JSON object
``{"words": [[text, x0, y0, x1, y1], ...]}``.
"""

from __future__ import annotations

import json

PDF_MAGIC = b"%PDF-FAKE\n"

# Gap thresholds for XY-cut (page units = pixels of the 400x320 reference
# canvas, render_text.py:13-14). A horizontal white band taller than this
# splits blocks vertically; a vertical band wider than this splits columns.
Y_GAP_MIN = 18.0
X_GAP_MIN = 24.0
LINE_OVERLAP = 0.5
# Layout-sanity bound: a warped page (cylindrical/washboard degradations,
# render_text.py:269-331) chain-merges distinct text lines into one tall
# cluster. A legitimate line's vertical extent is one word height plus
# small jitter/rotation inflation (≤ ~1.4×); past this ratio the reading
# order would be garbled, so the kernel fails cleanly instead (→ the
# caller's PARSE_FAIL, the reference-degradation failure-code contract).
WARP_EXTENT_RATIO = 2.0

Box = tuple[str, float, float, float, float]


def _gaps(intervals: list[tuple[float, float]], min_gap: float) -> list[float]:
    """Midpoints of gaps wider than ``min_gap`` in a set of 1-D intervals."""
    ivs = sorted(intervals)
    out: list[float] = []
    hi = ivs[0][1]
    for lo, h in ivs[1:]:
        if lo - hi > min_gap:
            out.append((hi + lo) / 2.0)
        hi = max(hi, h)
    return out


def _xycut(boxes: list[Box], axis: int) -> list[list[Box]]:
    """Recursively split ``boxes``; axis 0 = cut on y (rows) first."""
    if not boxes:
        return []
    if axis == 0:
        cuts = _gaps([(b[2], b[4]) for b in boxes], Y_GAP_MIN)
        key = lambda b: (b[2] + b[4]) / 2.0
    else:
        cuts = _gaps([(b[1], b[3]) for b in boxes], X_GAP_MIN)
        key = lambda b: (b[1] + b[3]) / 2.0
    if not cuts:
        if axis == 0:
            # try the other axis once before declaring a leaf
            sub = _xycut(boxes, 1)
            return sub if len(sub) > 1 else [boxes]
        return [boxes]
    groups: list[list[Box]] = [[] for _ in range(len(cuts) + 1)]
    for b in boxes:
        k = key(b)
        idx = sum(1 for c in cuts if k > c)
        groups[idx].append(b)
    out: list[list[Box]] = []
    for g in groups:
        out.extend(_xycut(g, 1 - axis))
    return out


def _lines(leaf: list[Box]) -> list[list[Box]]:
    """Cluster a leaf's words into lines by ≥50% vertical overlap."""
    lines: list[tuple[float, float, list[Box]]] = []  # (y0, y1, words)
    for b in sorted(leaf, key=lambda b: (b[2], b[1])):
        placed = False
        for i, (ly0, ly1, words) in enumerate(lines):
            ov = min(ly1, b[4]) - max(ly0, b[2])
            if ov >= LINE_OVERLAP * min(ly1 - ly0, b[4] - b[2]):
                words.append(b)
                lines[i] = (min(ly0, b[2]), max(ly1, b[4]), words)
                placed = True
                break
        if not placed:
            lines.append((b[2], b[4], [b]))
    for ly0, ly1, words in lines:
        if ly1 - ly0 > WARP_EXTENT_RATIO * max(b[4] - b[2] for b in words):
            raise ValueError("incoherent line clustering (warped layout)")
    lines.sort(key=lambda l: (l[0] + l[1]) / 2.0)
    return [sorted(ws, key=lambda b: b[1]) for _, _, ws in lines]


def extract_pdf_layout(payload: bytes) -> str:
    """PDF-FAKE payload bytes → reading-order text.

    Raises ``ValueError`` on missing magic / bad JSON (mapped to
    ``PARSE_FAIL`` by the caller).
    """
    if not payload.startswith(PDF_MAGIC):
        raise ValueError("not a PDF-FAKE payload")
    doc = json.loads(payload[len(PDF_MAGIC):].decode("utf-8"))
    boxes: list[Box] = [tuple(w) for w in doc["words"]]  # type: ignore[misc]
    if not boxes:
        return ""
    blocks: list[str] = []
    for leaf in _xycut(boxes, 0):
        line_texts = [" ".join(b[0] for b in ln) for ln in _lines(leaf)]
        blocks.append(" ".join(line_texts))
    return "\n".join(blocks)
