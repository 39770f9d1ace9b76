"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Shape mandated by BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

This is the rebuild's analog of the reference's dataset generator
(``datagen/augmentations/generate_dataset.py`` + ``render_text.py``), run in
reverse: instead of rasterizing Devanagari text onto noisy canvases, we wrap
it in boilerplate-laden HTML or PDF-style word-box layouts that the
extraction kernels must invert. The layout math for the PDF path reproduces
the reference renderer exactly (greedy word wrap, horizontal centering,
1.2·em line advance — render_text.py:163-196,253-254) over deterministic
fake font metrics; the danda conventions reproduce
``generate_dataset.py:30`` (``" ।\\n".join(lines) + "।।"``) and the real ॥
terminator of ``render_text.py:485``.

Everything is seeded per row by ``doc_id`` — no global RNG state — so the
corpus is identical regardless of partitioning, ordering, or executor count.

Row inventory per block of 100 doc_ids (FIXTURES.md §A1):

* 00-54  plain HTML Devanagari (lang=sa)
* 55-59  degraded-markup HTML (L10 analog — unclosed tags, attribute junk,
         noscript/svg chrome, bogus + unterminated comments, stray '<' and
         tolerant end tags; extraction must still be byte-identical)
* 60-64  PDF-FAKE word-box payload (clean layout)
* 65     PDF with per-word/baseline jitter (L5, render_text.py:198-216 —
         absorbed by the 50%-overlap line clustering)
* 66     PDF with per-word ±2° rotation bbox inflation (L6,
         render_text.py:221-243 — absorbed)
* 67     PDF with washboard warp (L9, render_text.py:311-331 — beyond
         recovery: kernel must fail cleanly → PARSE_FAIL)
* 68     PDF with cylindrical edge warp (L8, render_text.py:269-308 —
         PARSE_FAIL)
* 69     two-column PDF (exercises XY-cut)
* 70-79  mixed-script page (lang=en distractor; Devanagari filter bites)
* 80-84  duplicate-*text* rows (first-wins dedup semantics, D1)
* 85-87  empty-after-clean (pure-ASCII body → status EMPTY, F1)
* 88     invalid UTF-8 html → DECODE_FAIL
* 89     PDF magic + corrupt JSON → PARSE_FAIL
* 90-92  ॥ (U+0965) terminator variant
* 93-95  conjunct-heavy text (virāma/ZWJ/ZWNJ grapheme safety)
* 96-97  NFD-encoded input (NFC normalization check)
* 98-99  duplicate-*url* rows (MERGE-on-url idempotence, J3)
"""

from __future__ import annotations

import json
import math
import random
import unicodedata
from datetime import datetime, timedelta

import pandas as pd

EPOCH = datetime(2025, 7, 4, 0, 0, 0)

# ---------------------------------------------------------------------------
# Devanagari text synthesis (seeded)
# ---------------------------------------------------------------------------

_CONSONANTS = "कखगघचछजझटठडढणतथदधनपफबभमयरलवशषसह"
_MATRAS = ["", "ा", "ि", "ी", "ु", "ू", "े", "ै", "ो", "ौ"]
_VIRAMA = "्"
_ZWJ = "‍"
_ZWNJ = "‌"


def _word(rng: random.Random, conjunct_heavy: bool = False) -> str:
    syllables = rng.randint(1, 4)
    out = []
    for _ in range(syllables):
        c = rng.choice(_CONSONANTS)
        if rng.random() < (0.6 if conjunct_heavy else 0.15):
            # conjunct: C + virama [+ ZWJ/ZWNJ] + C
            joiner = ""
            if conjunct_heavy:
                r = rng.random()
                joiner = _ZWJ if r < 0.2 else (_ZWNJ if r < 0.4 else "")
            c = c + _VIRAMA + joiner + rng.choice(_CONSONANTS)
        out.append(c + rng.choice(_MATRAS))
    return "".join(out)


def _sentence(rng: random.Random, conjunct_heavy: bool = False) -> str:
    words = [_word(rng, conjunct_heavy) for _ in range(rng.randint(3, 9))]
    # Keep each sentence above the extractor's MIN_CONTENT_CHARS so every
    # single-sentence <p> is a context-free "good" block — the promotion
    # path is unit-tested separately, the corpus exercises the main path.
    while len(" ".join(words)) < 24:
        words.append(_word(rng, conjunct_heavy))
    return " ".join(words)


def _doc_text(rng: random.Random, n_lines: int, conjunct_heavy: bool = False,
              terminator: str = "।।") -> str:
    """Reference danda convention: ``" ।\\n".join(lines) + terminator``
    (generate_dataset.py:30; terminator ॥ per render_text.py:485)."""
    lines = [_sentence(rng, conjunct_heavy) for _ in range(n_lines)]
    return " ।\n".join(lines) + terminator


# ---------------------------------------------------------------------------
# HTML page synthesis (boilerplate chrome around a main div)
# ---------------------------------------------------------------------------

_NAV_WORDS = ["मुखपृष्ठ", "संपर्क", "लेख", "खोज", "सहायता", "लॉगिन"]


def _boilerplate_nav(rng: random.Random) -> str:
    # Link-dense Devanagari chrome: survives the content *filter* but must be
    # stripped by the link-density classifier — keeps the classifier
    # load-bearing for byte-identity.
    links = "".join(
        f'<li><a href="/{i}">{rng.choice(_NAV_WORDS)}</a></li>'
        for i in range(rng.randint(4, 8))
    )
    return f"<nav><ul>{links}</ul></nav>"


def _boilerplate_footer(rng: random.Random) -> str:
    return (
        '<footer><a href="/about">परिचय पृष्ठ</a> · <a href="/terms">नियम एवं शर्तें</a>'
        f' · <a href="/privacy">गोपनीयता</a><span> © {rng.randint(1999, 2025)}</span></footer>'
    )


def _degrade_markup(page: str, mode: int) -> str:
    """L10-analog markup degradations (post-transforms over a rendered
    page, like render_text.py:334-411 over a rendered image). Every mode
    must leave the post-Devanagari-filter extraction byte-identical —
    that's the robustness contract the goldens pin."""
    if mode == 0:    # unclosed paragraphs: tolerant block flushing
        return page.replace("</p>", "")
    if mode == 1:    # attribute junk incl. a quoted '>' inside a value
        return page.replace(
            "<p>", "<p class=\"deg\" data-x='a>b' style=\"\">")
    if mode == 2:    # chrome inside ignore elements: tags parsed, data
        # suppressed (the htmlfast/htmlx parity surface from ADVICE r01)
        return page.replace(
            "<body>",
            "<body><noscript><ul><li><a href='/nojs'>स्क्रिप्ट</a>"
            "</li></ul></noscript><svg><text>decor</text></svg>")
    if mode == 3:    # bogus comment + unterminated trailing comment
        return page.replace("<main>", "<!x><main>") + "<!-- truncated tail"
    if mode == 4:    # stray '<' character data + tolerant end tag
        return (page.replace("</article>", "</article x>")
                .replace("<footer>", "< <footer>"))
    return page


# L11 analog (render_text.py:429-436,455-456): the reference samples a page
# style and maps it to an ink RGB + font size; HTML-land that's page chrome
# (CSS), which extraction must ignore entirely.
_PAGE_STYLES = {
    "lined": ("#1a1a2e", "#ffffff"),
    "old": ("#2e1a0a", "#f4ecd8"),
    "birch": ("#101010", "#f8f4e8"),
    "parchment": ("#3a2408", "#efe0b9"),
}
_STYLE_NAMES = sorted(_PAGE_STYLES)


def _html_page(rng: random.Random, body_text: str, extra_en: str = "",
               degrade: int | None = None) -> bytes:
    style = rng.choice(_STYLE_NAMES)
    ink, bg = _PAGE_STYLES[style]
    font_px = rng.randint(12, 18)  # render_text.py:455-456
    paras = "".join(
        f"<p>{line}</p>" for line in body_text.split("\n")
    )
    sidebar = (
        '<aside><ul>'
        + "".join(f'<li><a href="/t/{i}">टैग{i}</a></li>' for i in range(5))
        + "</ul></aside>"
    )
    page = (
        "<!DOCTYPE html><html><head><title>doc</title>"
        "<style>body{margin:0;color:" + ink + ";background:" + bg
        + ";font-size:" + str(font_px) + "px}</style>"
        "<script>var x=1;</script></head>"
        f'<body class="{style}">{_boilerplate_nav(rng)}{sidebar}'
        f"<main><article>{extra_en}{paras}</article></main>"
        f"{_boilerplate_footer(rng)}</body></html>"
    )
    if degrade is not None:
        page = _degrade_markup(page, degrade)
    return page.encode("utf-8")


# ---------------------------------------------------------------------------
# PDF-FAKE payload synthesis — the reference renderer's layout math
# ---------------------------------------------------------------------------

PAGE_W, PAGE_H = 400, 320          # render_text.py:13-14 canvas
MARGIN = 25                        # render_text.py:161
CHAR_W, SPACE_W = 8.0, 6.0         # deterministic fake font metrics


def _layout_words(text: str, font_size: int, x_shift: float = 0.0,
                  y_start: float = 40.0, width: float = PAGE_W
                  ) -> tuple[list[list[object]], float]:
    """Greedy word-wrap + centering + 1.2em advance (render_text.py:163-254),
    inverted fake metrics. Returns (word boxes, final y)."""
    words = text.strip().replace("\n", " ").split()  # render_text.py:158
    available = width - 2 * MARGIN
    lines: list[list[str]] = []
    cur: list[str] = []
    cur_w = 0.0
    for w in words:
        ww = CHAR_W * len(w)
        if cur and cur_w + SPACE_W + ww > available:
            lines.append(cur)
            cur, cur_w = [w], ww
        else:
            cur_w = cur_w + SPACE_W + ww if cur else ww
            cur.append(w)
    if cur:
        lines.append(cur)
    boxes: list[list[object]] = []
    y = y_start
    advance = int(font_size * 1.2)
    for line in lines:
        line_w = sum(CHAR_W * len(w) for w in line) + SPACE_W * (len(line) - 1)
        x = (width - line_w) // 2 + x_shift
        for w in line:
            ww = CHAR_W * len(w)
            boxes.append([w, x, y, x + ww, y + advance])
            x += ww + SPACE_W
        y += advance
    return boxes, y


def _jitter_boxes(rng: random.Random, boxes: list[list[object]]) -> list[list[object]]:
    """L5 (render_text.py:198-199,207-216): per-line baseline shift ±2 plus
    per-word ±1.5 x / ±1 y — within the kernel's 50%-overlap clustering
    tolerance and the 6px space advance, so extraction stays byte-exact."""
    baselines: dict[float, float] = {}
    out = []
    for w, x0, y0, x1, y1 in boxes:
        if y0 not in baselines:
            baselines[y0] = rng.uniform(-2.0, 2.0)
        db = baselines[y0]
        dx, dy = rng.uniform(-1.5, 1.5), rng.uniform(-1.0, 1.0)
        out.append([w, x0 + dx, y0 + db + dy, x1 + dx, y1 + db + dy])
    return out


def _rotate_boxes(rng: random.Random, boxes: list[list[object]]) -> list[list[object]]:
    """L6 (render_text.py:221-243): ±2° per-word rotation — in box-land the
    axis-aligned bbox inflates around the center; small enough that line
    clustering and within-line x-order survive."""
    out = []
    for w, x0, y0, x1, y1 in boxes:
        th = math.radians(rng.uniform(-2.0, 2.0))
        cw, ch = x1 - x0, y1 - y0
        nw = cw * abs(math.cos(th)) + ch * abs(math.sin(th))
        nh = cw * abs(math.sin(th)) + ch * abs(math.cos(th))
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        out.append([w, cx - nw / 2, cy - nh / 2, cx + nw / 2, cy + nh / 2])
    return out


def _washboard_boxes(boxes: list[list[object]],
                     amp: float = 12.0, wavelength: float = 120.0) -> list[list[object]]:
    """L9 (render_text.py:311-331): sinusoidal vertical ripple —
    deliberately beyond the clustering tolerance; the kernel must refuse
    to emit garbled reading order (→ PARSE_FAIL)."""
    out = []
    for w, x0, y0, x1, y1 in boxes:
        dy = amp * math.sin(2 * math.pi * ((x0 + x1) / 2.0) / wavelength)
        out.append([w, x0, y0 + dy, x1, y1 + dy])
    return out


def _cylinder_boxes(boxes: list[list[object]], amp: float = 18.0) -> list[list[object]]:
    """L8 (render_text.py:269-308): cylindrical edge curl — displacement
    grows quadratically toward the page edges (→ PARSE_FAIL)."""
    cx = PAGE_W / 2.0
    out = []
    for w, x0, y0, x1, y1 in boxes:
        t = (((x0 + x1) / 2.0) - cx) / cx
        dy = amp * t * t
        out.append([w, x0, y0 + dy, x1, y1 + dy])
    return out


def _pdf_payload(rng: random.Random, text: str, two_column: bool = False,
                 degrade: str | None = None) -> bytes:
    from sanskrit_ocr_spark.kernels.pdfish import PDF_MAGIC

    font_size = rng.randint(12, 18)  # render_text.py:455-456
    if two_column:
        mid = len(text) // 2
        cut = text.find(" ", mid)
        left, right = text[:cut], text[cut + 1:]
        b1, _ = _layout_words(left, font_size, x_shift=0.0, width=PAGE_W / 2 - 20)
        b2, _ = _layout_words(right, font_size, x_shift=PAGE_W / 2 + 20,
                              width=PAGE_W / 2 - 20)
        boxes = b1 + b2
    else:
        para_break = rng.randint(1, 3)
        chunks = text.split(" ।\n")
        first = " ।\n".join(chunks[:para_break]) + (" ।" if len(chunks) > para_break else "")
        rest = " ।\n".join(chunks[para_break:])
        b1, y_end = _layout_words(first, font_size)
        boxes = b1
        if rest:
            b2, _ = _layout_words(rest, font_size,
                                  y_start=y_end + 30.0)  # > Y_GAP_MIN block gap
            boxes += b2
    if degrade == "jitter":
        boxes = _jitter_boxes(rng, boxes)
    elif degrade == "rotate":
        boxes = _rotate_boxes(rng, boxes)
    elif degrade == "washboard":
        boxes = _washboard_boxes(boxes)
    elif degrade == "cylinder":
        boxes = _cylinder_boxes(boxes)
    rng.shuffle(boxes)  # arbitrary storage order: the kernel must re-sort
    return PDF_MAGIC + json.dumps({"words": boxes}, ensure_ascii=False).encode("utf-8")


# ---------------------------------------------------------------------------
# Row synthesis
# ---------------------------------------------------------------------------

_EN_FILLER = ("the quick brown fox jumps over the lazy dog again and again "
              "while nobody watches the terminal output scroll by forever")


def _row(doc_id: int) -> dict:
    rng = random.Random(0xD0C5EED ^ (doc_id * 0x9E3779B97F4A7C15 % (1 << 63)))
    kind = doc_id % 100
    block_base = doc_id - kind

    # Zipf-ish host skew: ~30% of rows land on site0 (the "mega host").
    h = rng.randrange(1 << 32)
    host = 0 if h % 10 < 3 else h % 50
    url = f"https://site{host}.example/{doc_id:06d}"
    warc_ts = EPOCH + timedelta(minutes=doc_id)
    lang, text = "sa", ""

    if kind >= 98:  # duplicate-url rows: re-use block row-0's url
        rng0 = random.Random(0xD0C5EED ^ (block_base * 0x9E3779B97F4A7C15 % (1 << 63)))
        h0 = rng0.randrange(1 << 32)
        host0 = 0 if h0 % 10 < 3 else h0 % 50
        url = f"https://site{host0}.example/{block_base:06d}"
        text = _doc_text(rng, rng.randint(3, 8))
        html = _html_page(rng, text)
    elif kind >= 96:  # non-NFC input: precomposed nukta consonants
        # U+0958..U+095F are composition exclusions — NFC decomposes them —
        # so html carries a non-NFC form the pipeline must normalize.
        raw = _doc_text(rng, rng.randint(3, 6))
        nukta_word = "".join(
            rng.choice("क़ख़ग़ज़ड़ढ़फ़य़")
            for _ in range(3))
        raw = nukta_word + " " + raw
        html = _html_page(rng, raw)
        text = unicodedata.normalize("NFC", raw)
    elif kind >= 93:  # conjunct-heavy
        text = _doc_text(rng, rng.randint(3, 6), conjunct_heavy=True)
        html = _html_page(rng, text)
    elif kind >= 90:  # real double-danda terminator
        text = _doc_text(rng, rng.randint(3, 6), terminator="॥")
        html = _html_page(rng, text)
    elif kind == 89:  # corrupt PDF JSON
        lang, text = "sa", ""
        from sanskrit_ocr_spark.kernels.pdfish import PDF_MAGIC
        html = PDF_MAGIC + b'{"words": [["x", 0, 0,'
    elif kind == 88:  # invalid UTF-8
        lang, text = "sa", ""
        html = b"<html><body><p>\xff\xfe\x80 broken</p></body></html>"
    elif kind >= 85:  # empty-after-clean
        lang = "en"
        html = _html_page(rng, _EN_FILLER)
    elif kind >= 80:  # duplicate-text rows (share block row-0's text)
        # Replay block row-0's exact RNG sequence to reproduce its text.
        rng0 = random.Random(0xD0C5EED ^ (block_base * 0x9E3779B97F4A7C15 % (1 << 63)))
        rng0.randrange(1 << 32)  # burn the host draw
        text = _doc_text(rng0, rng0.randint(3, 10))
        html = _html_page(rng, text)
    elif kind >= 70:  # mixed-script distractor
        lang = "en"
        dev = _sentence(rng) + "।"
        text = dev
        mixed = f"Intro paragraph in English only. {dev} And a trailing clause."
        html = _html_page(rng, mixed)
    elif kind >= 60:  # PDF-FAKE payload (65-68 = L5/L6/L9/L8 degradations)
        text = _doc_text(rng, rng.randint(4, 10))
        variant = {65: "jitter", 66: "rotate",
                   67: "washboard", 68: "cylinder"}.get(kind)
        html = _pdf_payload(rng, text, two_column=(kind == 69),
                            degrade=variant)
    else:  # plain HTML Devanagari (55-59 = degraded-markup variants)
        text = _doc_text(rng, rng.randint(3, 10))
        html = _html_page(rng, text,
                          degrade=(kind - 55) if kind >= 55 else None)

    return {"url": url, "warc_ts": warc_ts, "html": html,
            "text": text, "lang": lang}


def pages_pandas(start: int, n: int) -> pd.DataFrame:
    """Rows ``doc_id ∈ [start, start+n)`` as a pandas DataFrame."""
    return pd.DataFrame([_row(i) for i in range(start, start + n)],
                        columns=["url", "warc_ts", "html", "text", "lang"])


PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def pages_df(spark, n_rows: int, n_partitions: int = 32):
    """Distributed synthesis: ``spark.range`` → ``mapInPandas`` batch
    generator. Seeded per doc_id, so the output is independent of
    partitioning — the same corpus at any parallelism (the property the
    two-cluster-size bench relies on)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield pd.DataFrame([_row(int(i)) for i in ids],
                                   columns=["url", "warc_ts", "html",
                                            "text", "lang"])

    return (spark.range(0, n_rows, 1, n_partitions)
            .mapInPandas(gen, schema=PAGES_SCHEMA))
