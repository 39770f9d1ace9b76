"""Main-content extraction from HTML — jusText/Boilerpipe-style heuristics.

The reference repo generates documents whose "boilerplate" is the synthetic
page background (``datagen/augmentations/render_text.py:47-148``); the
HTML-world analog (BASELINE.json north_star) is nav/sidebar/footer chrome.
This kernel strips it with the two classic density heuristics:

* **link density** (jusText): fraction of a block's characters that sit
  inside ``<a>`` — high link density ⇒ navigation, not content;
* **text length / density** (Boilerpipe): very short standalone blocks are
  chrome (buttons, copyright lines); long runs of text are content.

Implemented over the stdlib ``html.parser.HTMLParser`` (no lxml in this
environment) as a single streaming pass producing flat "blocks" — one block
per deepest block-level element containing text, annotated with total and
link character counts — then classified. Deterministic: same bytes in, same
text out, on any platform.

The kernel is pure Python and is executed in vectorized fashion over whole
Arrow batches by ``sanskrit_ocr_spark/extract/pipeline.py``.
"""

from __future__ import annotations

from html.parser import HTMLParser

# Elements that delimit text blocks (closing/opening one flushes the current
# block). Matches the usual block-level display set.
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "body", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li", "main", "nav",
    "ol", "p", "pre", "section", "table", "td", "th", "tr", "ul", "br",
}

# Content inside these is never text.
_IGNORE_TAGS = {"script", "style", "noscript", "template", "head", "svg"}

_VOID_TAGS = {"br", "hr", "img", "meta", "link", "input", "area", "base",
              "col", "embed", "source", "track", "wbr"}

# Classification thresholds (jusText uses max_link_density≈0.2 and 70/200-char
# stopword-length gates; ours are tuned for short Devanagari sentences).
MAX_LINK_DENSITY = 0.35
MIN_CONTENT_CHARS = 20


class _Block:
    __slots__ = ("parts", "link_chars", "total_chars", "tag")

    def __init__(self, tag: str) -> None:
        self.parts: list[str] = []
        self.link_chars = 0
        self.total_chars = 0
        self.tag = tag

    def text(self) -> str:
        # Collapse intra-block whitespace runs to single spaces.
        return " ".join("".join(self.parts).split())

    def link_density(self) -> float:
        return (self.link_chars / self.total_chars) if self.total_chars else 0.0


class _BlockParser(HTMLParser):
    """One streaming pass: HTML → list of (_Block) in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur = _Block("body")
        self._ignore_depth = 0
        self._link_depth = 0

    # -- block lifecycle -----------------------------------------------------
    def _flush(self, next_tag: str) -> None:
        if self._cur.total_chars:
            self.blocks.append(self._cur)
        self._cur = _Block(next_tag)

    # -- HTMLParser hooks ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _IGNORE_TAGS:
            if tag not in _VOID_TAGS:
                self._ignore_depth += 1
            return
        if tag == "a":
            self._link_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _IGNORE_TAGS:
            self._ignore_depth = max(0, self._ignore_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush(self._cur.tag)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._flush(tag)

    def handle_data(self, data: str) -> None:
        if self._ignore_depth:
            return
        stripped = data.strip()
        if not stripped:
            # Preserve a word boundary for whitespace-only runs.
            if self._cur.parts and not self._cur.parts[-1].endswith(" "):
                self._cur.parts.append(" ")
            return
        self._cur.parts.append(data)
        n = len(stripped)
        self._cur.total_chars += n
        if self._link_depth:
            self._cur.link_chars += n

    def close(self) -> None:  # flush trailing block
        super().close()
        if self._cur.total_chars:
            self.blocks.append(self._cur)
            self._cur = _Block("body")


_GOOD, _SHORT, _BAD = "good", "short", "bad"


def _classify(blocks: list[_Block]) -> list[str]:
    """jusText-style two-pass classification.

    Pass 1 (context-free, structural): a block is ``bad`` if its link
    density exceeds ``MAX_LINK_DENSITY``; else ``good`` if its collapsed
    text has ≥ ``MIN_CONTENT_CHARS`` characters; else ``short``
    (undecided). Script selection is NOT part of classification — the
    downstream Devanagari content filter (P1) owns that.

    Pass 2 (context): a ``short`` block is promoted to ``good`` when its
    nearest non-``short`` neighbor on either side is ``good`` (jusText's
    near-good promotion), else demoted to ``bad``. A document whose blocks
    are all ``short`` keeps them (nothing to contrast against).
    """
    cls = []
    for b in blocks:
        if b.link_density() > MAX_LINK_DENSITY:
            cls.append(_BAD)
        elif len(b.text()) >= MIN_CONTENT_CHARS:
            cls.append(_GOOD)
        else:
            cls.append(_SHORT)
    if all(c == _SHORT for c in cls):
        return [_GOOD] * len(cls)
    # nearest non-short neighbor classes
    n = len(cls)
    prev_solid = [None] * n
    last = None
    for i in range(n):
        prev_solid[i] = last
        if cls[i] != _SHORT:
            last = cls[i]
    next_solid = [None] * n
    nxt = None
    for i in range(n - 1, -1, -1):
        next_solid[i] = nxt
        if cls[i] != _SHORT:
            nxt = cls[i]
    return [
        (_GOOD if (prev_solid[i] == _GOOD or next_solid[i] == _GOOD) else _BAD)
        if c == _SHORT else c
        for i, c in enumerate(cls)
    ]


def extract_html(markup: str) -> str:
    """HTML string → main-content text (blocks joined by ``\\n``).

    Raises on grossly malformed markup only if the stdlib parser itself
    raises; callers map exceptions to a ``PARSE_FAIL`` status
    (the per-row analog of the reference's batch error-skip,
    ``datagen/translate_bookcorpus.py:141-146``).
    """
    parser = _BlockParser()
    parser.feed(markup)
    parser.close()
    cls = _classify(parser.blocks)
    return "\n".join(
        b.text() for b, c in zip(parser.blocks, cls) if c == _GOOD
    )
