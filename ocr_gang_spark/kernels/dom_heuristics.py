"""DOM-heuristic main-content extraction (boilerplate classification).

north_rule: "main-content extraction pipeline (HTML boilerplate strip,
PDF/layout parse, DOM heuristics)".  kernels/html_strip.py is the
tag-strip half; this module is the *classifier* half — the simplified,
deterministic core of the public jusText / Readability / Boilerpipe
family of block-level heuristics (Kohlschütter et al., WSDM 2010:
shallow text features — block word count and link density — carry most
of the boilerplate signal).  Like html_strip, the exact rule set below
is **our own pinned spec**, frozen by golden tests:

  1. the document is split into BLOCKS at every open/close of a
     block-level tag (p div li td th h1-6 table ul ol section article
     blockquote pre tr dl dd dt figure main);
  2. each block remembers the innermost SEMANTIC container it sits in
     (nav header footer aside form — the tags HTML5 defines as
     non-main-content chrome) — '' when in none;
  3. script/style/head/template/noscript bodies and comments are
     dropped before splitting (same rule as html_strip);
  4. per block: words = whitespace-split tokens of the entity-decoded
     text; link_density = chars shown inside <a> / total chars;
  5. a block is MAIN CONTENT iff it is outside every semantic
     container AND has >= 5 words AND link_density < 0.4;
  6. the document's main content is the content blocks' text joined
     with '\\n', in document order.

Pure str -> data; the Spark pipeline maps it over Arrow batches.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple

from .html_strip import _NAMED, _NUM_ENTITY, _WS, _decode_numeric

MIN_WORDS = 5
MAX_LINK_DENSITY = 0.4

_BLOCK_TAGS = frozenset(
    "p div li td th h1 h2 h3 h4 h5 h6 table ul ol section article "
    "blockquote pre tr dl dd dt figure main".split()
)
_SEMANTIC_TAGS = frozenset("nav header footer aside form".split())

_DROP = re.compile(
    r"<(script|style|head|template|noscript)\b.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_TAG = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*?(/?)>")


def _clean(text: str) -> str:
    """Entity decode + whitespace collapse (html_strip rules 4-5)."""
    for ent, ch in _NAMED:
        text = text.replace(ent, ch)
    text = _NUM_ENTITY.sub(_decode_numeric, text)
    text = text.replace("&amp;", "&")
    return _WS.sub(lambda m: "\n" if "\n" in m.group(0) else " ", text).strip()


class Block(NamedTuple):
    idx: int            # 0-based block index in document order
    container: str      # innermost semantic container tag, '' if none
    text: str           # cleaned text
    n_words: int
    link_density: float
    is_content: bool


def classify_blocks(html: str) -> List[Block]:
    """Split one document into classified blocks per the pinned spec."""
    if html is None:
        return []
    s = _DROP.sub(" ", html)

    blocks: List[Block] = []
    containers: List[str] = []  # open semantic-tag stack
    buf: List[str] = []
    link_chars = 0
    total_chars = 0
    in_link = 0
    block_container = ""  # snapshot at the time the block started

    def flush() -> None:
        nonlocal buf, link_chars, total_chars
        text = _clean("".join(buf))
        if text:
            n_words = len(text.split())
            density = (link_chars / total_chars) if total_chars else 0.0
            blocks.append(
                Block(
                    len(blocks),
                    block_container,
                    text,
                    n_words,
                    round(density, 6),
                    block_container == ""
                    and n_words >= MIN_WORDS
                    and density < MAX_LINK_DENSITY,
                )
            )
        buf, link_chars, total_chars = [], 0, 0

    pos = 0
    for m in _TAG.finditer(s):
        seg = s[pos : m.start()]
        if seg:
            buf.append(seg)
            stripped = len(_clean(seg))
            total_chars += stripped
            if in_link:
                link_chars += stripped
        pos = m.end()
        closing, tag, self_close = m.group(1) == "/", m.group(2).lower(), m.group(3)
        if tag == "a":
            in_link = max(0, in_link - 1) if closing else in_link + 1
        elif tag in _SEMANTIC_TAGS and not self_close:
            flush()
            if closing:
                if tag in containers:
                    del containers[len(containers) - 1 - containers[::-1].index(tag):]
            else:
                containers.append(tag)
            block_container = containers[-1] if containers else ""
        elif tag in _BLOCK_TAGS or tag in ("br", "hr"):
            flush()
    tail = s[pos:]
    if tail:
        buf.append(tail)
        stripped = len(_clean(tail))
        total_chars += stripped
        if in_link:
            link_chars += stripped
    flush()
    return blocks


def extract_main_content(html: str) -> str:
    """Main-content text of one document: content blocks joined by '\\n'."""
    return "\n".join(b.text for b in classify_blocks(html) if b.is_content)
