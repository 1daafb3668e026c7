"""Deterministic HTML boilerplate-strip kernel for text spans.

The reference engine defines outputs only for image spans; the target
pipeline's text spans need a main-content extraction step
(BASELINE.json north_rule: "HTML boilerplate strip, DOM heuristics").
This module is therefore **our own pinned spec** — golden tests freeze
its behavior so the span-sequence invariant stays stable across rounds.

Spec (applied in this exact order):
  1. drop <script>/<style>/<head>/<template>/<noscript> blocks and
     HTML comments (case-insensitive, non-greedy, dot-matches-newline)
  2. block-level boundaries -> '\\n': </p> </div> </li> </tr> </h1-6>
     </table> </ul> </ol> </section> </article> </blockquote> </pre>
     plus <br> and <hr> (any attribute spelling)
  3. drop every remaining tag <...>
  4. decode entities: named (amp lt gt quot apos nbsp) then numeric
     (&#NN; / &#xHH;); '&amp;' decodes last so '&amp;lt;' -> '&lt;'
  5. collapse whitespace: runs containing a newline -> single '\\n',
     other runs -> single ' '; strip leading/trailing whitespace

Pure str -> str; the Spark pipeline maps it over Arrow batches.
"""

from __future__ import annotations

import re
from typing import List

_BLOCK_DROP = re.compile(
    r"<(script|style|head|template|noscript)\b.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_BREAK = re.compile(
    r"</(?:p|div|li|tr|h[1-6]|table|ul|ol|section|article|blockquote|pre)\s*>"
    r"|<(?:br|hr)\b[^>]*>",
    re.IGNORECASE,
)
_TAG = re.compile(r"<[^>]*>")
_NUM_ENTITY = re.compile(r"&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});")
_WS = re.compile(r"[ \t\r\f\v]*\n[\s]*|[ \t\r\f\v]+")

_NAMED = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
]


def _decode_numeric(m: re.Match) -> str:
    body = m.group(1)
    code = int(body[1:], 16) if body[0] in "xX" else int(body, 10)
    if 0 < code <= 0x10FFFF and not (0xD800 <= code <= 0xDFFF):
        return chr(code)
    return ""


def strip_html(text: str) -> str:
    """Apply the pinned boilerplate-strip spec to one document."""
    if text is None:
        return None
    s = _BLOCK_DROP.sub(" ", text)
    s = _BLOCK_BREAK.sub("\n", s)
    s = _TAG.sub(" ", s)
    for ent, ch in _NAMED:
        s = s.replace(ent, ch)
    s = _NUM_ENTITY.sub(_decode_numeric, s)
    s = s.replace("&amp;", "&")
    s = _WS.sub(lambda m: "\n" if "\n" in m.group(0) else " ", s)
    return s.strip()


def strip_html_batch(texts: List[str]) -> List[str]:
    return [strip_html(t) for t in texts]
