"""HTML kernel fuzz: adversarial markup (unterminated tags/comments,
nested brackets, entity bombs, random mutations of real templates) must
terminate fast and never raise — text spans are the majority of a web
corpus, and strip_html/extract_main_content run on every one."""

import signal

import pytest
from hypothesis import given, settings, strategies as st

from ocr_gang_spark.kernels.dom_heuristics import extract_main_content
from ocr_gang_spark.kernels.html_strip import strip_html

BUDGET_S = 5

SEEDS = [
    "<head><title>t</title></head><div>hello world</div>"
    "<script>var x=1;</script><p>tail &amp; done</p>",
    "<article>body text<br>x &lt;y&gt;</article>",
    "<ul><li>a</li><li>b</li></ul><template>skip</template>",
]


class _Wedge(Exception):
    pass


def _bounded(fn, text):
    def _raise(_s, _f):
        raise _Wedge()

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(BUDGET_S)
    try:
        out = fn(text)
        assert isinstance(out, str)
    except _Wedge:
        raise AssertionError(f"{fn.__name__} wedged") from None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@settings(max_examples=150, deadline=None)
@given(
    st.integers(0, len(SEEDS) - 1),
    st.integers(0, 200),
    st.sampled_from(list("<>&;/!-\"'= abc")),
)
def test_mutated_markup_never_raises(idx, pos, ch):
    s = SEEDS[idx]
    s = s[: pos % len(s)] + ch + s[pos % len(s):]
    _bounded(strip_html, s)
    _bounded(extract_main_content, s)


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet="<>&;/!-x ", max_size=300))
def test_bracket_soup(s):
    _bounded(strip_html, s)
    _bounded(extract_main_content, s)


def test_pathological_shapes():
    cases = [
        "<" * 5000,
        "<!--" + "x" * 5000,           # unterminated comment
        "<script>" + "y" * 5000,       # unterminated script
        "&amp;" * 3000,                # entity run
        "<div " + "a='b' " * 2000,     # unterminated attr soup
        "",
    ]
    for s in cases:
        _bounded(strip_html, s)
        _bounded(extract_main_content, s)
