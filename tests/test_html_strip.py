"""Golden tests pinning our HTML boilerplate-strip spec (no reference
counterpart — SURVEY.md §2.7; the spec lives in kernels/html_strip.py)."""

from ocr_gang_spark.kernels.html_strip import strip_html


def test_drops_script_style_head_comments():
    html = (
        "<head><title>T</title></head><body>"
        "<script>var x = '<p>not text</p>';</script>"
        "<style>p { color: red }</style>"
        "<!-- secret -->Hello</body>"
    )
    assert strip_html(html) == "Hello"


def test_block_boundaries_become_newlines():
    html = "<div>first</div><p>second</p>third<br>fourth"
    assert strip_html(html) == "first\nsecond\nthird\nfourth"


def test_inline_tags_become_spaces():
    assert strip_html("a<b>bold</b>c <i>it</i>") == "a bold c it"


def test_entities():
    assert strip_html("Tom &amp; Jerry &lt;3 &quot;cat&quot;&nbsp;&#65;&#x42;") == (
        'Tom & Jerry <3 "cat" AB'
    )


def test_double_encoded_amp_decodes_once():
    # '&amp;lt;' -> '&lt;' (amp decodes last, by spec)
    assert strip_html("&amp;lt;") == "&lt;"


def test_whitespace_collapse():
    assert strip_html("a   b\t c\n\n\nd  \n e") == "a b c\nd\ne"


def test_case_insensitive_and_multiline():
    html = "<SCRIPT type='x'>\nmulti\nline\n</sCrIpT>keep<BR/>me"
    assert strip_html(html) == "keep\nme"


def test_plain_text_passthrough():
    assert strip_html("just some words") == "just some words"


def test_none_passthrough():
    assert strip_html(None) is None


def test_numeric_entity_bounds():
    assert strip_html("&#0;x&#1114112;y") == "xy"  # out-of-range dropped


def test_idempotent_on_stripped_output():
    html = "<div>first</div><p>a &amp; b</p>"
    once = strip_html(html)
    # NOT idempotent in general ('&amp;' -> '&'), but stable when no
    # entities remain — pin the actual contract:
    assert strip_html(once) == once
