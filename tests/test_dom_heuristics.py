"""Pins for the DOM-heuristic block classifier (kernels/dom_heuristics.py)."""

from ocr_gang_spark.kernels.dom_heuristics import (
    MAX_LINK_DENSITY,
    MIN_WORDS,
    classify_blocks,
    extract_main_content,
)

CONTENT = "the quick brown fox jumps over the lazy dog"  # 9 words


def blocks(html):
    return classify_blocks(html)


class TestSplitting:
    def test_single_paragraph(self):
        b = blocks(f"<p>{CONTENT}</p>")
        assert len(b) == 1 and b[0].is_content and b[0].text == CONTENT

    def test_block_tags_split(self):
        b = blocks("<div>one block here</div><p>two block here</p>")
        assert [x.text for x in b] == ["one block here", "two block here"]

    def test_inline_tags_do_not_split(self):
        b = blocks(f"<p>{CONTENT} <b>bold</b> <i>ital</i> words</p>")
        assert len(b) == 1
        assert b[0].text == f"{CONTENT} bold ital words"

    def test_br_hr_split(self):
        b = blocks("first half line<br>second half line<hr>third half line")
        assert [x.text for x in b] == [
            "first half line", "second half line", "third half line"
        ]

    def test_bare_text_no_tags(self):
        b = blocks(CONTENT)
        assert len(b) == 1 and b[0].is_content

    def test_empty_blocks_dropped(self):
        assert blocks("<p></p><div>  </div><p>real text block here now</p>")[0].idx == 0

    def test_script_style_comment_dropped(self):
        b = blocks(
            f"<script>var x = 'five words of script';</script>"
            f"<!-- comment words here go away --><p>{CONTENT}</p>"
        )
        assert len(b) == 1 and b[0].text == CONTENT

    def test_entities_decoded(self):
        b = blocks("<p>fish &amp; chips &lt;tag&gt; &#65; one two</p>")
        assert b[0].text == "fish & chips <tag> A one two"

    def test_case_insensitive_tags(self):
        b = blocks(f"<NAV><P>chrome menu items</P></NAV><P>{CONTENT}</P>")
        assert b[0].container == "nav" and b[1].is_content


class TestContainers:
    def test_semantic_container_excludes(self):
        for tag in ("nav", "header", "footer", "aside", "form"):
            b = blocks(f"<{tag}><p>{CONTENT}</p></{tag}>")
            assert b[0].container == tag and not b[0].is_content, tag

    def test_container_restored_after_close(self):
        b = blocks(f"<nav><p>menu of links</p></nav><p>{CONTENT}</p>")
        assert b[0].container == "nav"
        assert b[1].container == "" and b[1].is_content

    def test_nested_containers_innermost_wins(self):
        b = blocks(f"<header><nav><p>{CONTENT}</p></nav></header>")
        assert b[0].container == "nav"

    def test_nested_close_restores_outer(self):
        b = blocks(
            f"<header><nav><p>menu one two</p></nav><p>{CONTENT}</p></header>"
        )
        assert b[0].container == "nav" and b[1].container == "header"

    def test_stray_close_tag_ignored(self):
        b = blocks(f"</nav><p>{CONTENT}</p>")
        assert b[0].container == "" and b[0].is_content

    def test_unclosed_container_sticks(self):
        b = blocks(f"<footer><p>{CONTENT}</p>")
        assert b[0].container == "footer" and not b[0].is_content


class TestHeuristics:
    def test_min_words_boundary(self):
        exactly = " ".join(["word"] * MIN_WORDS)
        under = " ".join(["word"] * (MIN_WORDS - 1))
        assert blocks(f"<p>{exactly}</p>")[0].is_content
        assert not blocks(f"<p>{under}</p>")[0].is_content

    def test_link_density_excludes(self):
        # 50% of chars inside <a> -> boilerplate
        half = "aaaa bbbb cccc"
        b = blocks(f"<p>{half} <a href='/'>{half}</a></p>")
        assert b[0].link_density > MAX_LINK_DENSITY
        assert not b[0].is_content

    def test_low_link_density_kept(self):
        b = blocks(f"<p>{CONTENT} {CONTENT} <a href='/'>tiny</a></p>")
        assert b[0].link_density < MAX_LINK_DENSITY
        assert b[0].is_content

    def test_density_resets_per_block(self):
        b = blocks(
            f"<p><a>all link text here</a></p><p>{CONTENT}</p>"
        )
        assert b[0].link_density == 1.0
        assert b[1].link_density == 0.0 and b[1].is_content

    def test_nested_links_balanced(self):
        b = blocks(f"<p><a><a>x</a>y</a> {CONTENT}</p>")
        assert b[0].is_content  # density small; nesting must not corrupt state


class TestExtract:
    def test_joins_content_blocks_in_order(self):
        html = (
            f"<nav><p>menu</p></nav><p>first content paragraph right here</p>"
            f"<p>skip</p><div>second content paragraph right here</div>"
        )
        assert extract_main_content(html) == (
            "first content paragraph right here\n"
            "second content paragraph right here"
        )

    def test_none_input(self):
        assert classify_blocks(None) == []
        assert extract_main_content(None) == ""

    def test_all_boilerplate_yields_empty(self):
        assert extract_main_content("<nav><p>only menu stuff here now</p></nav>") == ""
