"""XY-cut layout kernel (kernels/layout.py).

Value parity with the committed fixture is covered by the registry
sweep; here the kernel's geometric semantics are pinned directly:
single-column pages recover the line->word hierarchy in reading order,
a constructed two-column page cuts the gutter FIRST (all of column 1
precedes all of column 2), and the degenerate inputs behave.
"""

import numpy as np

from ocr_gang_spark.atlas import render_page
from ocr_gang_spark.kernels.image_ops import binarize
from ocr_gang_spark.kernels.layout import xy_cut_blocks


def _bw(text: str, key: str) -> np.ndarray:
    page, _ = render_page(text, key=key)
    return binarize(page)


def test_single_column_line_word_hierarchy():
    """Three words then four words -> 7 leaf blocks, lines in order,
    words left-to-right within each line."""
    bw = _bw("hello world foo\nbar baz qux quux", "xy1")
    blocks = xy_cut_blocks(bw)
    assert len(blocks) == 7
    # reading order: indices already 0..6 in emit order
    assert [b[0] for b in blocks] == list(range(7))
    line1, line2 = blocks[:3], blocks[3:]
    assert max(b[4] for b in line1) <= min(b[2] for b in line2)  # y1 <= next y0
    for line in (line1, line2):
        xs = [b[3] for b in line]
        assert xs == sorted(xs)  # left-to-right


def test_two_column_gutter_cuts_first():
    """A 40px full-height gutter is wider than any word gap, so the
    column cut happens at depth 1 and every block of column 1 precedes
    every block of column 2 in reading order."""
    p1, _ = render_page("hello world foo\nbar baz qux quux", key="xy1")
    p2, _ = render_page("alpha beta\ngamma delta", key="xy2")
    h = max(p1.shape[0], p2.shape[0])
    w1 = p1.shape[1]
    comp = np.full((h, w1 + 40 + p2.shape[1], 3), 255, dtype=p1.dtype)
    comp[: p1.shape[0], :w1] = p1
    comp[: p2.shape[0], w1 + 40 :] = p2
    blocks = xy_cut_blocks(binarize(comp))
    col1 = [b[0] for b in blocks if b[3] < w1]
    col2 = [b[0] for b in blocks if b[3] >= w1]
    assert col1 and col2
    assert max(col1) < min(col2)


def test_blocks_are_tight_disjoint_and_cover_ink():
    bw = _bw("some words here\nand more words", "xy3")
    blocks = xy_cut_blocks(bw)
    ink = bw == 0
    covered = np.zeros_like(ink)
    for _bi, _d, y0, x0, y1, x1 in blocks:
        sub = ink[y0:y1, x0:x1]
        # tight: every edge row/col of the leaf bbox touches ink
        assert sub[0].any() and sub[-1].any()
        assert sub[:, 0].any() and sub[:, -1].any()
        assert not covered[y0:y1, x0:x1].any()  # disjoint
        covered[y0:y1, x0:x1] = True
    assert not (ink & ~covered).any()  # every ink pixel inside some leaf


def test_degenerate_pages():
    assert xy_cut_blocks(np.full((20, 30), 255, dtype=np.uint8)) == []
    one = np.full((20, 30), 255, dtype=np.uint8)
    one[5, 7] = 0
    assert xy_cut_blocks(one) == [(0, 0, 5, 7, 6, 8)]
    all_ink = np.zeros((4, 4), dtype=np.uint8)
    assert xy_cut_blocks(all_ink) == [(0, 0, 0, 0, 4, 4)]


def test_max_depth_bounds_recursion():
    bw = _bw("iji iji\niji iji", "xy4")  # dotted glyphs invite deep cuts
    for b in xy_cut_blocks(bw):
        assert b[1] <= 4


def test_property_blocks_partition_ink_on_random_pages():
    """Hypothesis-style property over random binary pages (seeded numpy
    draws — deterministic): leaves are disjoint, tight, cover every ink
    pixel, and indices are contiguous reading order, at every gap
    parameterization tried."""
    rng = np.random.default_rng(404)
    for trial in range(40):
        h = int(rng.integers(1, 60))
        w = int(rng.integers(1, 60))
        density = rng.uniform(0.02, 0.6)
        bw = np.where(rng.random((h, w)) < density, 0, 255).astype(np.uint8)
        min_gy = int(rng.integers(1, 4))
        min_gx = int(rng.integers(1, 6))
        blocks = xy_cut_blocks(bw, min_gap_y=min_gy, min_gap_x=min_gx)
        ink = bw == 0
        if not ink.any():
            assert blocks == []
            continue
        covered = np.zeros_like(ink)
        assert [b[0] for b in blocks] == list(range(len(blocks)))
        for _bi, _d, y0, x0, y1, x1 in blocks:
            assert 0 <= y0 < y1 <= h and 0 <= x0 < x1 <= w
            sub = ink[y0:y1, x0:x1]
            assert sub[0].any() and sub[-1].any()
            assert sub[:, 0].any() and sub[:, -1].any()
            assert not covered[y0:y1, x0:x1].any()
            covered[y0:y1, x0:x1] = True
        assert not (ink & ~covered).any()
