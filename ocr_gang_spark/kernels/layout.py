"""Recursive XY-cut page layout analysis (Nagy & Seth 1984).

The reference engine is strictly single-column: PerformOCR's
segmentation (reference source/segmentation/segmentation.c:9-259) cuts
the page into horizontal line blocs and each bloc into char runs, which
is exactly a depth-2 XY-cut with fixed axis order.  This kernel is the
general form — recursive alternating-axis cuts at projection-profile
valleys — which additionally handles multi-column layouts (newspaper /
two-column PDF scans): a wide vertical gutter is cut BEFORE line gaps
because the axis with the widest gap is cut first, so each column's
lines stay together in reading order.

Pure NumPy over a binarized {0,255} page; no Spark here.  The Spark
query (extraction_queries.layout_xy_blocks) maps it over media blobs in
Arrow batches; scripts/make_expected.py re-derives every fixture row
through an independent scan-loop implementation and fails generation on
disagreement.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

# defaults calibrated to the atlas renderer's geometry (atlas.py):
# line_gap 1..5 rows => any all-white row separates lines; char_gap
# 1..4 < MIN_WORD_GAP 13 <= word_gap => a 13-col threshold cuts words,
# never glyphs.  max_depth bounds pathological recursion (a lone 'i'
# would otherwise split at the dot gap, then its pieces again).
XY_MIN_GAP_Y = 1
XY_MIN_GAP_X = 13
XY_MAX_DEPTH = 4


def _gap_runs(white: np.ndarray, min_gap: int) -> List[Tuple[int, int]]:
    """Maximal runs of True (all-white positions) of length >= min_gap
    that do not touch either border, as [start, end) pairs."""
    n = white.size
    if n == 0:
        return []
    d = np.diff(white.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if white[0]:
        starts = np.concatenate(([0], starts))
    if white[-1]:
        ends = np.concatenate((ends, [n]))
    out = []
    for s, e in zip(starts, ends):
        if s == 0 or e == n:  # border margins are not cuts
            continue
        if e - s >= min_gap:
            out.append((int(s), int(e)))
    return out


def xy_cut_blocks(
    bw: np.ndarray,
    min_gap_y: int = XY_MIN_GAP_Y,
    min_gap_x: int = XY_MIN_GAP_X,
    max_depth: int = XY_MAX_DEPTH,
) -> List[Tuple[int, int, int, int, int, int]]:
    """Recursive XY-cut -> reading-order leaf blocks.

    ``bw``: (h, w) uint8 {0, 255} binarized page (0 = ink).
    Returns [(block_idx, depth, y0, x0, y1, x1)] with absolute
    half-open pixel bounds, tightened to the ink bbox of each leaf.
    Reading order is the recursion order: at each node the axis with
    the WIDEST qualifying gap is cut at every qualifying gap of that
    axis, sub-regions recurse top-to-bottom (Y cut) or left-to-right
    (X cut).  A region with no qualifying gap on either axis — or at
    ``max_depth`` — is a leaf.  An all-white page yields [].
    """
    ink = bw == 0
    out: List[Tuple[int, int, int, int, int, int]] = []

    def tighten(y0: int, y1: int, x0: int, x1: int):
        sub = ink[y0:y1, x0:x1]
        rows = sub.any(axis=1)
        if not rows.any():
            return None
        cols = sub.any(axis=0)
        ty0 = y0 + int(rows.argmax())
        ty1 = y1 - int(rows[::-1].argmax())
        tx0 = x0 + int(cols.argmax())
        tx1 = x1 - int(cols[::-1].argmax())
        return ty0, ty1, tx0, tx1

    def recurse(y0: int, y1: int, x0: int, x1: int, depth: int) -> None:
        t = tighten(y0, y1, x0, x1)
        if t is None:
            return
        y0, y1, x0, x1 = t
        sub = ink[y0:y1, x0:x1]
        gaps_y = gaps_x = []
        if depth < max_depth:
            gaps_y = _gap_runs(~sub.any(axis=1), min_gap_y)
            gaps_x = _gap_runs(~sub.any(axis=0), min_gap_x)
        if not gaps_y and not gaps_x:
            out.append((len(out), depth, y0, x0, y1, x1))
            return
        widest_y = max((e - s for s, e in gaps_y), default=0)
        widest_x = max((e - s for s, e in gaps_x), default=0)
        # ties cut Y first: the reference's line-before-char order
        if widest_y >= widest_x:
            bounds = [0] + [g for s, e in gaps_y for g in (s, e)] + [y1 - y0]
            for a, b in zip(bounds[0::2], bounds[1::2]):
                recurse(y0 + a, y0 + b, x0, x1, depth + 1)
        else:
            bounds = [0] + [g for s, e in gaps_x for g in (s, e)] + [x1 - x0]
            for a, b in zip(bounds[0::2], bounds[1::2]):
                recurse(y0, y1, x0 + a, x0 + b, depth + 1)

    recurse(0, bw.shape[0], 0, bw.shape[1], 0)
    return out
