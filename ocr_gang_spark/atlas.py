"""Deterministic 52-class glyph atlas + page renderer.

The reference repo's de-facto golden inputs are page bitmaps rendered in
a known font plus 520 glyph fixtures (reference img/, SURVEY.md §5.1);
its weight files ship empty, so both glyph shapes and weights are ours
to pin (SURVEY.md §7.0).  This module synthesizes both sides of that
contract with zero external data:

* a seeded atlas of 52 visually-distinct glyph bitmaps (one per class
  'A'-'Z' 'a'-'z'), each GLYPH_W x GLYPH_H with a full ink border ring —
  the ring guarantees every row/column of the glyph contains ink, so
  projection-profile segmentation can never split a glyph, and the
  tight bounding box is always the full glyph => every rendered
  instance of a class normalizes to the *same* 28x28 matrix;

* a renderer that lays glyphs out on a white page with margins/gaps
  chosen so the reference segmentation semantics reproduce the source
  text exactly:
    - lines separated by >=1 all-white row        (G1/G2)
    - glyphs separated by 1..12 white columns     (below the space rule)
    - word gaps >= 13 columns                     (space rule fires: with
      16px-wide glyphs the SizeOfChar fold yields charSize 16..18 for any
      glyph count >= 1, so spaceSize = (charSize/4)*3 == 12 always, and a
      gap of G columns inserts a space iff G >= spaceSize + 1 == 13 —
      segmentation.c:220,248 semantics, pinned by tests)
    - right margin <= 12 columns (no trailing space), left margin free
      (the gap before the first run never inserts a space)

Expected OCR text is therefore known by construction, which makes
end-to-end goldens self-verifying.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import Dict, Tuple

import numpy as np

from .kernels.image_ops import glyph_to_matrix
from .kernels.nn import CLASS_CHARS

GLYPH_W = 16
GLYPH_H = 20
ATLAS_SEED = 20260816
SPACE_SIZE = 12  # (charSize/4)*3 for 16px glyphs; see module docstring
MIN_WORD_GAP = SPACE_SIZE + 1  # 13 — smallest gap that inserts a space
ALPHABET = "".join(CLASS_CHARS)


def _glyph_bitmap(cls_idx: int) -> np.ndarray:
    """Seeded (GLYPH_H, GLYPH_W) bool ink mask with a full border ring."""
    rng = np.random.default_rng(ATLAS_SEED * 1000 + cls_idx)
    g = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
    g[0, :] = g[-1, :] = True
    g[:, 0] = g[:, -1] = True
    g[1:-1, 1:-1] = rng.random((GLYPH_H - 2, GLYPH_W - 2)) < 0.35
    return g


@lru_cache(maxsize=1)
def atlas() -> Dict[str, np.ndarray]:
    """The 52 glyph ink masks, keyed by character."""
    glyphs = {ALPHABET[i]: _glyph_bitmap(i) for i in range(52)}
    # Distinctness of the *normalized* matrices is what classification
    # needs; assert it once at build time.
    mats = {c: glyph_to_matrix(np.where(g, 0, 255).astype(np.uint8)).tobytes()
            for c, g in glyphs.items()}
    assert len(set(mats.values())) == 52, "atlas collision — bump ATLAS_SEED"
    return glyphs


@lru_cache(maxsize=1)
def class_matrices() -> np.ndarray:
    """(52, 28, 28) float64 — the canonical normalized matrix per class."""
    a = atlas()
    return np.stack(
        [glyph_to_matrix(np.where(a[c], 0, 255).astype(np.uint8)) for c in ALPHABET]
    ).astype(np.float64)


def noisy_class_matrices(
    n_per_class: int, seed: int, rate_lo: float = 0.02, rate_hi: float = 0.12
) -> Tuple[np.ndarray, np.ndarray]:
    """Augmented training/validation data: per class, ``n_per_class``
    noisy instances (interior flips at a seeded rate in [lo, hi]),
    normalized exactly as the pipeline normalizes glyph crops.  Mirrors
    the reference's flip-noise augmentation (augmentation.c:100-106).
    Returns (X (N,28,28) float64, y (N,) int labels)."""
    a = atlas()
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for cls, ch in enumerate(ALPHABET):
        base = a[ch]
        for _ in range(n_per_class):
            rate = rng.uniform(rate_lo, rate_hi)
            mask = base.copy()
            mask[1:-1, 1:-1] ^= rng.random((GLYPH_H - 2, GLYPH_W - 2)) < rate
            crop = np.where(mask, 0, 255).astype(np.uint8)
            xs.append(glyph_to_matrix(crop))
            ys.append(cls)
    return np.stack(xs).astype(np.float64), np.array(ys)


def _rng_for(key: str) -> np.random.Generator:
    digest = hashlib.sha256(key.encode()).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "little"))


NOISE_RATE = 0.06  # fraction of interior glyph cells flipped per instance


def render_page(
    text: str,
    key: str = "",
    noise: bool = True,
) -> Tuple[np.ndarray, str]:
    """Render ``text`` (lines of 'A-Za-z' words, single spaces, nonempty
    lines) as an (h, w, 3) uint8 RGB page, returning (page, expected).

    ``expected`` is the exact OCR result under the reference semantics:
    the source text, except that any line whose trailing white stretch
    reaches spaceSize+1 == 13 columns gains one trailing space — the
    reference inserts a space in the *trailing* gap of a line too
    (CountChars segmentation.c:248 runs in the gap after the last run;
    only the gap before the first run is exempt via Count==0), so on a
    rectangular page every line shorter than the widest one typically
    ends with ' '.  This is true C-binary behavior, pinned by tests.

    ``key`` seeds cosmetic variation (margins, gaps, ink/bg gray levels)
    that never affects the recognized text.

    ``noise`` flips a seeded ~6% of each glyph instance's *interior*
    cells (mirroring the reference's flip-noise training augmentation,
    augmentation.c:100-106).  The border ring is never touched, so
    segmentation geometry is unchanged; the fixture weights are trained
    with matching augmentation, so recognition still yields ``expected``
    exactly (pinned by fuzz tests).  Noise makes every glyph instance's
    28x28 matrix unique — the realistic-corpus regime where per-glyph NN
    cost cannot be memoized away.
    """
    rng = _rng_for("page:" + key)
    left = int(rng.integers(1, 9))
    right = int(rng.integers(2, 13))
    top = int(rng.integers(1, 7))
    bottom = int(rng.integers(1, 7))
    line_gap = int(rng.integers(1, 6))
    char_gap = int(rng.integers(1, 5))
    word_gap = int(rng.integers(MIN_WORD_GAP, MIN_WORD_GAP + 8))
    ink = int(rng.integers(0, 100))
    bg = int(rng.integers(220, 256))

    a = atlas()
    lines = text.split("\n")
    for ln in lines:
        if not ln or ln != " ".join(w for w in ln.split(" ") if w):
            raise ValueError(f"unrenderable line {ln!r}")

    def line_width(ln: str) -> int:
        words = ln.split(" ")
        wsum = sum(len(w) * GLYPH_W + (len(w) - 1) * char_gap for w in words)
        return wsum + word_gap * (len(words) - 1)

    w = left + max(line_width(ln) for ln in lines) + right
    h = top + len(lines) * GLYPH_H + (len(lines) - 1) * line_gap + bottom

    page = np.full((h, w), bg, dtype=np.uint8)
    expected_lines = []
    y = top
    for ln in lines:
        x = left
        for wi, word in enumerate(ln.split(" ")):
            if wi:
                x += word_gap
            for ci, ch in enumerate(word):
                if ci:
                    x += char_gap
                mask = a[ch]
                if noise:
                    mask = mask.copy()
                    flips = rng.random((GLYPH_H - 2, GLYPH_W - 2)) < NOISE_RATE
                    mask[1:-1, 1:-1] ^= flips
                block = page[y : y + GLYPH_H, x : x + GLYPH_W]
                block[mask] = ink
                block[~mask] = bg
                x += GLYPH_W
        # Trailing-gap space rule: the last glyph run ends at column x
        # (exclusive); w - x trailing white columns insert one space iff
        # the gap counter reaches spaceSize before the page edge.
        expected_lines.append(ln + " " if w - x >= SPACE_SIZE + 1 else ln)
        y += GLYPH_H + line_gap
    return np.repeat(page[:, :, None], 3, axis=2), "\n".join(expected_lines)


def random_text(key: str, max_lines: int = 3, max_words: int = 4, max_chars: int = 6) -> str:
    """Deterministic renderable text for a key: 1..max_lines lines of
    1..max_words words of 1..max_chars atlas characters."""
    rng = _rng_for("text:" + key)
    lines = []
    for _ in range(int(rng.integers(1, max_lines + 1))):
        words = []
        for _ in range(int(rng.integers(1, max_words + 1))):
            n = int(rng.integers(1, max_chars + 1))
            words.append("".join(ALPHABET[i] for i in rng.integers(0, 52, n)))
        lines.append(" ".join(words))
    return "\n".join(lines)


def page_for_ref(media_ref: str) -> Tuple[str, np.ndarray]:
    """Deterministic (expected_ocr_text, page RGB) for an opaque media_ref."""
    page, expected = render_page(random_text(media_ref), key=media_ref)
    return expected, page
