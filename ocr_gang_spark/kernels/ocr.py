"""Fused OCR kernel: RGB page image -> recognized text string.

This is the oracle for the whole media-span path: the exact composition
``PerformOCR`` runs (reference source/ocr/ocr.c:112-175) — binarize ->
segment -> matrixify -> classify -> assemble.  The Spark pipeline calls
:func:`ocr_pages_to_text` on Arrow batches; tests call it doc-by-doc.

Result assembly (``build_ocr_result`` ocr.c:87-110): characters of each
line concatenated in order, NULL matrices emit ' ', lines joined with a
single '\\n' (none after the last line).  Zero lines -> empty string.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Iterable, List

import numpy as np

from .bmp import decode_bmp
from .image_ops import binarize, segment_page
from .nn import OcrWeights, classify, classify_margin_ppm

# Content-addressed memoization (semantically transparent: identical
# input bytes -> identical output by purity of the kernels).  Real
# corpora repeat glyph shapes heavily, so the executor-local LRU turns
# the per-glyph NN cost into a dict lookup for repeats; each Spark
# python worker is single-threaded, so no locking is needed.
_CLS_CACHE_MAX = 65536
_MAT_CACHE_MAX = 16384
_MAT_CACHE: OrderedDict = OrderedDict()  # (crop shape, bytes) -> matrix|None


def _cls_cache(weights: OcrWeights) -> OrderedDict:
    # cache rides on the weights object (one broadcast value per worker),
    # so different weights can never cross-contaminate
    cache = getattr(weights, "_cls_cache", None)
    if cache is None:
        cache = OrderedDict()
        object.__setattr__(weights, "_cls_cache", cache)
    return cache


def _dedup_layouts(pages, cache, binarize_input: bool = True):
    """The ONE segment/dedup walk every OCR entry point shares
    (round-4 review: three hand-synchronized copies guaranteed the
    batch/margin paths' identity only by eyeballing): binarize ->
    segment (content-addressed matrix memo) -> per-glyph classification
    cache probe -> novel-matrix dedup.

    Returns (layouts, novel, novel_keys).  Layout slots per line:
    ``None`` (space) | a cached value (whatever the caller stores —
    str for the text path, (char, ppm) for the fused path; never int)
    | an int index into ``novel``.  Callers classify ``novel`` once,
    update ``cache`` keyed by ``novel_keys``, and resolve int slots."""
    layouts: List[list] = []
    novel: List[np.ndarray] = []
    novel_keys: List[bytes] = []
    pending: dict = {}
    while len(_MAT_CACHE) > _MAT_CACHE_MAX:
        _MAT_CACHE.popitem(last=False)
    for page in pages:
        bw = binarize(page) if binarize_input else page
        layout = []
        for line in segment_page(bw, matrix_cache=_MAT_CACHE):
            slots = []
            for mat in line:
                if mat is None:
                    slots.append(None)
                    continue
                key = mat.tobytes()
                hit = cache.get(key)
                if hit is not None:
                    cache.move_to_end(key)
                    slots.append(hit)
                    continue
                idx = pending.get(key)
                if idx is None:
                    idx = len(novel)
                    pending[key] = idx
                    novel.append(mat)
                    novel_keys.append(key)
                slots.append(idx)
            layout.append(slots)
        layouts.append(layout)
    return layouts, novel, novel_keys


def extract_text(rgb: np.ndarray, weights: OcrWeights) -> str:
    """OCR one page image ((h, w, 3) uint8 RGB) into its text string."""
    return ocr_pages_to_text([rgb], weights)[0]


def extract_text_from_bmp(data: bytes, weights: OcrWeights) -> str:
    return ocr_pages_to_text([decode_bmp(data)], weights)[0]


def ocr_pages_to_text(pages: Iterable[np.ndarray], weights: OcrWeights) -> List[str]:
    """Batched OCR: segmentation per page; classification deduplicated by
    matrix content and batched across every novel glyph of the batch
    (one chunked conv + two matmuls total).

    Per-page segmentation is cheap vectorized NumPy; dedup + batching
    keeps the Python-side and NN work per glyph ~zero for repeats.
    """
    cache = _cls_cache(weights)
    layouts, novel, novel_keys = _dedup_layouts(pages, cache)

    if novel:
        # uint8 {0,1} stack: the binary conv LUT needs no float64 input,
        # and an (N,28,28) float64 stack is 8x the memory traffic
        chars = classify(np.stack(novel), weights)
        for key, ch in zip(novel_keys, chars):
            cache[key] = str(ch)
        while len(cache) > _CLS_CACHE_MAX:
            cache.popitem(last=False)
    else:
        chars = np.empty(0, dtype="<U1")

    out = []
    for layout in layouts:
        text_lines = [
            "".join(
                " " if s is None else (s if isinstance(s, str) else str(chars[s]))
                for s in slots
            )
            for slots in layout
        ]
        out.append("\n".join(text_lines))
    return out


def page_margin_stats(bw_pages: Iterable[np.ndarray], weights: OcrWeights):
    """Per-page confidence aggregates for rejection routing: segment
    each (already binarized) page, classify every glyph instance with
    classify_margin_ppm, and reduce to
    ``(n_glyphs, min_margin_ppm | None, sum_margin_ppm)``.

    Margins are aggregated per glyph INSTANCE (a repeated shape counts
    each occurrence), but the NN forward runs once per DISTINCT matrix
    in the batch — same dedup-and-batch shape as ocr_pages_to_text,
    kept separate so the exact-match text path stays untouched.  Pages
    with zero glyphs return (0, None, 0)."""
    # same shared walk, with a throwaway cache (this path memoizes
    # nothing across calls by design) and pre-binarized input; spaces
    # (None slots) are dropped and lines flattened per page
    nested, novel, _keys = _dedup_layouts(
        bw_pages, OrderedDict(), binarize_input=False
    )
    layouts = [
        [s for line in layout for s in line if s is not None]
        for layout in nested
    ]
    if novel:
        _, ppm = classify_margin_ppm(np.stack(novel), weights)
    else:
        ppm = np.empty(0, dtype=np.int64)
    out = []
    for slots in layouts:
        if not slots:
            out.append((0, None, 0))
            continue
        vals = ppm[slots]
        out.append((len(slots), int(vals.min()), int(vals.sum())))
    return out


def _cls_margin_cache(weights: OcrWeights) -> OrderedDict:
    cache = getattr(weights, "_cls_margin_cache", None)
    if cache is None:
        cache = OrderedDict()
        object.__setattr__(weights, "_cls_margin_cache", cache)
    return cache


def ocr_pages_to_text_margins(pages, weights: OcrWeights):
    """Fused single-pass OCR + confidence: returns
    ``(texts, [(n_glyphs, min_margin_ppm | None, sum_margin_ppm)])``
    with texts IDENTICAL to ocr_pages_to_text (same segmentation, same
    argmax — classify_margin_ppm shares the forward).

    This is the production margin path: the separate
    page_margin_stats pass re-runs decode+segment+forward, which at
    10^12 blobs doubles the NN cost; here margins ride the extraction
    forward for free.  Separate memo cache (values are (char, ppm)
    pairs) so the exact-match text path's cache shape is untouched."""
    cache = _cls_margin_cache(weights)
    layouts, novel, novel_keys = _dedup_layouts(pages, cache)

    if novel:
        chars, ppms = classify_margin_ppm(np.stack(novel), weights)
        for key, ch, ppm in zip(novel_keys, chars, ppms):
            cache[key] = (str(ch), int(ppm))
        while len(cache) > _CLS_CACHE_MAX:
            cache.popitem(last=False)
        resolved = [(str(c), int(p)) for c, p in zip(chars, ppms)]
    else:
        resolved = []

    texts, stats = [], []
    for layout in layouts:
        text_lines = []
        ppm_vals = []
        for slots in layout:
            chs = []
            for s in slots:
                if s is None:
                    chs.append(" ")
                    continue
                ch, ppm = s if isinstance(s, tuple) else resolved[s]
                chs.append(ch)
                ppm_vals.append(ppm)
            text_lines.append("".join(chs))
        texts.append("\n".join(text_lines))
        if ppm_vals:
            stats.append((len(ppm_vals), min(ppm_vals), sum(ppm_vals)))
        else:
            stats.append((0, None, 0))
    return texts, stats
