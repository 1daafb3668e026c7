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

from typing import Iterable, List

import numpy as np

from .bmp import decode_bmp
from .image_ops import binarize, segment_page
from .nn import OcrWeights, classify


def extract_text(rgb: np.ndarray, weights: OcrWeights) -> str:
    """OCR one page image ((h, w, 3) uint8 RGB) into its text string."""
    return ocr_pages_to_text([rgb], weights)[0]


def extract_text_from_bmp(data: bytes, weights: OcrWeights) -> str:
    return ocr_pages_to_text([decode_bmp(data)], weights)[0]


def ocr_pages_to_text(pages: Iterable[np.ndarray], weights: OcrWeights) -> List[str]:
    """Batched OCR: segmentation per page, classification batched across
    every glyph of every page in the batch (one conv + two matmuls total).

    Per-page segmentation is cheap vectorized NumPy; batching the NN
    across pages is what keeps the Python-side work per glyph ~zero.
    """
    layouts = []  # per page: list of lines, each list of slot indices or None
    glyphs: List[np.ndarray] = []
    for rgb in pages:
        bw = binarize(rgb)
        lines = segment_page(bw)
        layout = []
        for line in lines:
            slots = []
            for mat in line:
                if mat is None:
                    slots.append(None)
                else:
                    slots.append(len(glyphs))
                    glyphs.append(mat)
            layout.append(slots)
        layouts.append(layout)

    if glyphs:
        chars = classify(np.stack(glyphs).astype(np.float64), weights)
    else:
        chars = np.empty(0, dtype="<U1")

    out = []
    for layout in layouts:
        text_lines = [
            "".join(" " if s is None else str(chars[s]) for s in slots)
            for slots in layout
        ]
        out.append("\n".join(text_lines))
    return out
