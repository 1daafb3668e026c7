"""OCR confidence routing: per-glyph softmax top1-top2 margins
(kernels/nn.classify_margin_ppm), per-page aggregates
(kernels/ocr.page_margin_stats), and the inject-then-detect driver
query (extraction_queries.ocr_confidence_stats)."""

import numpy as np
import pytest

from ocr_gang_spark.atlas import page_for_ref
from ocr_gang_spark.extraction_queries import OCR_REVIEW_PPM, ocr_confidence_stats
from ocr_gang_spark.kernels.image_ops import binarize, segment_page
from ocr_gang_spark.kernels.nn import (
    classify,
    classify_margin_ppm,
    load_weights,
    mlp_forward,
    softmax,
    cnn_forward_binary,
    conv_lut_for,
)
from ocr_gang_spark.kernels.ocr import (
    ocr_pages_to_text,
    ocr_pages_to_text_margins,
    page_margin_stats,
)
from ocr_gang_spark.synth import (
    OCR_NOISE_EVERY,
    inject_scan_noise,
    inject_scan_noise_rgb,
)


@pytest.fixture(scope="module")
def weights():
    return load_weights("fixtures/ocrwb.txt", "fixtures/cnnwb.txt")


@pytest.fixture(scope="module")
def glyphs(weights):
    _, page = page_for_ref("m42-doc-00000007-1")
    bw = binarize(page)
    mats = [m for line in segment_page(bw) for m in line if m is not None]
    assert mats
    return np.stack(mats)


def test_chars_match_classify(glyphs, weights):
    chars, ppm = classify_margin_ppm(glyphs, weights)
    assert np.array_equal(chars, classify(glyphs, weights))
    assert ppm.dtype == np.int64
    assert ((ppm >= 0) & (ppm <= 1_000_000)).all()


def test_margin_matches_direct_softmax(glyphs, weights):
    _, ppm = classify_margin_ppm(glyphs, weights)
    logits = mlp_forward(cnn_forward_binary(glyphs, conv_lut_for(weights)), weights)
    for i in range(len(glyphs)):
        p = sorted(softmax(logits[i]))
        assert ppm[i] == int(np.floor((p[-1] - p[-2]) * 1e6))


def test_page_stats_aggregate_per_instance(glyphs, weights):
    # a page-of-batches view: duplicate page must double the sum, keep min
    (n1, mn1, sm1), (n2, mn2, sm2) = page_margin_stats(
        [binarize(page_for_ref("m42-doc-00000007-1")[1])] * 2, weights
    )
    assert (n1, mn1, sm1) == (n2, mn2, sm2)
    _, ppm = classify_margin_ppm(glyphs, weights)
    # page glyph multiset == segmented glyph multiset
    assert n1 == len(glyphs)
    assert sm1 == int(ppm.sum()) and mn1 == int(ppm.min())


def test_empty_page(weights):
    blank = np.full((40, 60), 255, dtype=np.uint8)
    assert page_margin_stats([blank], weights) == [(0, None, 0)]


def test_noise_injection_is_deterministic():
    bw = binarize(page_for_ref("m42-doc-00000005-1")[1])
    a = inject_scan_noise("m42-doc-00000005-1", bw)
    b = inject_scan_noise("m42-doc-00000005-1", bw)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, bw)


def test_rgb_noise_commutes_with_binarize():
    # the single-pass extraction path degrades in RGB before binarize;
    # the two-pass router degrades the binarized page — same mask, same
    # result, so both gates see the identical degraded input
    for ref in ["m42-doc-00000005-1", "m42-doc-00000010-0"]:
        _, rgb = page_for_ref(ref)
        via_rgb = binarize(inject_scan_noise_rgb(ref, rgb))
        via_bw = inject_scan_noise(ref, binarize(rgb))
        assert np.array_equal(via_rgb, via_bw)


def test_margins_path_text_identical_and_stats_match(weights):
    # fused single-pass path: texts byte-identical to the exact-match
    # path, stats equal to the separate page_margin_stats pass
    refs = [
        "m42-doc-00000005-1",  # degraded slice member
        "m42-doc-00000007-1",
        "m42-doc-00000012-0",
    ]
    pages = []
    for ref in refs:
        _, rgb = page_for_ref(ref)
        if int(ref.split("-")[2]) % OCR_NOISE_EVERY == 0:
            rgb = inject_scan_noise_rgb(ref, rgb)
        pages.append(rgb)
    pages.append(np.full((40, 60, 3), 255, dtype=np.uint8))  # empty page
    texts, stats = ocr_pages_to_text_margins(pages, weights)
    assert texts == ocr_pages_to_text(pages, weights)
    assert stats == page_margin_stats([binarize(p) for p in pages], weights)
    assert stats[-1] == (0, None, 0)


def test_router_flags_degraded_slice(spark):
    rows = ocr_confidence_stats(spark, "/root/testdata/sf0.001").collect()
    clean = [r for r in rows if not r.degraded]
    degraded = [r for r in rows if r.degraded]
    assert clean and degraded
    # degraded flag is exactly the injected slice
    for r in rows:
        assert r.degraded == (int(r.media_ref.split("-")[2]) % OCR_NOISE_EVERY == 0)
    # zero false positives; high recall on the injected degradation
    assert all(r.decision == "accept" for r in clean)
    flagged = sum(1 for r in degraded if r.decision == "review")
    assert flagged >= 0.9 * len(degraded)
    # decision is the documented threshold rule
    for r in rows:
        want = (
            "review"
            if r.min_margin_ppm is not None and r.min_margin_ppm < OCR_REVIEW_PPM
            else "accept"
        )
        assert r.decision == want
