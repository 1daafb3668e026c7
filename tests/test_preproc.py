"""Micro-tests for the task-named preprocessing kernels (Otsu, Hough
deskew, connected components) — hand-enumerable cases plus brute-force
cross-checks, the same pinning discipline as tests/test_image_ops.py.
"""

import numpy as np
import pytest

from ocr_gang_spark.atlas import page_for_ref
from ocr_gang_spark.kernels.image_ops import binarize
from ocr_gang_spark.kernels.preproc import (
    binarize_otsu,
    component_stats,
    deskew,
    gray_intdiv,
    hough_skew_deg,
    label_components,
    otsu_threshold,
    rotate_nn,
)


def brute_otsu(gray: np.ndarray) -> int:
    """Textbook O(256 * n) Otsu: maximize w0*w1*(mu0-mu1)^2, first max."""
    vals = gray.ravel().astype(np.float64)
    n = vals.size
    best_t, best_s = 0, -1.0
    for t in range(256):
        c0 = vals[vals <= t]
        c1 = vals[vals > t]
        if c0.size == 0 or c1.size == 0:
            continue
        s = (c0.size / n) * (c1.size / n) * (c0.mean() - c1.mean()) ** 2
        if s > best_s + 1e-12:
            best_s, best_t = s, t
    return best_t


def brute_components(ink: np.ndarray) -> int:
    """Flood-fill 8-connectivity component count."""
    ink = ink.copy()
    h, w = ink.shape
    n = 0
    for y in range(h):
        for x in range(w):
            if ink[y, x]:
                n += 1
                stack = [(y, x)]
                ink[y, x] = False
                while stack:
                    cy, cx = stack.pop()
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            ny, nx = cy + dy, cx + dx
                            if 0 <= ny < h and 0 <= nx < w and ink[ny, nx]:
                                ink[ny, nx] = False
                                stack.append((ny, nx))
    return n


class TestOtsu:
    def test_two_level_image_smallest_tie(self):
        # every t in [50, 199] yields the same partition; first max wins
        g = np.array([[50] * 3 + [200] * 5], dtype=np.uint8)
        assert otsu_threshold(g) == 50

    def test_hand_case_2x2(self):
        assert otsu_threshold(np.array([[0, 0], [255, 255]], np.uint8)) == 0

    def test_uniform_image(self):
        assert otsu_threshold(np.full((4, 4), 7, np.uint8)) == 0

    def test_empty(self):
        assert otsu_threshold(np.zeros((0, 0), np.uint8)) == 0

    @pytest.mark.parametrize("seed", range(8))
    def test_matches_brute_force(self, seed):
        rng = np.random.default_rng(seed)
        # tri-modal-ish random small images
        g = rng.choice([12, 13, 90, 91, 200, 240], size=(9, 11),
                       p=[0.2, 0.1, 0.25, 0.15, 0.2, 0.1]).astype(np.uint8)
        assert otsu_threshold(g) == brute_otsu(g)

    def test_otsu_equals_fixed_on_bimodal_pages(self):
        # rendered pages are two-level with ink < 180 <= bg, so the Otsu
        # binarization must equal the reference's fixed-180 binarization
        for ref in ["m42-doc-00000001-1", "m42-doc-00000013-1"]:
            _, page = page_for_ref(ref)
            bw_otsu, t = binarize_otsu(page)
            assert np.array_equal(bw_otsu, binarize(page))
            assert 0 < t < 180

    def test_gray_intdiv_truncates(self):
        rgb = np.array([[[1, 1, 2]]], np.uint8)  # (1+1+2)/3 = 1 in C
        assert gray_intdiv(rgb)[0, 0] == 1


class TestRotate:
    def test_zero_is_identity(self):
        _, page = page_for_ref("m42-doc-00000002-1")
        assert np.array_equal(rotate_nn(page[:, :, 0], 0.0), page[:, :, 0])

    def test_quarter_turn_square(self):
        img = np.full((5, 5), 255, np.uint8)
        img[0, 0] = 0  # corner ink
        out = rotate_nn(img, 90.0, fill=255)
        # center (2,2); (0,0) is (dy,dx)=(-2,-2); output pixel reading
        # src (0,0) satisfies dy*c+dx*s=-2, -dy*s+dx*c=-2 with c=0,s=1:
        # dx=-2, dy=2 -> output (4, 0)
        assert out[4, 0] == 0 and (out == 0).sum() == 1

    def test_round_trip_mostly_identity(self):
        _, page = page_for_ref("m42-doc-00000013-1")
        bw = binarize(page)
        back = rotate_nn(rotate_nn(bw, 3.0), -3.0)
        agree = (back == bw).mean()
        assert agree > 0.97  # NN resampling loses only edge pixels

    def test_fill_value(self):
        img = np.zeros((4, 4), np.uint8)
        out = rotate_nn(img, 45.0, fill=77)
        assert (out == 77).any()


class TestHoughDeskew:
    def test_straight_page_zero(self):
        _, page = page_for_ref("m42-doc-00000013-1")
        assert hough_skew_deg(binarize(page)) == 0.0

    @pytest.mark.parametrize("applied", [2.0, -3.5, 5.25, -6.0])
    def test_detects_applied_rotation(self, applied):
        _, page = page_for_ref("m42-doc-00000013-1")
        rot = rotate_nn(binarize(page), applied, fill=255)
        detected = hough_skew_deg(rot)
        assert detected == pytest.approx(applied, abs=0.25 + 1e-9)

    def test_deskew_restores_row_profile(self):
        _, page = page_for_ref("m42-doc-00000013-1")
        bw = binarize(page)
        rot = rotate_nn(bw, 4.0, fill=255)
        fixed, detected = deskew(rot)
        assert detected == pytest.approx(4.0, abs=0.25 + 1e-9)
        # deskewed page regains clear separator rows; the rotated page
        # has none (every row touches some ink at 4 degrees)
        def n_sep(a):
            return int((~(a == 0).any(axis=1)).sum())
        assert n_sep(rot) == 0
        # measured: 11 of the original 14 come back (NN-resample edge
        # loss + the residual 0.25-degree quantization cost the rest)
        assert n_sep(fixed) >= 0.7 * n_sep(bw)

    def test_empty_page(self):
        assert hough_skew_deg(np.full((10, 10), 255, np.uint8)) == 0.0

    def test_straight_corpus_sample_all_zero(self):
        # pipeline.deskew_page's no-op-on-straight-pages guarantee rests
        # on the estimate being exactly 0.0 (the smallest-|angle|
        # tie-break): pin it across a corpus sample so a scoring change
        # that starts rotating straight pages fails loudly (ADVICE r2)
        nonzero = []
        for i in range(50):
            _, page = page_for_ref(f"m42-doc-{i:08d}-1")
            s = hough_skew_deg(binarize(page))
            if s != 0.0:
                nonzero.append((i, s))
        assert not nonzero, f"straight pages estimated skewed: {nonzero}"


class TestComponents:
    def test_single_pixel(self):
        img = np.full((3, 3), 255, np.uint8)
        img[1, 1] = 0
        labels, n = label_components(img)
        assert n == 1 and labels[1, 1] == 1 and labels.sum() == 1

    def test_diagonal_is_connected(self):
        img = np.full((4, 4), 255, np.uint8)
        img[0, 0] = img[1, 1] = 0
        assert label_components(img)[1] == 1

    def test_gap_splits(self):
        img = np.full((4, 4), 255, np.uint8)
        img[0, 0] = img[2, 2] = 0
        assert label_components(img)[1] == 2

    def test_u_shape_merges_late(self):
        # two vertical arms joined at the bottom — exercises union-find
        img = np.full((4, 5), 255, np.uint8)
        img[0:4, 0] = 0
        img[0:4, 4] = 0
        img[3, 1:4] = 0
        labels, n = label_components(img)
        assert n == 1

    def test_labels_top_left_order(self):
        img = np.full((3, 6), 255, np.uint8)
        img[0, 4] = 0  # first in scan order
        img[2, 0] = 0
        labels, n = label_components(img)
        assert n == 2 and labels[0, 4] == 1 and labels[2, 0] == 2

    def test_all_ink(self):
        labels, n = label_components(np.zeros((3, 3), np.uint8))
        assert n == 1 and (labels == 1).all()

    def test_empty(self):
        labels, n = label_components(np.full((3, 3), 255, np.uint8))
        assert n == 0 and labels.sum() == 0

    @pytest.mark.parametrize("seed", range(12))
    def test_matches_flood_fill(self, seed):
        rng = np.random.default_rng(seed)
        ink = rng.random((16, 16)) < 0.35
        img = np.where(ink, np.uint8(0), np.uint8(255))
        assert label_components(img)[1] == brute_components(ink)

    def test_stats_hand_case(self):
        img = np.full((5, 5), 255, np.uint8)
        img[0, 0] = img[1, 1] = 0  # comp 1: bbox rows [0,2) cols [0,2)
        img[3, 3] = 0              # comp 2
        assert component_stats(img) == [
            (1, 0, 2, 0, 2, 2),
            (2, 3, 4, 3, 4, 1),
        ]

    def test_page_components_reasonable(self):
        # a rendered page's component count is bounded below by its
        # glyph count per line profile and above by total ink runs
        _, page = page_for_ref("m42-doc-00000002-1")
        bw = binarize(page)
        _, n = label_components(bw)
        assert n >= 1
        stats = component_stats(bw)
        assert sum(s[5] for s in stats) == int((bw == 0).sum())


class TestDeskewOcrIntegration:
    """Deskew composes with the extraction kernels at scan resolution.

    The corpus pages render glyphs 7-9 px tall — at that size a single
    NN-resample pixel error flips classifications, so the demonstration
    upscales to 6x (scan-like stroke widths), pads the canvas (so page
    corners cannot rotate out of frame), injects a known skew, deskews,
    block-reduces back, and OCRs.  Every character comes back exact;
    lines are compared modulo trailing spaces because padding widens
    each line bloc past the reference's trailing-gap space rule
    (segmentation.c:213-259 — the C binary on a padded page emits the
    same trailing spaces)."""

    K = 6

    # NB: pinned docs are SELECTED — block-vote rotation artifacts sit at
    # the nets' robustness boundary (either weight provenance reads
    # ~70-80% of roundtripped pages exactly; the rest degrade a glyph or
    # two), so these five regression-pin known-good pages for the
    # committed per-sample weights rather than claim universal
    # roundtrip robustness.  Re-select from the printed good set in
    # scripts/make_fixtures.py lore if the weights are ever retrained.
    @pytest.mark.parametrize("doc", [2, 7, 13, 17, 33])
    @pytest.mark.parametrize("deg", [1.5, -2.25, 3.0])
    def test_rotate_deskew_ocr_exact(self, doc, deg):
        from ocr_gang_spark.kernels.nn import load_weights
        from ocr_gang_spark.kernels.ocr import extract_text

        import os
        root = os.path.join(os.path.dirname(__file__), "..")
        w = load_weights(
            os.path.join(root, "fixtures", "ocrwb.txt"),
            os.path.join(root, "fixtures", "cnnwb.txt"),
        )
        K = self.K
        expected, page = page_for_ref(f"m42-doc-{doc:08d}-1")
        up = np.kron(binarize(page), np.ones((K, K), dtype=np.uint8))
        margin = int(0.1 * max(up.shape)) + K
        up = np.pad(up, margin, constant_values=255)

        rot = rotate_nn(up, deg, fill=255)
        fixed, detected = deskew(rot, max_deg=4.0)
        assert detected == pytest.approx(deg, abs=0.25 + 1e-9)

        h, wd = fixed.shape
        h2, w2 = h - h % K, wd - wd % K
        blocks = fixed[:h2, :w2].reshape(h2 // K, K, w2 // K, K)
        coarse = np.where(
            (blocks == 0).mean(axis=(1, 3)) >= 0.5, np.uint8(0), np.uint8(255)
        )
        got = extract_text(np.repeat(coarse[:, :, None], 3, axis=2), w)
        assert [l.rstrip() for l in got.split("\n")] == [
            l.rstrip() for l in expected.split("\n")
        ]


class TestPipelineDeskewFlag:
    def test_noop_on_straight_page(self):
        # the flag cannot perturb the exact-match path: a straight page
        # short-circuits (skew 0.0) and the INPUT object comes back
        from ocr_gang_spark.pipeline import deskew_page

        _, page = page_for_ref("m42-doc-00000013-1")
        assert deskew_page(page) is page

    def test_rewrites_skewed_page(self):
        from ocr_gang_spark.pipeline import deskew_page

        _, page = page_for_ref("m42-doc-00000013-1")
        bw = binarize(page)
        rot3 = np.repeat(rotate_nn(bw, 3.0, fill=255)[:, :, None], 3, axis=2)
        out = deskew_page(rot3)
        assert out is not rot3
        # deskewed page regains separator rows the skewed page lost
        n_sep = lambda a: int((~(a[:, :, 0] == 0).any(axis=1)).sum())
        assert n_sep(out) > n_sep(rot3)
        # output is binarize-idempotent ({0,255} in all channels)
        assert set(np.unique(out)) <= {0, 255}


class TestDeskewAccuracyFloor:
    """Corpus-level detection quality, pinned from the committed
    fixture: misses concentrate in single-short-line pages where the
    applied rotation moves line ends by under a pixel."""

    def test_detection_accuracy_by_size(self):
        import os

        import pyarrow.parquet as pq

        path = os.path.join(
            os.path.dirname(__file__), "..", "fixtures", "expected_preproc.parquet"
        )
        t = pq.read_table(path).to_pandas()
        t = t[t.corpus_key == t.corpus_key.iloc[0]]
        ok = (t.detected_deg - t.applied_deg).abs() <= 0.25 + 1e-9
        assert ok.mean() >= 0.88, f"overall {ok.mean():.3f}"
        big = t.ink_fixed >= t.ink_fixed.quantile(0.75)
        assert ok[big].mean() >= 0.97, f"top quartile {ok[big].mean():.3f}"
