"""Fixture-weight quality gates (T4-T7): the committed weights must
classify perfectly with margin beyond the renderer's noise regime, and
the CNN must actually be trained (T5), not He-init."""

import os

import numpy as np
import pytest

from ocr_gang_spark.atlas import NOISE_RATE, class_matrices, noisy_class_matrices
from ocr_gang_spark.kernels.nn import CLASS_CHARS, classify, load_weights

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def weights():
    return load_weights(
        os.path.join(ROOT, "fixtures", "ocrwb.txt"),
        os.path.join(ROOT, "fixtures", "cnnwb.txt"),
    )


def test_cnn_was_trained(weights):
    """T5: the committed CNN carries real Adam state (the round-1
    fixture kept seeded He-init filters with t=0)."""
    assert weights.cnn_adam["t"] > 0
    assert np.any(weights.cnn_adam["m_f"] != 0.0)


def test_margin_beyond_renderer_noise(weights):
    """Robustness gate: 100% classification at flip-noise rates up to
    0.16 — the renderer runs at 0.06, so recognition holds with >2x
    margin (VERDICT r1 item 6 'demonstrable margin gain')."""
    assert NOISE_RATE == 0.06
    x, y = noisy_class_matrices(8, seed=999, rate_lo=0.02, rate_hi=0.16)
    assert float(np.mean(classify(x, weights) == CLASS_CHARS[y])) == 1.0


def test_canonical_classes_exact(weights):
    assert "".join(classify(class_matrices(), weights)) == "".join(CLASS_CHARS)
