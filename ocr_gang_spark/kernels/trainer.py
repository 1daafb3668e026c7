"""Seeded offline trainer — produces the committed weight fixtures.

The reference ships its weight files empty and trains with
``srand(time)`` (reference Makefile:20-23, main.c:161), so reproducible
weights are ours to pin (SURVEY.md §7.0).  Strategy, mirroring the
reference's load-or-init split (``PerformOCR`` keeps a freshly
He-initialized CNN when no weight file loads, ocr.c:120-123):

* CNN filters: fixed seeded He-uniform init ``U(+-sqrt(6/9))``
  (``cnn_reset`` cnn.c:9-17, ``init_weight_he`` tools.c:201-207) —
  random conv features, never trained.
* MLP: trained with full-batch Adam (beta1=.9, beta2=.999, eps=1e-8 —
  reference common.h:13-15) + softmax cross-entropy on the 52 canonical
  atlas matrices PLUS flip-noise augmented instances (the reference's
  own augmentation strategy, augmentation.c:100-106; the renderer's
  noise rate 0.06 sits inside the trained range 0.02-0.12), until both
  the train set and a held-out noisy validation set classify 100%.

Training is an offline fixture-generating step (scripts/make_fixtures.py),
not part of the Spark pipeline — per-sample SGD is inherently serial
(SURVEY.md §2.5 T4).
"""

from __future__ import annotations

import numpy as np

from ..atlas import class_matrices, noisy_class_matrices
from .nn import (
    FLATTEN_SIZE,
    HIDDEN,
    NUM_FILTERS,
    CONV_SIZE,
    OUTPUTS,
    OcrWeights,
    cnn_forward,
    softmax,
)

TRAIN_SEED = 1337


def _he_uniform(rng: np.random.Generator, fan_in: int, shape) -> np.ndarray:
    limit = np.sqrt(6.0 / fan_in)
    return rng.uniform(-limit, limit, size=shape)


def train_fixture_weights(
    seed: int = TRAIN_SEED,
    lr: float = 0.005,
    max_iters: int = 4000,
    target_loss: float = 0.02,
    n_aug: int = 48,
) -> OcrWeights:
    rng = np.random.default_rng(seed)

    filters = _he_uniform(rng, CONV_SIZE * CONV_SIZE, (NUM_FILTERS, CONV_SIZE, CONV_SIZE))
    conv_biases = np.zeros(NUM_FILTERS)

    aug_x, aug_y = noisy_class_matrices(n_aug, seed=seed + 1)
    mats = np.concatenate([class_matrices(), aug_x])
    y = np.concatenate([np.arange(OUTPUTS), aug_y])
    x = cnn_forward(mats, filters, conv_biases)  # (N, 1352)

    val_x, val_y = noisy_class_matrices(16, seed=seed + 2)
    xv = cnn_forward(val_x, filters, conv_biases)

    w1 = _he_uniform(rng, FLATTEN_SIZE, (FLATTEN_SIZE, HIDDEN))
    b1 = np.zeros(HIDDEN)
    w2 = _he_uniform(rng, HIDDEN, (HIDDEN, OUTPUTS))
    b2 = np.zeros(OUTPUTS)

    params = [w1, b1, w2, b2]
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    b1t = b2t = 1.0
    t = 0
    n = x.shape[0]
    onehot = np.eye(OUTPUTS)[y]

    for _ in range(max_iters):
        pre = x @ w1 + b1
        hid = np.where(pre > 0, pre, 0.01 * pre)
        logits = hid @ w2 + b2
        probs = softmax(logits)
        loss = -np.mean(np.log(probs[np.arange(n), y] + 1e-12))
        acc = float(np.mean(np.argmax(logits, axis=1) == y))
        if acc == 1.0 and loss < target_loss:
            hv = xv @ w1 + b1
            hv = np.where(hv > 0, hv, 0.01 * hv)
            val_acc = float(np.mean(np.argmax(hv @ w2 + b2, axis=1) == val_y))
            if val_acc == 1.0:
                break

        dlogits = (probs - onehot) / n  # combined softmax+CE grad (network.c:284-285)
        dw2 = hid.T @ dlogits
        db2 = dlogits.sum(axis=0)
        dhid = dlogits @ w2.T
        dpre = dhid * np.where(pre > 0, 1.0, 0.01)  # leaky slope (tools.c:154-163)
        dw1 = x.T @ dpre
        db1 = dpre.sum(axis=0)
        grads = [dw1, db1, dw2, db2]

        t += 1
        b1t *= beta1
        b2t *= beta2
        for p, g, mi, vi in zip(params, grads, m, v):
            mi *= beta1
            mi += (1 - beta1) * g
            vi *= beta2
            vi += (1 - beta2) * g * g
            m_hat = mi / (1 - b1t)
            v_hat = vi / (1 - b2t)
            p -= lr * m_hat / (np.sqrt(v_hat) + eps)
    else:
        raise RuntimeError(f"trainer did not converge: acc={acc} loss={loss}")

    return OcrWeights(
        filters=filters,
        conv_biases=conv_biases,
        hidden_w=w1,
        hidden_b=b1,
        output_w=w2,
        output_b=b2,
        mlp_adam={
            "t": t, "b1t": b1t, "b2t": b2t,
            "m_hb": m[1], "v_hb": v[1],
            "m_hw": m[0].ravel(), "v_hw": v[0].ravel(),
            "m_ob": m[3], "v_ob": v[3],
            "m_ow": m[2].ravel(), "v_ow": v[2].ravel(),
        },
        cnn_adam={"t": 0, "b1t": 1.0, "b2t": 1.0},
    )
