"""Pin the batched NN kernels against naive per-element loops that
transcribe the reference C inference math directly."""

import numpy as np

from ocr_gang_spark.kernels.nn import (
    CLASS_CHARS,
    FLATTEN_SIZE,
    OcrWeights,
    classify,
    cnn_forward,
    load_weights,
    mlp_forward,
    save_weights,
    softmax,
)


def naive_cnn_forward_infer(image, filters, biases):
    """Direct transcription of cnn_forward_infer (reference cnn.c:118-141)."""
    out = np.zeros(FLATTEN_SIZE)
    idx = 0
    for f in range(8):
        for y in range(13):
            sy = y * 2
            for x in range(13):
                sx = x * 2
                best = -np.inf
                for dy in range(2):
                    for dx in range(2):
                        s = biases[f]
                        for i in range(3):
                            for j in range(3):
                                s += image[sy + dy + i, sx + dx + j] * filters[f, i, j]
                        best = max(best, max(s, 0.0))
                out[idx] = best
                idx += 1
    return out


def rand_weights(rng):
    return OcrWeights(
        filters=rng.normal(size=(8, 3, 3)),
        conv_biases=rng.normal(size=8),
        hidden_w=rng.normal(size=(1352, 64)) * 0.1,
        hidden_b=rng.normal(size=64),
        output_w=rng.normal(size=(64, 52)) * 0.1,
        output_b=rng.normal(size=52),
    )


def test_cnn_forward_matches_naive():
    rng = np.random.default_rng(3)
    imgs = (rng.random((3, 28, 28)) < 0.5).astype(np.float64)
    filters = rng.normal(size=(8, 3, 3))
    biases = rng.normal(size=8)
    got = cnn_forward(imgs, filters, biases)
    for b in range(3):
        expected = naive_cnn_forward_infer(imgs[b], filters, biases)
        np.testing.assert_allclose(got[b], expected, rtol=1e-12, atol=1e-12)


def test_mlp_forward_leaky_relu():
    """Hidden layer uses *leaky* ReLU slope 0.01 (tools.c:154-158) while
    the conv layer uses hard ReLU (cnn.c:62) — hand case separating them."""
    w = OcrWeights(
        filters=np.zeros((8, 3, 3)),
        conv_biases=np.zeros(8),
        hidden_w=np.zeros((1352, 64)),
        hidden_b=np.full(64, -2.0),
        output_w=np.eye(64, 52),
        output_b=np.zeros(52),
    )
    logits = mlp_forward(np.zeros((1, 1352)), w)
    # hidden pre-activation -2 -> leaky -> -0.02 routed through identity
    np.testing.assert_allclose(logits[0, :52], np.full(52, -0.02)[:52])


def test_softmax_max_subtracted():
    x = np.array([[1000.0, 1001.0, 999.0]])
    p = softmax(x)
    assert np.isfinite(p).all()
    np.testing.assert_allclose(p.sum(), 1.0)
    e = np.exp(np.array([-1.0, 0.0, -2.0]))
    np.testing.assert_allclose(p[0], e / e.sum())


def test_classify_tie_breaks_first_index():
    """IndexAnswer keeps the first maximum (strict >, tools.c:343-355)."""
    w = OcrWeights(
        filters=np.zeros((8, 3, 3)),
        conv_biases=np.zeros(8),
        hidden_w=np.zeros((1352, 64)),
        hidden_b=np.zeros(64),
        output_w=np.zeros((64, 52)),
        output_b=np.zeros(52),  # all logits equal -> argmax 0 -> 'A'
    )
    out = classify(np.zeros((2, 28, 28)), w)
    assert list(out) == ["A", "A"]


def test_retrieve_char_mapping():
    assert CLASS_CHARS[0] == "A" and CLASS_CHARS[25] == "Z"
    assert CLASS_CHARS[26] == "a" and CLASS_CHARS[51] == "z"


def test_weight_file_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    w = rand_weights(rng)
    w.mlp_adam = {"t": 7, "b1t": 0.9**7, "b2t": 0.999**7}
    mlp, cnn = str(tmp_path / "ocrwb.txt"), str(tmp_path / "cnnwb.txt")
    save_weights(w, mlp, cnn)
    back = load_weights(mlp, cnn)
    for attr in ("filters", "conv_biases", "hidden_w", "hidden_b", "output_w", "output_b"):
        np.testing.assert_array_equal(getattr(w, attr), getattr(back, attr))
    assert back.mlp_adam["t"] == 7

    # header validation: wrong dims must be rejected (load_network tools.c:290-305)
    bad = (tmp_path / "bad.txt")
    bad.write_text("OCRNET 2 100 64 52\n0 1 1\n")
    try:
        load_weights(str(bad), cnn)
        assert False, "should reject incompatible dims"
    except ValueError:
        pass


def test_lut_conv_bit_identical_to_dense():
    """The binary-input LUT conv must equal the dense float64 conv to
    the last bit (same accumulation order, +0.0 terms are IEEE no-ops)."""
    from ocr_gang_spark.kernels.nn import cnn_forward_binary, _conv_lut

    rng = np.random.default_rng(21)
    filters = rng.normal(size=(8, 3, 3))
    biases = rng.normal(size=8)
    imgs = (rng.random((40, 28, 28)) < 0.4).astype(np.float64)
    dense = cnn_forward(imgs, filters, biases)
    lut = _conv_lut(filters, biases)
    fast = cnn_forward_binary(imgs, lut)
    assert np.array_equal(dense, fast)


# ---------------------------------------------------------------------------
# T9/M5 — the XOR demo (sigmoid output path)
# ---------------------------------------------------------------------------


def test_xor_demo_converges():
    """Reference main.c:23-157: 2-4-1 leaky-hidden sigmoid-output net,
    per-sample Adam, epoch shuffle.  1500 epochs suffice with Adam (the
    reference runs 10000); outputs must round to XOR."""
    from ocr_gang_spark.kernels.xor import XOR_TARGETS, train_xor

    net = train_xor(seed=7, epochs=1500)
    preds = net.predict()
    assert ([round(p) for p in preds] == XOR_TARGETS).all()
    assert all(abs(p - t) < 0.1 for p, t in zip(preds, XOR_TARGETS))


def test_sigmoid_matches_reference_form():
    import numpy as np

    from ocr_gang_spark.kernels.xor import sigmoid

    xs = np.array([-5.0, -1.0, 0.0, 1.0, 5.0])
    assert np.allclose(sigmoid(xs), 1.0 / (1.0 + np.exp(-xs)))
    assert sigmoid(np.array([0.0]))[0] == 0.5
