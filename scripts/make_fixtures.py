#!/usr/bin/env python
"""Regenerate the committed weight fixtures (deterministic, seeded).

Writes fixtures/ocrwb.txt + fixtures/cnnwb.txt in the reference ASCII
format (reference tools.c:252-282 / 604-630).  Run once; both the NumPy
oracle and the Spark pipeline load these (broadcast) so span equality
reduces to identical float64 math.

Provenance is the REFERENCE-granularity per-sample CNN+MLP joint loop
(training.c:148-280 — one Adam step per sample, dropout, skip-row
moment freezing; ~10 min).  Gates before accepting: ASCII round-trip
byte-exact, all 52 clean classes classify exactly, and 100% accuracy on
flip-noise up to rate 0.16 (the renderer runs at 0.06 — >2x margin).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from ocr_gang_spark.atlas import class_matrices, noisy_class_matrices  # noqa: E402
from ocr_gang_spark.kernels.nn import (  # noqa: E402
    CLASS_CHARS,
    classify,
    load_weights,
    save_weights,
)
from ocr_gang_spark.kernels.trainer import (  # noqa: E402
    train_fixture_weights_per_sample,
)

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
MLP = os.path.join(ROOT, "fixtures", "ocrwb.txt")
CNN = os.path.join(ROOT, "fixtures", "cnnwb.txt")

if __name__ == "__main__":
    w = train_fixture_weights_per_sample(verbose=True)
    save_weights(w, MLP, CNN)
    back = load_weights(MLP, CNN)

    assert np.array_equal(w.hidden_w, back.hidden_w)
    assert np.array_equal(w.filters, back.filters)
    # acceptance gates: all 52 clean classes exact + noise-0.16 margin
    out = classify(class_matrices(), back)
    assert "".join(out) == "".join(CLASS_CHARS), "clean-class gate failed"
    x, y = noisy_class_matrices(8, seed=999, rate_lo=0.02, rate_hi=0.16)
    got = classify(x, back)
    acc = float(np.mean([CLASS_CHARS[int(l)] == g for l, g in zip(y, got)]))
    assert acc == 1.0, f"noise gate failed: {acc}"
    print(f"wrote {MLP} ({os.path.getsize(MLP)} bytes)")
    print(f"wrote {CNN} ({os.path.getsize(CNN)} bytes)")
