#!/usr/bin/env python
"""Regenerate the committed weight fixtures (deterministic, seeded).

Writes fixtures/ocrwb.txt + fixtures/cnnwb.txt in the reference ASCII
format (reference tools.c:252-282 / 604-630).  Run once; both the NumPy
oracle and the Spark pipeline load these (broadcast) so span equality
reduces to identical float64 math.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ocr_gang_spark.kernels.nn import load_weights, save_weights  # noqa: E402
from ocr_gang_spark.kernels.trainer import train_fixture_weights  # noqa: E402

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
MLP = os.path.join(ROOT, "fixtures", "ocrwb.txt")
CNN = os.path.join(ROOT, "fixtures", "cnnwb.txt")

if __name__ == "__main__":
    w = train_fixture_weights()
    save_weights(w, MLP, CNN)
    back = load_weights(MLP, CNN)
    import numpy as np

    assert np.array_equal(w.hidden_w, back.hidden_w)
    assert np.array_equal(w.filters, back.filters)
    print(f"wrote {MLP} ({os.path.getsize(MLP)} bytes)")
    print(f"wrote {CNN} ({os.path.getsize(CNN)} bytes)")
