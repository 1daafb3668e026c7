"""Driver-contract entries for training-side operators (SURVEY §2.5).

The augmentation query runs the real T2 kernels (rotate/shift/noise/
scale, reference augmentation.c) distributed over Arrow batches and is
value-checked against a committed expected parquet built by the same
NumPy kernels offline (scripts/make_expected.py) — kernel-vs-C fidelity
itself is pinned by the brute-force micro-tests in tests/test_augment.py.

Scale shape: this is exactly the 100TB training-pipeline explode
pattern — samples x 49 copies fan out as rows, each row's transform is
pure and in-kernel, no shuffle until the (tiny) count aggregation.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .queries import register

_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

N_CLASSES = 52
N_COPIES = 49  # reference multiplier 50 = 1 original + 49 copies (training.c:19)


@register(
    "augmentation_counts",
    f"SELECT cls, copy_id, op, n_ink "
    f"FROM read_parquet('{_FIXTURES}/expected_augmentation.parquet')",
)
def augmentation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 — one row per (class sample, augmented copy): the op applied
    and the augmented matrix's ink-pixel count.  Deterministic and
    sf-independent (the 52-class atlas is the sample set), so one
    committed expected parquet is the exact value oracle at any tier."""

    def aug(batches):
        from .atlas import class_matrices
        from .kernels.augment import augment_copy

        mats = class_matrices()
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                cls, m0 = divmod(int(i), N_COPIES)
                copy_id = m0 + 1
                out, op = augment_copy(mats[cls], f"{cls}:{copy_id}")
                rows.append((cls, copy_id, op, int(out.sum())))
            yield pd.DataFrame(rows, columns=["cls", "copy_id", "op", "n_ink"])

    n = N_CLASSES * N_COPIES
    parts = max(8, spark.sparkContext.defaultParallelism)
    return spark.range(0, n, numPartitions=parts).mapInPandas(
        aug, schema="cls int, copy_id int, op string, n_ink bigint"
    )
