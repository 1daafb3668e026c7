"""Sources: training-glyph directory scan (S2/S3) re-expressed Spark-first.

Reference ``load_directory`` (tools.c:529-578) does a readdir over
img/training/{maj,min}, filters image extensions, takes the label from
the filename's first char with per-directory case coercion, decodes and
normalizes each glyph to a 28x28 matrix; ``loadDataSet`` (tools.c:580-602)
concatenates both directories and fails on empty.

Spark mapping: ``spark.read.format("binaryFile")`` + pathGlobFilter +
``regexp_extract(path)`` for the label + the same normalization kernel
inside a pandas UDF; union + isEmpty check.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .atlas import atlas, GLYPH_H, GLYPH_W
from .kernels.bmp import decode_media_blob, encode_bmp
from .kernels.png import encode_png
from .kernels.image_ops import binarize, glyph_to_matrix


def write_glyph_fixture_dir(base_dir: str, per_class: int = 4, seed: int = 5) -> Tuple[str, str]:
    """Materialize a training-directory mirror (FIXTURES.md §3): BMP
    glyph files '<label><i>.bmp' under maj/ and min/, rendered from the
    atlas with seeded flip-noise.  Deterministic; returns (maj, min)."""
    rng = np.random.default_rng(seed)
    maj = os.path.join(base_dir, "maj")
    mnr = os.path.join(base_dir, "min")
    os.makedirs(maj, exist_ok=True)
    os.makedirs(mnr, exist_ok=True)
    a = atlas()
    for ch, mask in a.items():
        sub = maj if ch.isupper() else mnr
        for i in range(per_class):
            m = mask.copy()
            m[1:-1, 1:-1] ^= rng.random((GLYPH_H - 2, GLYPH_W - 2)) < 0.05
            img = np.where(m, 40, 250).astype(np.uint8)
            rgb = np.repeat(img[:, :, None], 3, axis=2)
            # alternate formats — the reference's training dir mixes
            # .png/.jpg/.bmp (tools.c:543-548 extension filter)
            if i % 2:
                with open(os.path.join(sub, f"{ch}{i}.png"), "wb") as f:
                    f.write(encode_png(rgb))
            else:
                with open(os.path.join(sub, f"{ch}{i}.bmp"), "wb") as f:
                    f.write(encode_bmp(rgb))
    return maj, mnr


def load_glyph_directory(spark: SparkSession, path: str, is_uppercase: bool) -> DataFrame:
    """S2 — one directory: binaryFile scan with the reference's image
    extension filter (tools.c:543-548), format-sniffing decode
    (BMP/PNG), filename label (case-coerced per directory,
    tools.c:562-564), normalized 784-vector."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{bmp,png,jpg}")
        .load(path)
        .select("path", "content")
    )
    label = F.regexp_extract(F.col("path"), r"([A-Za-z])[0-9]+\.(?:bmp|png|jpg)$", 1)
    label = F.upper(label) if is_uppercase else F.lower(label)

    def normalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mats = []
            for blob in pdf["content"]:
                bw = binarize(decode_media_blob(bytes(blob)))
                mat = glyph_to_matrix(bw)
                mats.append([] if mat is None else mat.ravel().tolist())
            yield pd.DataFrame({"path": pdf["path"], "label": pdf["label"], "pixels": mats})

    return raw.withColumn("label", label).mapInPandas(
        normalize, schema="path string, label string, pixels array<bigint>"
    )


def load_training_set(spark: SparkSession, base_dir: str) -> DataFrame:
    """S3 — maj + min union; raises on empty like loadDataSet."""
    df = load_glyph_directory(spark, os.path.join(base_dir, "maj"), True).unionByName(
        load_glyph_directory(spark, os.path.join(base_dir, "min"), False)
    )
    if df.isEmpty():
        raise ValueError(f"no training images found under {base_dir}")
    return df
