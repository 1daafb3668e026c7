"""Driver-contract entries for the extraction pipeline itself.

The OCR kernel is not SQL-expressible (driver records rows-only checks
for it); the HTML-strip kernel gets a real value-level oracle via the
identity property on already-clean text.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kernels.html_strip import strip_html
from .pipeline import broadcast_weights, extract_documents
from .queries import load, register
from .synth import spans_from_testdata, synth_media


@register("ocr_extract_spans", None)  # rows-only: image kernels not SQL-expressible
def ocr_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full extraction over the spans-shaped corpus derived
    from the sanctioned testdata + deterministic synthetic media blobs.
    Returns the exploded extracted span sequence."""
    docs = spans_from_testdata(spark, sf_dir)
    media = synth_media(spark, docs)
    out = extract_documents(docs, media, broadcast_weights(spark))
    return (
        out.select("doc_id", F.posexplode("spans").alias("pos", "s"))
        .select(
            "doc_id",
            "pos",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
        )
    )


@register("segmentation_debug", None)  # rows-only: image kernel
def segmentation_debug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 analog — the reference dumps a segmentation overlay bitmap
    (SDL_SaveBMP 'segmentation.bmp', ocr.c:165); the engine's debug sink
    is a *table* of line/char boxes per media blob instead."""
    import pandas as pd
    from .kernels.bmp import decode_media_blob
    from .kernels.image_ops import (
        binarize,
        char_items,
        col_marker_mask,
        row_marker_mask,
        runs_of_nonmarker,
    )
    from .synth import spans_from_testdata

    docs = spans_from_testdata(spark, sf_dir)
    media = synth_media(spark, docs)

    def boxes(batches):
        for pdf in batches:
            out = []
            for ref, blob in zip(pdf["media_ref"], pdf["bytes"]):
                bw = binarize(decode_media_blob(bytes(blob)))
                for li, (y0, y1) in enumerate(runs_of_nonmarker(row_marker_mask(bw))):
                    items = char_items(col_marker_mask(bw[y0:y1, :]))
                    out.append(
                        (ref, li, int(y0), int(y1),
                         sum(1 for it in items if it[0] == "glyph"),
                         sum(1 for it in items if it[0] == "space"))
                    )
            yield pd.DataFrame(
                out, columns=["media_ref", "line_idx", "y0", "y1", "n_glyphs", "n_spaces"]
            )

    return media.mapInPandas(
        boxes,
        schema="media_ref string, line_idx int, y0 int, y1 int, n_glyphs int, n_spaces int",
    )


@register(
    "html_strip_identity",
    # oracle: the testdata corpus text is already boilerplate-free,
    # single-spaced and trimmed, so strip_html must be the identity on it
    # (verified property; a real value-level check of the text kernel)
    "SELECT doc_id, text AS clean_text FROM documents",
)
def html_strip_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")

    @F.pandas_udf("string")
    def strip_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([strip_html(t) for t in texts], dtype=object)

    return docs.select("doc_id", strip_udf("text").alias("clean_text"))


@register(
    "extraction_span_counts",
    # relational skeleton check: span routing/reassembly counts are
    # SQL-derivable from the deterministic spans_from_testdata shape
    # (1 text span + (doc_id % 2 + 1) media spans per doc)
    """
    SELECT CAST(1 + (doc_id % 2 + 1) AS INT) AS n_spans, COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def extraction_span_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spans_from_testdata(spark, sf_dir, media_per_doc=2)
    return (
        docs.select(F.size("spans").alias("n_spans"))
        .groupBy("n_spans")
        .agg(F.count("*").alias("n_docs"))
    )
