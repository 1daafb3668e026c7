"""ocr_caption_agreement's scoring must discriminate: identical
OCR/caption text scores 1e6 ppm ('high'), disjoint text scores 0
('low'), partial overlap lands in between with the exact trigram
arithmetic — pinned on constructed spans because the synthetic corpus
(correctly) provides no aligned pairs."""

import pytest

from ocr_gang_spark.extraction_queries import (
    AGREE_HIGH_PPM,
    caption_agreement_from,
)

SPANS_SCHEMA = (
    "doc_id string, kind string, text string, media_ref string, offset int"
)


def rows_for(spark, spans):
    df = spark.createDataFrame(spans, SPANS_SCHEMA)
    return {r.media_ref: r for r in caption_agreement_from(df).collect()}


def test_discrimination(spark):
    out = rows_for(
        spark,
        [
            # doc a: OCR text identical to its caption -> perfect score
            ("a", "text", "the quick brown fox", None, 0),
            ("a", "media", "the quick brown fox", "m-same", 1),
            # doc b: disjoint alphabets -> zero overlap
            ("b", "text", "aaaa bbbb cccc", None, 0),
            ("b", "media", "XYZW QRST", "m-disjoint", 1),
            # doc c: caption shares a word with the OCR text
            ("c", "text", "shared prefix words", None, 0),
            ("c", "media", "shared glyphs", "m-partial", 1),
        ],
    )
    assert out["m-same"].jac_ppm == 1_000_000
    assert out["m-same"].band == "high"
    assert out["m-disjoint"].jac_ppm == 0
    assert out["m-disjoint"].band == "low"
    assert 0 < out["m-partial"].jac_ppm < 1_000_000

    # exact arithmetic on the partial case
    def tri(s):
        return {s[i : i + 3] for i in range(len(s) - 2)}

    ta, tb = tri("shared glyphs"), tri("shared prefix words")
    i = len(ta & tb)
    want = i * 1_000_000 // (len(ta) + len(tb) - i)
    assert out["m-partial"].jac_ppm == want


def test_longer_neighbor_wins_and_next_breaks_nothing(spark):
    out = rows_for(
        spark,
        [
            ("d", "text", "tiny", None, 0),
            ("d", "media", "tiny", "m-mid", 1),
            ("d", "text", "a very much longer following span", None, 2),
        ],
    )
    # next span is longer -> becomes the caption -> low agreement
    r = out["m-mid"]
    assert r.caption_len == len("a very much longer following span")
    assert r.jac_ppm < AGREE_HIGH_PPM


def test_short_strings_empty_trigram_sets(spark):
    out = rows_for(
        spark,
        [
            ("e", "text", "ab", None, 0),
            ("e", "media", "x", "m-short", 1),
        ],
    )
    r = out["m-short"]
    assert (r.tri_overlap, r.jac_ppm, r.band) == (0, 0, "low")


def test_doc_opening_with_media_pairs_with_next_text(spark):
    """A document that OPENS with an image (no preceding text span)
    must pair with the FOLLOWING text span — the code-review bug was
    `length(next_t) > length(prev_t)` NULL-lifting to false when prev_t
    is NULL, yielding a NULL caption.  The synthetic corpus never opens
    a doc with media, so this branch is pinned here directly (the same
    rule is shared with caption_pair_mining and both DuckDB oracles)."""
    out = rows_for(
        spark,
        [
            ("d1", "media", "ocr text here", "m-first", 0),
            ("d1", "text", "the caption that follows", None, 1),
        ],
    )
    r = out["m-first"]
    assert r.caption_len == len("the caption that follows")
    # and a doc that is ONLY media still yields NULL caption (len NULL)
    out2 = rows_for(spark, [("d2", "media", "x", "m-only", 0)])
    assert out2["m-only"].caption_len is None
