"""caption_negative_samples: in-batch negative invariants — K (or K-1
after the self-wrap filter) negatives per anchor, never the anchor
itself, negatives drawn from the anchor's own hash batch, deterministic
across runs."""

import pytest

from ocr_gang_spark.extraction_queries import (
    NEG_BATCHES,
    NEG_K,
    caption_negative_samples,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def rows(spark):
    return caption_negative_samples(spark, SF).collect()


def test_per_anchor_counts_and_no_self(rows):
    assert rows
    per_anchor = {}
    for r in rows:
        assert r.neg_media_ref != r.media_ref
        assert 0 <= r.batch_id < NEG_BATCHES
        assert 1 <= r.neg_rank <= NEG_K
        per_anchor.setdefault(r.media_ref, []).append(r)
    for anchor, negs in per_anchor.items():
        assert NEG_K - 1 <= len(negs) <= NEG_K
        # negatives are distinct pairs
        assert len({n.neg_media_ref for n in negs}) == len(negs)


def test_same_doc_flag_is_exact(rows):
    for r in rows:
        neg_doc = int(r.neg_media_ref.split("-")[1])
        assert r.same_doc == (neg_doc == r.doc_id)


def test_deterministic(spark, rows):
    again = caption_negative_samples(spark, SF).collect()
    key = lambda r: (r.media_ref, r.neg_rank)  # noqa: E731
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
