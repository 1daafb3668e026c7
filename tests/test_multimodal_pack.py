"""multimodal_pack_plan: interleaved multimodal sequence packing.

The layout constants must stay pinned to the caption miner's (the two
operators describe the SAME span stream), and the packing must hold the
lossless-bin invariants: offsets stay inside the budget, bins fill in
order, and a document with media spans costs exactly MM_IMG_TOKENS per
span more than its text alone."""

import pytest

from ocr_gang_spark.extraction_queries import _CAP_CH, _CAP_MAXC
from ocr_gang_spark.textops import (
    MM_IMG_TOKENS,
    MM_PACK_BUDGET,
    _MM_CH,
    _MM_MAXC,
    multimodal_pack_plan,
)

SF = "/root/testdata/sf0.001"


def test_layout_constants_pinned_to_caption_miner():
    assert (_MM_CH, _MM_MAXC) == (_CAP_CH, _CAP_MAXC)


@pytest.fixture(scope="module")
def packed(spark):
    return multimodal_pack_plan(spark, SF).orderBy("doc_id").collect()


def test_bin_invariants(packed):
    assert len(packed) > 0
    prev_cum = 0
    prev_bin = 0
    for r in packed:
        # costs are positive and the scan is exact
        assert r.seq_cost == r.n_text_tokens + MM_IMG_TOKENS * r.n_media_spans
        assert r.seq_cost > 0
        assert r.cum_cost == prev_cum + r.seq_cost
        # offsets stay inside the budget; bins advance monotonically
        assert 0 <= r.bin_offset < MM_PACK_BUDGET
        assert r.bin_id >= prev_bin
        assert r.bin_id == (r.cum_cost - r.seq_cost) // MM_PACK_BUDGET
        prev_cum = r.cum_cost
        prev_bin = r.bin_id


def test_media_cost_is_per_span(packed):
    # by the derived layout n_media_spans == doc_id % 3, so every
    # residue class is populated and the visual-token charge is linear
    by_media = {}
    for r in packed:
        assert r.n_media_spans == r.doc_id % 3
        by_media.setdefault(r.n_media_spans, r)
    assert set(by_media) == {0, 1, 2}
    for n, r in by_media.items():
        assert r.seq_cost - r.n_text_tokens == MM_IMG_TOKENS * n


def test_text_cost_bounded_by_layout(packed):
    # <= _MM_MAXC chunks of _MM_CH words each
    for r in packed:
        assert 1 <= r.n_text_tokens <= _MM_MAXC * _MM_CH
