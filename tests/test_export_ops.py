"""interleaved_text_render + media_resolution_report behavior pins
(the oracle sweep covers cross-engine equality; these pin semantics)."""

import hashlib

import pytest

from ocr_gang_spark.extraction_queries import (
    _RESOLVE_MOD,
    interleaved_text_render,
    media_resolution_report,
)

SF = "/root/testdata/sf0.001"


def test_render_matches_handrolled_serialization(spark):
    from ocr_gang_spark.pipeline import broadcast_weights, extract_documents
    from ocr_gang_spark.synth import spans_from_testdata, synth_media

    docs = spans_from_testdata(spark, SF)
    media = synth_media(spark, docs)
    out = {
        r.doc_id: r.spans
        for r in extract_documents(docs, media, broadcast_weights(spark))
        .limit(20)
        .collect()
    }
    got = {
        r.doc_id: r
        for r in interleaved_text_render(spark, SF).collect()
    }
    checked = 0
    for doc_id, spans in out.items():
        pieces = [
            f"<img:{s.media_ref}>\n{s.text}" if s.kind == "media" else s.text
            for s in sorted(spans, key=lambda s: s.offset)
        ]
        rendered = "\n".join(pieces)
        r = got[doc_id]
        assert r.rendered_len == len(rendered)
        assert r.rendered_md5 == hashlib.md5(rendered.encode()).hexdigest()
        assert r.n_spans == len(spans)
        checked += 1
    assert checked == len(out) > 0


def test_resolution_statuses_consistent(spark):
    rows = media_resolution_report(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.n_media == r.doc_id % 3
        assert r.n_resolved + r.n_missing == r.n_media
        want = (
            "no_media" if r.n_media == 0
            else "full" if r.n_missing == 0
            else "blocked" if r.n_missing == r.n_media
            else "partial"
        )
        assert r.status == want
        seen.add(r.status)
        if r.n_missing > 0:
            h = int(hashlib.md5(r.first_missing_ref.encode()).hexdigest()[:8], 16)
            assert h % _RESOLVE_MOD == 0
        else:
            assert r.first_missing_ref is None
    assert {"full", "no_media"} <= seen
