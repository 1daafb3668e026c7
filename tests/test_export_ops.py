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


def test_tar_shards_are_byte_deterministic_and_tolerant(spark):
    """Same corpus -> byte-identical shard archives (fixed tar
    metadata), and a malformed member key / non-UTF-8 payload lands as
    doc_id=-1 / replacement text instead of a dead task."""
    import io
    import tarfile

    from pyspark.sql import functions as F

    from ocr_gang_spark.extraction_queries import (
        tar_samples_from,
        tar_shards_df,
    )
    from ocr_gang_spark.queries import load

    (docs,) = load(spark, "/root/testdata/sf0.001", "documents")
    a = {r.shard_id: bytes(r.blob) for r in tar_shards_df(docs).collect()}
    b = {r.shard_id: bytes(r.blob) for r in tar_shards_df(docs).collect()}
    assert a == b and len(a) > 1

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("weird-key.txt", b"\xff\xferaw"),
                           ("00000003.txt", b"fine")]:
            ti = tarfile.TarInfo(name=name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    df = spark.createDataFrame([(0, bytearray(buf.getvalue()))],
                               "shard_id bigint, blob binary")
    rows = {r.doc_id: r for r in tar_samples_from(df).collect()}
    assert rows[-1].text.startswith("�") and rows[3].text == "fine"
