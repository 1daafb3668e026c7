"""run_mm_curation end-to-end: the confidence gate rejects exactly the
degraded slice, accepted docs ship with valid render + bin assignment,
and the run resumes as a no-op."""

import pytest
from pyspark.sql import functions as F

from ocr_gang_spark.mm_curation import run_mm_curation
from ocr_gang_spark.synth import OCR_NOISE_EVERY, spans_from_testdata, synth_media
from ocr_gang_spark.textops import MM_PACK_BUDGET

SF = "/root/testdata/sf0.001"
N_PARTS = 16


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("mmcur"))
    docs = spans_from_testdata(spark, SF)
    media = synth_media(spark, docs)
    res = run_mm_curation(spark, docs, media, wd, n_parts=N_PARTS)
    return spark, wd, docs, media, res


def test_gate_rejects_exactly_the_degraded_slice(run):
    spark, wd, docs, media, res = run
    n_docs = docs.count()
    degraded = docs.where(
        F.expr(f"CAST(regexp_extract(doc_id, '([0-9]+)$', 1) AS BIGINT) "
               f"% {OCR_NOISE_EVERY} = 0")
    ).count()
    assert res.n_rejected == degraded
    assert res.n_docs_out == n_docs - degraded
    decisions = spark.read.parquet(wd + "/decisions")
    for r in decisions.collect():
        did = int(r.doc_id.split("-")[1])
        assert r.accept == (did % OCR_NOISE_EVERY != 0)
        assert (r.reason == "low_confidence") == (not r.accept)


def test_shards_render_and_pack(run):
    spark, wd, docs, media, res = run
    shards = spark.read.parquet(wd + "/shards")
    rows = shards.collect()
    assert len(rows) == res.n_docs_out
    assert res.n_bins == len({r.bin_id for r in rows})
    for r in rows:
        assert 0 <= r.bin_offset < MM_PACK_BUDGET
        assert r.seq_cost > 0
        assert len(r.rendered) > 0
        did = int(r.doc_id.split("-")[1])
        n_media = did % 2 + 1  # spans_from_testdata layout
        assert r.rendered.count("<img:") == n_media


def test_quarantine_keeps_error_spans_out_of_shards(spark, tmp_path):
    """on_error='quarantine' (now threaded through the mm job, r3
    self-review): a corrupt blob becomes a kind='error' span in stage E,
    stage M's shared render DROPS it — no exception text in any shard —
    and the manifest pins the flag so a resume with a different
    on_error refuses."""
    from ocr_gang_spark.synth import synth_documents

    docs = synth_documents(spark, 40, seed=11, skew_frac=0.0, media_prob=1.0)
    media = synth_media(spark, docs)
    bad_ref = media.select("media_ref").orderBy("media_ref").first()[0]
    corrupted = media.withColumn(
        "bytes",
        F.when(F.col("media_ref") == bad_ref,
               F.lit(b"\x00not-an-image")).otherwise(F.col("bytes")),
    )
    wd = str(tmp_path / "mmq")
    run_mm_curation(spark, docs, corrupted, wd, n_parts=4,
                    on_error="quarantine")
    extracted = spark.read.parquet(wd + "/extracted")
    err_rows = extracted.select(
        F.explode("spans").alias("s")
    ).where(F.col("s.kind") == "error").collect()
    assert len(err_rows) >= 1  # the corrupt blob is visible upstream
    err_texts = {r.s.text for r in err_rows}
    shards = spark.read.parquet(wd + "/shards")
    for r in shards.collect():
        assert f"<img:{bad_ref}>" not in r.rendered
        assert not any(t in r.rendered for t in err_texts)
    with pytest.raises(ValueError, match="refusing to resume"):
        run_mm_curation(spark, docs, corrupted, wd, n_parts=4,
                        on_error="fail")


def test_resume_is_noop_and_manifest_pins(run):
    spark, wd, docs, media, _ = run
    res2 = run_mm_curation(spark, docs, media, wd, n_parts=N_PARTS)
    assert res2.n_parts_processed == 0 and res2.n_docs_out == 0
    with pytest.raises(ValueError, match="refusing to resume"):
        run_mm_curation(spark, docs, media, wd, n_parts=N_PARTS * 2)
