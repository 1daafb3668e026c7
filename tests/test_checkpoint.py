"""Resume semantics: a run killed after k of n parts must, on rerun,
process only the remainder and produce output identical to a clean run
(FIXTURES.md §6)."""

import pytest
from pyspark.sql import functions as F

from ocr_gang_spark.checkpoint import (
    checkpoint_table,
    load_output,
    run_extraction,
    with_part_id,
)
from ocr_gang_spark.pipeline import broadcast_weights
from ocr_gang_spark.synth import synth_documents, synth_media

N_DOCS = 24
N_PARTS = 8
SEED = 11


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_documents(spark, N_DOCS, seed=SEED)
    media = synth_media(spark, docs)
    return docs, media


def spans_by_doc(df):
    return {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in df.collect()
    }


def test_clean_run_then_noop_resume(spark, corpus, tmp_path):
    docs, media = corpus
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    bc = broadcast_weights(spark)

    r1 = run_extraction(spark, docs, media, out, cp, n_parts=N_PARTS,
                        run_id="r1", weights_bc=bc)
    assert r1.n_docs == N_DOCS and r1.n_parts_processed > 0

    # all parts done -> resume is a no-op
    r2 = run_extraction(spark, docs, media, out, cp, n_parts=N_PARTS,
                        run_id="r2", weights_bc=bc)
    assert r2.n_parts_processed == 0 and r2.n_docs == 0

    cp_df = checkpoint_table(spark, cp)
    assert cp_df.where(F.col("run_id") == "r1").count() == r1.n_parts_processed
    # lineage metrics present and positive
    row = cp_df.agg(F.sum("n_docs").alias("d"), F.sum("n_spans_out").alias("s")).first()
    assert row.d == N_DOCS and row.s > 0


def test_mismatched_n_parts_is_refused(spark, corpus, tmp_path):
    """part_id is only meaningful relative to n_parts: entries written
    under a different n_parts must never short-circuit genuine remaining
    work (ADVICE r1).  Since round 3 the manifest refuses the mismatch
    outright — dynamic overwrite only replaces NEW part_id dirs, so a
    reused output dir would keep stale dirs from the old partitioning
    and silently duplicate documents.  A fresh checkpoint dir (the
    documented way to change n_parts) reprocesses the full corpus."""
    docs, media = corpus
    cp = str(tmp_path / "cp")
    bc = broadcast_weights(spark)

    r1 = run_extraction(spark, docs, media, str(tmp_path / "out4"), cp,
                        n_parts=4, run_id="a", weights_bc=bc)
    assert r1.n_docs == N_DOCS

    with pytest.raises(ValueError, match="n_parts"):
        run_extraction(spark, docs, media, str(tmp_path / "out8"), cp,
                       n_parts=8, run_id="b", weights_bc=bc)

    # fresh checkpoint dir: full reprocess under the new scheme
    r2 = run_extraction(spark, docs, media, str(tmp_path / "out8"),
                        str(tmp_path / "cp8"), n_parts=8, run_id="b2",
                        weights_bc=bc)
    assert r2.n_docs == N_DOCS and r2.n_parts_processed > 0


def test_killed_run_resumes_to_identical_output(spark, corpus, tmp_path):
    docs, media = corpus
    bc = broadcast_weights(spark)

    # reference: clean run
    clean_out = str(tmp_path / "clean")
    run_extraction(spark, docs, media, clean_out, str(tmp_path / "cp0"),
                   n_parts=N_PARTS, weights_bc=bc)
    expected = spans_by_doc(load_output(spark, clean_out))

    # simulate a kill after half the parts: first run sees only docs of
    # parts {0..3} (as if the job died before the rest committed)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    docs_p = with_part_id(docs, N_PARTS)
    first_half = docs_p.where(F.col("part_id") < N_PARTS // 2).drop("part_id")
    r1 = run_extraction(spark, first_half, media, out, cp, n_parts=N_PARTS,
                        run_id="partial", weights_bc=bc)
    done_parts = {x.part_id for x in checkpoint_table(spark, cp)
                  .select("part_id").distinct().collect()}
    assert all(p < N_PARTS // 2 for p in done_parts)

    # resume with the FULL corpus: must process only the missing parts
    r2 = run_extraction(spark, docs, media, out, cp, n_parts=N_PARTS,
                        run_id="resume", weights_bc=bc)
    assert r2.n_parts_processed + r1.n_parts_processed <= N_PARTS
    new_parts = {x.part_id for x in checkpoint_table(spark, cp)
                 .where(F.col("run_id") == "resume")
                 .select("part_id").distinct().collect()}
    assert new_parts.isdisjoint(done_parts)

    got = spans_by_doc(load_output(spark, out).drop("part_id"))
    assert got == expected


def test_resume_with_different_deskew_refused(spark, corpus, tmp_path):
    """Output-affecting options are pinned in the run manifest: a resume
    with a different --deskew would silently mix deskewed and
    non-deskewed parts in one output directory (ADVICE r2)."""
    docs, media = corpus
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    bc = broadcast_weights(spark)

    run_extraction(spark, docs.limit(6), media, out, cp, n_parts=N_PARTS,
                   run_id="r1", weights_bc=bc, deskew=False)
    with pytest.raises(ValueError, match="deskew"):
        run_extraction(spark, docs, media, out, cp, n_parts=N_PARTS,
                       run_id="r2", weights_bc=bc, deskew=True)
    # a different n_parts is equally output-affecting: stale part_id
    # dirs from the old partitioning would duplicate docs (dynamic
    # overwrite only replaces the new dirs), so it must refuse too
    with pytest.raises(ValueError, match="n_parts"):
        run_extraction(spark, docs, media, out, cp, n_parts=N_PARTS * 2,
                       run_id="r2b", weights_bc=bc, deskew=False)
    # same options resume normally and pick up the remaining docs (those
    # whose part_id was not completed by the 6-doc first run)
    r3 = run_extraction(spark, docs, media, out, cp, n_parts=N_PARTS,
                        run_id="r3", weights_bc=bc, deskew=False)
    assert r3.n_docs > 0 and r3.n_docs <= N_DOCS - 6


def test_manifest_missing_keys_compare_against_defaults(tmp_path):
    """A checkpoint written before a manifest key existed must resume
    when the new run passes that option's default (the old run WAS the
    default behavior), and still refuse when it passes a different
    value or when a versioned rule moved past the implied old version
    (code-review fix for the bare prev.get comparison)."""
    import json
    import os

    import pytest

    from ocr_gang_spark.checkpoint import MANIFEST_NAME, _check_run_manifest

    cp = str(tmp_path / "cp")
    os.makedirs(cp)
    with open(os.path.join(cp, MANIFEST_NAME), "w") as f:
        json.dump({"deskew": False, "n_parts": 4}, f)  # pre-flag manifest

    opts = {"deskew": False, "n_parts": 4, "on_error": "fail"}
    _check_run_manifest(cp, opts, defaults={"on_error": "fail"})  # proceeds

    with pytest.raises(ValueError, match="refusing to resume"):
        _check_run_manifest(
            cp, {**opts, "on_error": "quarantine"},
            defaults={"on_error": "fail"},
        )
    with pytest.raises(ValueError, match="refusing to resume"):
        _check_run_manifest(
            cp, {**opts, "pack_rule": 2},
            defaults={"on_error": "fail", "pack_rule": 1},
        )
