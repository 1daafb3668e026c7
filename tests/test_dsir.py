"""DSIR importance resampling (textops.dsir_importance_resample).

Value correctness vs DuckDB is covered by the registry sweep
(tests/test_queries.py).  Here: (1) the docstring's linear-vs-log-domain
claim is PINNED — the integer-ppb linear score must rank documents in
near-perfect agreement with the paper's log-domain score computed
independently in numpy from the same smoothed bucket counts; (2) the
physical plan broadcasts the constant-size ratio table (never shuffles
the corpus against it); (3) selection behaves like importance
resampling: the target-domain slice scores/keeps highest.
"""

import numpy as np
import pandas as pd

from ocr_gang_spark.textops import (
    DSIR_D,
    dsir_importance_resample,
)
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


def _numpy_log_scores(sf_dir: str) -> pd.DataFrame:
    """Independent log-domain DSIR (the paper's scoring), no Spark:
    hashed-bigram buckets -> add-one smoothed log-ratio -> per-doc MEAN
    log importance weight.  Bucket hashing mirrors the engine's md5
    scheme via hashlib, not via any engine code."""
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def buckets(text: str):
        toks = text.split(" ")
        return [
            int.from_bytes(
                hashlib.md5(f"{a} {b}".encode()).digest()[:4], "big"
            )
            % DSIR_D
            for a, b in zip(toks, toks[1:])
        ]

    per_doc = [(r.doc_id, r.lang, buckets(r.text)) for r in docs.itertuples()]
    cs = np.zeros(DSIR_D, dtype=np.int64)
    ct = np.zeros(DSIR_D, dtype=np.int64)
    for _, lang, bs in per_doc:
        for g in bs:
            cs[g] += 1
            if lang == "en":
                ct[g] += 1
    log_r = np.log((ct + 1) / (ct.sum() + DSIR_D)) - np.log(
        (cs + 1) / (cs.sum() + DSIR_D)
    )
    rows = [
        (doc_id, float(np.mean(log_r[bs])) if bs else 0.0)
        for doc_id, _, bs in per_doc
    ]
    return pd.DataFrame(rows, columns=["doc_id", "log_score"])


def test_linear_score_ranks_like_log_domain(spark):
    """The tier's linear-domain integer score and the paper's log-domain
    score are different monotonicities of per-bucket ratios aggregated
    by mean, so their rankings can differ in principle — pin that on
    the corpus they agree to Spearman >= 0.90 and share >= 80% of the
    top-quartile set."""
    got = (
        dsir_importance_resample(spark, SF)
        .select("doc_id", "score_ppb")
        .toPandas()
    )
    ref = _numpy_log_scores(SF)
    j = got.merge(ref, on="doc_id")
    rho = (
        pd.Series(j["score_ppb"].rank())
        .corr(pd.Series(j["log_score"].rank()))
    )
    assert rho >= 0.90, f"Spearman {rho:.3f}"
    k = max(1, len(j) // 4)
    top_lin = set(j.nlargest(k, "score_ppb")["doc_id"])
    top_log = set(j.nlargest(k, "log_score")["doc_id"])
    overlap = len(top_lin & top_log) / k
    assert overlap >= 0.80, f"top-quartile overlap {overlap:.2f}"


def test_ratio_table_broadcasts_and_corpus_scans_bounded(spark):
    """The 4096-row ratio table must ride a BroadcastHashJoin back into
    the bigram stream; the only cross join is the 1-row totals frame
    (BroadcastNestedLoopJoin, never CartesianProduct).  The final
    docs-to-scores join is large-large and MAY sort-merge — that one is
    correct at scale.  The corpus is scanned at most 3 times (stats
    build, per-doc stream, outer join); the persisted stats table keeps
    the totals pass off the corpus."""
    plan = plan_of(dsir_importance_resample(spark, SF), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # both the ratio build and the totals read the persisted 4096-row
    # stats (two InMemoryTableScans), which is what keeps the executed
    # corpus explodes at 2 + one plain scan for the outer join (explain
    # echoes cached children's FileScans, so a textual scan count is
    # not stable across cache state — the InMemoryTableScan pair is
    # the load-bearing evidence)
    assert plan.count("InMemoryTableScan") >= 2


def test_target_domain_scores_and_keeps_highest(spark):
    out = dsir_importance_resample(spark, SF).toPandas()
    by_lang = out.groupby("lang")["score_ppb"].mean()
    assert by_lang.idxmax() == "en"
    keep = out.assign(k=out.decision == "keep").groupby("lang")["k"].mean()
    assert keep["en"] == keep.max()
    # every doc present exactly once, zero-bigram docs carried as score 0
    assert out["doc_id"].is_unique
    assert (out["score_ppb"] >= 0).all()
