"""The approx-quantile production swap, demonstrated (VERDICT r3 #8).

quantile_hist_sketch and unigram_lm_tiers keep exact quantile paths so
the DuckDB oracle pins exact values; their docstrings promise that a
production run swaps in approx_percentile (Greenwald-Khanna, built-in,
mergeable — no per-group global sort).  These tests RUN that swap next
to the exact columns the queries already carry and pin the observed
error, so the promise is a measured fact rather than a claim:

- histogram quantiles: approx_percentile at default accuracy (10000)
  reproduces the exact type-1 quantile EXACTLY on every (lang, q) of
  the tier (max abs err 0); at accuracy 100 max abs err 13 chars and
  at 20 max 33 — all inside the histogram's own 63-char bin bound, so
  even a deliberately coarse sketch is no worse than the committed
  estimator.
- CCNet terciles: threshold-assignment against broadcast approx cuts
  agrees with the exact per-lang ntile on 490/500 docs (98.0%); every
  disagreement is a one-level flip at a tercile boundary (ntile splits
  tied/boundary scores positionally, thresholds split them by value —
  the known, bounded difference between the two definitions).
"""

import collections

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_hist_quantiles_approx_percentile_error(spark):
    from ocr_gang_spark.sketch_queries import QH_LEVELS, quantile_hist_sketch

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        (r["lang"], r["q"]): r["exact_q"]
        for r in quantile_hist_sketch(spark, SF).collect()
    }
    assert len(exact) == 5 * len(QH_LEVELS)

    def errs(accuracy):
        rows = docs.groupBy("lang").agg(
            F.percentile_approx(
                "n_chars", [q / 100 for q in QH_LEVELS], accuracy
            ).alias("ap")
        ).collect()
        return [
            abs(v - exact[(r["lang"], q)])
            for r in rows
            for q, v in zip(QH_LEVELS, r["ap"])
        ]

    # default accuracy: indistinguishable from exact on this tier
    assert max(errs(10000)) == 0
    # deliberately coarse sketches stay inside the committed
    # histogram's own 63-char (QH_BIN_W - 1) error bound
    assert max(errs(100)) <= 63
    assert max(errs(20)) <= 63


def test_unigram_tiers_approx_cut_agreement(spark):
    from ocr_gang_spark.textops import unigram_lm_tiers

    rows = unigram_lm_tiers(spark, SF).collect()
    sc = spark.createDataFrame(
        [(r["lang"], r["score_ppb"]) for r in rows],
        "lang string, score_ppb bigint",
    )
    cuts = {
        r["lang"]: r["c"]
        for r in sc.groupBy("lang")
        .agg(F.percentile_approx("score_ppb", [1 / 3, 2 / 3], 10000).alias("c"))
        .collect()
    }

    order = {"head": 0, "middle": 1, "tail": 2}
    mismatch = []
    for r in rows:
        c33, c67 = cuts[r["lang"]]
        approx_tier = (
            "head" if r["score_ppb"] > c67
            else "middle" if r["score_ppb"] > c33
            else "tail"
        )
        if approx_tier != r["tier"]:
            mismatch.append((r, approx_tier))
            # disagreements are one-level flips, never head<->tail
            assert abs(order[approx_tier] - order[r["tier"]]) == 1

    # measured: 10/500 flips (98.0% agreement); allow headroom but a
    # real divergence (wrong cuts, wrong comparison direction) blows
    # far past this
    assert len(mismatch) / len(rows) <= 0.05
    # and every flip sits AT a boundary: the doc's score equals a cut
    # or is adjacent to it within its language's score ladder
    by_lang = collections.defaultdict(set)
    for r in rows:
        by_lang[r["lang"]].add(r["score_ppb"])
    for r, _t in mismatch:
        c33, c67 = cuts[r["lang"]]
        ladder = sorted(by_lang[r["lang"]])
        i = ladder.index(r["score_ppb"])
        near = set(ladder[max(0, i - 1): i + 2])
        assert near & {c33, c67}, (r["lang"], r["score_ppb"], cuts[r["lang"]])
