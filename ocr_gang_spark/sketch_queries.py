"""Sketch / statistics operators a 100 TB curation engine runs beside
the dedup+quality core: count-min frequency sketch, histogram-quantile
sketch, collocation (PMI) mining, SemDeDup semantic dedup, and Unicode
NFC normalization.  Same contract as every other registry module: each
query is paired with DuckDB oracle SQL engineered for bit-identical
values (md5-derived integer hashes, integer-exact scores, fixed-order
IEEE chains only where a float is unavoidable — here: nowhere).

Reference parity note: like textops.py, these go beyond OCR-GANG's §2
inventory — they are the LLM-training-data operators the brief asks
for as first-class components (the reference has no analog; cited
papers: Cormode & Muthukrishnan 2005 for count-min, Abbas et al. 2023
"SemDeDup" for semantic dedup, Church & Hanks 1990 for PMI
collocations, UAX #15 for NFC).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .queries import load, register
from .textops import (
    _kmeans_assign,
    _kmeans_c1,
    _kmeans_duck_ctes,
    _qdot_chain_duck,
    _QZ_DUCK_CTE,
    _spread,
    quantized_codes,
)

# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005).
# Deterministic-by-construction in both engines: row-i hash of token t
# is the first-8-hex md5 prefix of "i:t" mod W — pure string/integer
# ops, no platform hashing.  The exact per-token count rides along so
# the sketch's one-sided overestimate is part of the pinned output.
# ---------------------------------------------------------------------------

CMS_D = 4     # hash rows
CMS_W = 256   # counters per row
CMS_TOPK = 20


def _cms_duck() -> str:
    return f"""
    WITH t AS (SELECT UNNEST(string_split(text, ' ')) AS tok
               FROM documents),
    rows_ AS (SELECT UNNEST(range(0, {CMS_D})) AS i),
    keyed AS (SELECT r.i, t.tok,
                     ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || t.tok),
                                     1, 8))::BIGINT % {CMS_W} AS bucket
              FROM t, rows_ r),
    reg AS (SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM keyed GROUP BY 1, 2),
    exact AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt
              FROM t GROUP BY 1
              ORDER BY exact_cnt DESC, tok LIMIT {CMS_TOPK}),
    probe AS (SELECT e.tok, e.exact_cnt, r.i,
                     ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || e.tok),
                                     1, 8))::BIGINT % {CMS_W} AS bucket
              FROM exact e, rows_ r),
    est AS (SELECT p.tok, p.exact_cnt,
                   CAST(MIN(g.cnt) AS BIGINT) AS cms_est
            FROM probe p JOIN reg g ON p.i = g.i AND p.bucket = g.bucket
            GROUP BY 1, 2)
    SELECT tok, exact_cnt, cms_est,
           CAST(cms_est - exact_cnt AS BIGINT) AS cms_over
    FROM est ORDER BY exact_cnt DESC, tok
    """


def _cms_hash(i: int, tok) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), tok)), 1, 8), 16, 10
        ).cast("bigint")
        % CMS_W
    )


@register("cms_heavy_hitters", _cms_duck())
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the whitespace token stream, estimates
    pinned next to the exact counts for the top-20 tokens (sketch is
    one-sided: cms_over >= 0 always, and the output proves it row by
    row).

    100 TB shape: the sketch side shuffles AT MOST D*W = 1024 narrow
    register rows regardless of corpus size (map-side partial sums do
    the heavy combining), replacing the full-vocabulary token groupBy
    whenever only frequency *estimates* are needed (quality filters,
    stop-word detection, mixture diagnostics).  The exact top-k here is
    the ground truth the sketch is judged against — at production scale
    you keep the sketch and drop the exact pass.  Probing joins a
    20-row top-k against the broadcast 1024-row register table."""
    (docs,) = load(spark, sf_dir, "documents")
    t = _spread(docs).select(F.explode(F.split("text", " ")).alias("tok"))
    keyed = t.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cms_hash(i, F.col("tok")).alias("bucket"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("k")
    ).select("k.i", "k.bucket")
    reg = keyed.groupBy("i", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    exact = (
        t.groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "tok")
        .limit(CMS_TOPK)
    )
    probe = exact.select(
        "tok",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cms_hash(i, F.col("tok")).alias("bucket"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("k"),
    ).select("tok", "exact_cnt", "k.i", "k.bucket")
    est = (
        probe.join(F.broadcast(reg), ["i", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
    )
    return est.select(
        "tok",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).cast("bigint").alias("cms_over"),
    ).orderBy(F.desc("exact_cnt"), "tok")


# ---------------------------------------------------------------------------
# Histogram-quantile sketch: fixed-width bin histogram per language,
# quantile read off the cumulative bin counts — the O(bins) shuffle
# that replaces a global per-group sort for p50/p90/p99 length
# dashboards.  Exact type-1 quantiles ride along as ground truth, and
# the pinned error is provably in [0, BIN_W-1].
# ---------------------------------------------------------------------------

QH_BIN_W = 64
QH_LEVELS = (50, 90, 99)


def _qh_duck() -> str:
    levels = ", ".join(str(q) for q in QH_LEVELS)
    return f"""
    WITH v AS (SELECT lang, n_chars AS val FROM documents),
    lv AS (SELECT UNNEST([{levels}]) AS q),
    n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1),
    k AS (SELECT n.lang, lv.q, n.n,
                 CAST((lv.q * n.n + 99) // 100 AS BIGINT) AS kth
          FROM n, lv),
    rn AS (SELECT lang, val,
                  row_number() OVER (PARTITION BY lang ORDER BY val) AS r
           FROM v),
    exact AS (SELECT k.lang, k.q, k.n, k.kth,
                     CAST(rn.val AS BIGINT) AS exact_q
              FROM k JOIN rn ON k.lang = rn.lang AND rn.r = k.kth),
    h AS (SELECT lang, val // {QH_BIN_W} AS bin,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM v GROUP BY 1, 2),
    c AS (SELECT lang, bin, cnt,
                 SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum
          FROM h),
    est AS (SELECT k.lang, k.q, CAST(MIN(c.bin) AS BIGINT) AS est_bin
            FROM k JOIN c ON k.lang = c.lang AND c.cum >= k.kth
            GROUP BY 1, 2)
    SELECT e.lang, CAST(e.q AS BIGINT) AS q, e.n, e.exact_q,
           s.est_bin,
           CAST(s.est_bin * {QH_BIN_W} + {QH_BIN_W} - 1 AS BIGINT) AS est_hi,
           CAST(s.est_bin * {QH_BIN_W} + {QH_BIN_W} - 1 - e.exact_q
                AS BIGINT) AS err
    FROM exact e JOIN est s ON e.lang = s.lang AND e.q = s.q
    """


@register("quantile_hist_sketch", _qh_duck())
def quantile_hist_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language p50/p90/p99 of document length via a fixed-width
    bin histogram, exact type-1 quantiles pinned next to the estimate
    (err = est_hi - exact_q is in [0, 63] by construction — the k-th
    smallest value lies inside the first bin whose cumulative count
    reaches k).

    100 TB shape: the histogram side shuffles O(langs * bins) narrow
    counter rows (map-side combined), replacing the per-group global
    sort that exact quantiles need; the cumulative window runs over a
    few hundred bins per group, not the data.  The exact side (a
    row_number over the raw values) is the ground truth the sketch
    replaces — tier-sized here, dropped at production scale.  The
    built-in alternative is percentile_approx (Greenwald-Khanna,
    mergeable), demonstrated side-by-side in
    tests/test_approx_quantile.py: at default accuracy it reproduces
    every exact tier quantile EXACTLY (max abs err 0 over all
    (lang, q)); even deliberately coarse sketches (accuracy 100 -> max
    err 13 chars, accuracy 20 -> max 33) stay inside this histogram's
    own 63-char bin bound."""
    (docs,) = load(spark, sf_dir, "documents")
    v = _spread(docs).select("lang", F.col("n_chars").alias("val"))
    n = v.groupBy("lang").agg(F.count("*").cast("bigint").alias("n"))
    lv = v.sparkSession.createDataFrame(
        [(int(q),) for q in QH_LEVELS], "q int"
    )
    k = n.crossJoin(F.broadcast(lv)).select(
        "lang", "q", "n",
        F.expr("CAST((q * n + 99) DIV 100 AS BIGINT)").alias("kth"),
    )
    rn = v.select(
        F.col("lang").alias("r_lang"),
        "val",
        F.row_number().over(W.partitionBy("lang").orderBy("val")).alias("r"),
    )
    exact = (
        k.alias("k")
        .join(
            rn.alias("rr"),
            (F.col("k.lang") == F.col("rr.r_lang"))
            & (F.col("rr.r") == F.col("k.kth")),
        )
        .select(
            F.col("k.lang").alias("lang"), "q", "n", "kth",
            F.col("rr.val").cast("bigint").alias("exact_q"),
        )
    )
    h = (
        v.select(
            F.col("lang").alias("h_lang"),
            F.expr(f"val DIV {QH_BIN_W}").alias("bin"),
        )
        .groupBy("h_lang", "bin")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    c = h.select(
        "h_lang", "bin", "cnt",
        F.sum("cnt").over(W.partitionBy("h_lang").orderBy("bin")).alias("cum"),
    )
    est = (
        k.alias("k2")
        .join(
            c.alias("c"),
            (F.col("k2.lang") == F.col("c.h_lang"))
            & (F.col("c.cum") >= F.col("k2.kth")),
        )
        .groupBy(F.col("k2.lang").alias("lang"), F.col("k2.q").alias("q"))
        .agg(F.min("c.bin").cast("bigint").alias("est_bin"))
    )
    return exact.join(est, ["lang", "q"]).select(
        "lang",
        F.col("q").cast("bigint").alias("q"),
        "n",
        "exact_q",
        "est_bin",
        (F.col("est_bin") * QH_BIN_W + (QH_BIN_W - 1)).cast("bigint").alias("est_hi"),
        (F.col("est_bin") * QH_BIN_W + (QH_BIN_W - 1) - F.col("exact_q"))
        .cast("bigint")
        .alias("err"),
    )


# ---------------------------------------------------------------------------
# Collocation mining: adjacent-bigram counts scored by an integer PMI
# ratio (Church & Hanks 1990, log-free: ppm of c(ab)*N / (c(a)*c(b)),
# monotone in PMI so the ranking is identical) — the tokenizer-vocab /
# multi-word-expression miner.
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOPK = 20


def _pmi_duck() -> str:
    return f"""
    WITH t AS (SELECT string_split(text, ' ') AS tt FROM documents),
    ug AS (SELECT UNNEST(tt) AS tok FROM t),
    uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM ug GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ug),
    bg AS (SELECT UNNEST(CASE WHEN len(tt) >= 2
                    THEN list_transform(range(1, len(tt)),
                         k -> struct_pack(a := tt[k], b := tt[k+1]))
                    ELSE [] END) AS p
           FROM t),
    bc AS (SELECT p.a AS a, p.b AS b, CAST(COUNT(*) AS BIGINT) AS cab
           FROM bg GROUP BY 1, 2)
    SELECT bc.a, bc.b, bc.cab, ca.c AS ca, cb.c AS cb,
           CAST(bc.cab * nn.n * 1000000 // (ca.c * cb.c) AS BIGINT)
               AS pmi_ratio_ppm
    FROM bc
    JOIN uc ca ON bc.a = ca.tok
    JOIN uc cb ON bc.b = cb.tok
    CROSS JOIN nn
    WHERE bc.cab >= {PMI_MIN_COUNT}
    ORDER BY pmi_ratio_ppm DESC, bc.a, bc.b
    LIMIT {PMI_TOPK}
    """


@register("cooc_pmi_topk", _pmi_duck())
def cooc_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k adjacent-token collocations by integer PMI ratio —
    pmi_ratio_ppm = c(ab)*N*1e6 / (c(a)*c(b)) truncated, which is
    exp(PMI) in parts-per-million and therefore ranks identically to
    PMI without putting libm's log under the cross-engine value hash.

    Overflow budget: c(ab) <= N, so the numerator needs c(ab)*N < 9e12
    — fine through ~3M tokens per run; a full-corpus run at 10^12
    tokens scores per-shard and merges counts first (the counts
    themselves are the shuffle-safe part).

    100 TB shape: two map-side-combined groupBys (bigrams, unigrams)
    sharded on the token keys, then the bigram table joins the unigram
    counts on a and on b — both shuffle joins on high-cardinality keys
    (no broadcast assumption on the vocabulary), with the min-count
    filter applied BEFORE the joins so only candidate collocations ride
    the network; the 1-row corpus total broadcasts.  The final top-k is
    TakeOrderedAndProject."""
    (docs,) = load(spark, sf_dir, "documents")
    t = _spread(docs).select(F.split("text", " ").alias("tt"))
    ug = t.select(F.explode("tt").alias("tok"))
    uc = ug.groupBy("tok").agg(F.count("*").cast("bigint").alias("c"))
    nn = F.broadcast(ug.agg(F.count("*").cast("bigint").alias("n")))
    bg = t.select(
        F.explode(
            F.expr(
                """IF(size(tt) >= 2,
                      transform(sequence(1, size(tt) - 1),
                        k -> named_struct('a', element_at(tt, k),
                                          'b', element_at(tt, k + 1))),
                      CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>))"""
            )
        ).alias("p")
    ).select("p.a", "p.b")
    bc = (
        bg.groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("cab"))
        .where(F.col("cab") >= PMI_MIN_COUNT)
    )
    ca = uc.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    cb = uc.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    return (
        bc.join(ca, "a")
        .join(cb, "b")
        .crossJoin(nn)
        .select(
            "a", "b", "cab", "ca", "cb",
            F.expr("cab * n * 1000000 DIV (ca * cb)")
            .cast("bigint")
            .alias("pmi_ratio_ppm"),
        )
        .orderBy(F.desc("pmi_ratio_ppm"), "a", "b")
        .limit(PMI_TOPK)
    )


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023): k-means-cluster the embedding codes,
# then drop any vector whose within-cluster similarity to an
# earlier-id vector clears the threshold.  Pairwise work happens only
# INSIDE a cluster — the clustering is what makes semantic dedup
# tractable at corpus scale.
# ---------------------------------------------------------------------------

# tau = 0.25 expressed as integer rationals: cos(a,b) >= tau  <=>
# dot > 0 AND dot^2 * 10000 >= 625 * |a|^2 * |b|^2.  Production
# SemDeDup uses tau ~ 0.9+; the tier's random embeddings have no pairs
# that high (the LSH near-dup operator measured the cos distribution),
# so the tier threshold matches NEAR_DUP_COS = 0.25 to exercise the
# drop path on real decisions.  Overflow: |dot| <= 64*127^2 ~ 1.03e6,
# dot^2*1e4 ~ 1.1e16 and 625*|a|^2*|b|^2 ~ 6.7e14 — both inside int64.
SEM_TAU2_NUM = 625     # tau^2 * SEM_TAU2_DEN
SEM_TAU2_DEN = 10000


def _sem_duck() -> str:
    dot = _qdot_chain_duck("a.q8", "b.q8")
    na2 = _qdot_chain_duck("a.q8", "a.q8")
    nb2 = _qdot_chain_duck("b.q8", "b.q8")
    return f"""
    WITH {_QZ_DUCK_CTE},
    {_kmeans_duck_ctes()},
    asg AS (SELECT vec_id, q8, cluster FROM r2 WHERE rn = 1),
    pr AS (SELECT b.vec_id AS b_id
           FROM asg a JOIN asg b
             ON a.cluster = b.cluster AND a.vec_id < b.vec_id
           WHERE ({dot}) > 0
             AND ({dot}) * ({dot}) * {SEM_TAU2_DEN}
                 >= {SEM_TAU2_NUM} * ({na2}) * ({nb2})),
    cnt AS (SELECT b_id, CAST(COUNT(*) AS BIGINT) AS n_dups_earlier
            FROM pr GROUP BY 1)
    SELECT asg.vec_id, CAST(asg.cluster AS BIGINT) AS cluster,
           COALESCE(cnt.n_dups_earlier, 0) AS n_dups_earlier,
           CASE WHEN COALESCE(cnt.n_dups_earlier, 0) > 0
                THEN 'drop' ELSE 'keep' END AS action
    FROM asg LEFT JOIN cnt ON asg.vec_id = cnt.b_id
    """


_SEM_SCHEMA = (
    "vec_id bigint, cluster bigint, n_dups_earlier bigint, action string"
)


def _sem_cluster_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-cluster earlier-duplicate counts: integer SQ8 dots, blocked
    so the pair matrix stays bounded however hot the cluster is."""
    pdf = pdf.sort_values("vec_id", kind="stable")
    q = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["q8"]])
    n = len(pdf)
    n2 = (q * q).sum(axis=1)
    counts = np.zeros(n, dtype=np.int64)
    B = 2048
    for j0 in range(0, n, B):
        qj = q[j0 : j0 + B]
        for i0 in range(0, j0 + B, B):
            if i0 >= j0 + qj.shape[0]:
                break
            qi = q[i0 : i0 + B]
            dot = qi @ qj.T  # integer matmul — exact
            cond = (dot > 0) & (
                dot * dot * SEM_TAU2_DEN
                >= SEM_TAU2_NUM * n2[i0 : i0 + B, None] * n2[None, j0 : j0 + B]
            )
            gi = np.arange(i0, i0 + qi.shape[0])
            gj = np.arange(j0, j0 + qj.shape[0])
            cond &= gi[:, None] < gj[None, :]  # strictly-earlier only
            counts[j0 : j0 + qj.shape[0]] += cond.sum(axis=0)
    return pd.DataFrame(
        {
            "vec_id": pdf["vec_id"].to_numpy(),
            "cluster": pdf["cluster"].to_numpy().astype(np.int64),
            "n_dups_earlier": counts,
            "action": np.where(counts > 0, "drop", "keep"),
        }
    )


@register("semantic_dedup", _sem_duck())
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop decisions: Lloyd-assigned k-means clusters
    over the shared SQ8 codes (same lineage kmeans_quantized_assign
    pins), then inside each cluster a vector is dropped iff some
    EARLIER vec_id clears the cosine threshold — earliest-id-wins, the
    same deterministic canonicalization the exact-dedup family uses.

    Integer-exact across engines: the threshold test is a cross-
    multiplied rational on integer dots (no sqrt, no division), so the
    Python kernel's blocked matmul and the oracle's 64-term chains
    agree bit-for-bit.

    100 TB shape: the clustering bounds the pairwise stage — vectors
    shuffle ONCE on the cluster key and candidates form inside the
    group kernel (blocked at 2048^2 so the score matrix is bounded no
    matter how hot a cluster gets); K scales with corpus size to hold
    cluster cardinality roughly constant, exactly how production
    SemDeDup shards.  Centroids broadcast; no self-join ships
    embeddings per-pair."""
    (emb,) = load(spark, sf_dir, "embeddings")
    qz = quantized_codes(_spread(emb)).select("vec_id", "q8")
    c1 = _kmeans_c1(qz)
    asg = _kmeans_assign(qz, c1, ["cluster", "q8"])
    return asg.groupBy("cluster").applyInPandas(
        _sem_cluster_kernel, schema=_SEM_SCHEMA
    )


# ---------------------------------------------------------------------------
# Unicode NFC normalization (UAX #15) — the text-fixing pass every web
# corpus needs before hashing/dedup (decomposed sequences hash
# differently from their composed forms).  Inject-then-detect: the
# tier corpus is ASCII, so deterministic decomposed suffixes are
# injected first and the operator must compose them back.
# ---------------------------------------------------------------------------

# " cafe" + COMBINING ACUTE (U+0301) + " A" + COMBINING RING (U+030A)
# + "ngstro" + "m" + COMBINING DIAERESIS would over-test; keep two
# canonical compositions whose NFC forms (é, Å) have been stable since
# Unicode 3.0 — identical under CPython's unicodedata and DuckDB's
# utf8proc.
_NFC_SUFFIX = " cafe\u0301 A\u030ang"
_NFC_EVERY = 5  # doc_id % 5 == 0 gets the decomposed suffix


def _nfc_duck() -> str:
    suffix_sql = "' cafe' || chr(769) || ' A' || chr(778) || 'ng'"
    return f"""
    WITH inj AS (SELECT doc_id,
                        CASE WHEN doc_id % {_NFC_EVERY} = 0
                             THEN text || {suffix_sql}
                             ELSE text END AS raw
                 FROM documents),
    nz AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM inj)
    SELECT doc_id,
           CAST(CASE WHEN norm <> raw THEN 1 ELSE 0 END AS BIGINT) AS changed,
           CAST(length(raw) AS BIGINT) AS len_before,
           CAST(length(norm) AS BIGINT) AS len_after,
           md5(norm) AS norm_md5
    FROM nz
    """


@register("text_normalize_stats", _nfc_duck())
def text_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC normalization with inject-then-detect verification: every
    5th doc gets a decomposed-combining-mark suffix, and the pinned
    md5-of-normalized proves the kernel composed it (e+U+0301 -> é,
    A+U+030A -> Å) while leaving untouched docs byte-identical.

    The normalization runs in an Arrow-batched pandas_udf over
    CPython's unicodedata (the canonical UAX #15 implementation); the
    oracle is DuckDB's utf8proc nfc_normalize — two independent NFC
    engines agreeing under the value hash is the point of the test.

    100 TB shape: in-row, zero shuffle; the kernel is the only Python
    in the plan and it's batch-vectorized over Arrow."""

    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    (docs,) = load(spark, sf_dir, "documents")
    inj = _spread(docs).select(
        "doc_id",
        F.when(
            F.col("doc_id") % _NFC_EVERY == 0,
            F.concat("text", F.lit(_NFC_SUFFIX)),
        )
        .otherwise(F.col("text"))
        .alias("raw"),
    )
    nz = inj.select("doc_id", "raw", nfc("raw").alias("norm"))
    return nz.select(
        "doc_id",
        F.when(F.col("norm") != F.col("raw"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("changed"),
        F.length("raw").cast("bigint").alias("len_before"),
        F.length("norm").cast("bigint").alias("len_after"),
        F.md5("norm").alias("norm_md5"),
    )
