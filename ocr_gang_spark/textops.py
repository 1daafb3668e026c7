"""Training-data-pipeline operators: dedup, similarity, text analysis.

These are first-class components of a 100TB corpus engine (dedup before
training, ANN for retrieval, quality filtering).  Every query here is
shuffle-conscious:

* minhash/simhash signatures are computed IN-ROW (array transforms over
  the token array — no explode, no shuffle) so the only shuffle is the
  final small-signature aggregation/join;
* token hashing uses md5 (bit-identical across engines/languages)
  reduced to BIGINT, so DuckDB can verify values exactly;
* the embedding dot products are emitted as explicit left-to-right
  64-term chains in both engines => bit-identical doubles, no rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .queries import load, register

EMB_DIM = 64

# (a, b) pairs for the 4 minhash permutations h' = (a*h + b) mod P
MINHASH_P = 2147483647
MINHASH_AB = [(1299721, 104729), (15485863, 32452843), (49979687, 67867967), (86028121, 982451653)]


def _tok_hash_spark(tok):
    """md5-based 32-bit token hash, Spark side (conv hex->dec)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint")


_TOK_HASH_DUCK = "('0x' || substr(md5({t}), 1, 8))::BIGINT"


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy, keep the smallest doc_id per group."""
    (docs,) = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
    )


@register(
    "dedup_fingerprint",
    """
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
           COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
    FROM documents GROUP BY 1
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized document fingerprint (lower + whitespace collapse + md5)."""
    (docs,) = load(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    return docs.groupBy(fp.alias("fp")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id")
    )


def _perm(a: int, b: int):
    # NB: factory, not a default-arg closure — pyspark derives the lambda
    # arity from the signature, so extra defaulted params would become
    # lambda-variable Columns
    return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P


def _with_token_hashes(df):
    """Materialize the md5 token-hash array once per row: Spark does not
    CSE a subexpression shared across several lambda functions, so every
    permutation/bit would otherwise re-hash every token."""
    return df.withColumn("hl", F.transform(F.split(F.col("text"), " "), _tok_hash_spark))


def _minhash_cols_spark():
    return [
        F.array_min(F.transform(F.col("hl"), _perm(a, b))).alias(f"mh{k}")
        for k, (a, b) in enumerate(MINHASH_AB)
    ]


def _minhash_exprs_duck():
    th = _TOK_HASH_DUCK.format(t="t")
    return [
        f"list_min(list_transform(string_split(text, ' '), "
        f"t -> ({a} * ({th}) + {b}) % {MINHASH_P})) AS mh{k}"
        for k, (a, b) in enumerate(MINHASH_AB)
    ]


@register(
    "minhash_signatures",
    "SELECT doc_id, " + ", ".join(_minhash_exprs_duck()) + " FROM documents",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature per doc, computed in-row (shingle->minhash with
    zero shuffle: array transforms over the token array)."""
    (docs,) = load(spark, sf_dir, "documents")
    return _with_token_hashes(docs).select("doc_id", *_minhash_cols_spark())


@register(
    "minhash_lsh_buckets",
    """
    WITH sig AS (SELECT doc_id, """ + ", ".join(_minhash_exprs_duck()) + """
                 FROM documents)
    SELECT concat(CAST(mh0 AS VARCHAR), '_', CAST(mh1 AS VARCHAR)) AS band0,
           COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
    FROM sig GROUP BY 1
    """,
)
def minhash_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: docs sharing a band bucket are near-dup candidates;
    the bucket-join replaces the O(n^2) pair scan at scale."""
    (docs,) = load(spark, sf_dir, "documents")
    sig = _with_token_hashes(docs).select("doc_id", *_minhash_cols_spark())
    band = F.concat_ws("_", F.col("mh0").cast("string"), F.col("mh1").cast("string"))
    return sig.groupBy(band.alias("band0")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc")
    )


# ---------------------------------------------------------------------------
# SimHash (16-bit, in-row)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def _bit_vote(b: int):
    return lambda acc, h: acc + (
        F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("bigint") * 2 - 1
    )


def _simhash_col_spark():
    total = F.lit(0).cast("bigint")
    for b in range(SIMHASH_BITS):
        bit_sum = F.aggregate(F.col("hl"), F.lit(0).cast("bigint"), _bit_vote(b))
        total = total + F.when(bit_sum > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("bigint")
    return total.alias("simhash16")


def _simhash_sql_duck():
    th = _TOK_HASH_DUCK.format(t="t")
    cases = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hl, h -> ((h >> {b}) & 1) * 2 - 1)) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
    WITH hl_t AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '), t -> {th}) AS hl
      FROM documents)
    SELECT doc_id, CAST({cases} AS BIGINT) AS simhash16 FROM hl_t
    """


@register("simhash_signatures", _simhash_sql_duck())
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per doc, in-row (no explode/shuffle): per bit, the
    sign of the +-1 vote sum over token hashes."""
    (docs,) = load(spark, sf_dir, "documents")
    return _with_token_hashes(docs).select("doc_id", _simhash_col_spark())


# ---------------------------------------------------------------------------
# N-gram shingles + Jaccard candidates
# ---------------------------------------------------------------------------

@register(
    "ngram_shingle_stats",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    s AS (SELECT doc_id,
                 CASE WHEN len(l) >= 3
                      THEN list_transform(range(1, len(l) - 1),
                                          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])
                      ELSE [] END AS sh
          FROM t)
    SELECT doc_id, len(sh) AS n_shingles, len(list_distinct(sh)) AS n_distinct_shingles
    FROM s
    """,
)
def ngram_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram shingling in-row; the dedup building block."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    shingles = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id",
        F.size(shingles).cast("bigint").alias("n_shingles"),
        F.size(F.array_distinct(shingles)).cast("bigint").alias("n_distinct_shingles"),
    )


@register(
    "jaccard_candidate_pairs",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    s AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(l) >= 3
                      THEN list_transform(range(1, len(l) - 1),
                                          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])
                      ELSE [] END) AS sh
          FROM t),
    e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM s),
    rare AS (SELECT shingle FROM e GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 5),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             a.n_sh AS a_n, b.n_sh AS b_n, COUNT(*) AS shared
      FROM e a JOIN rare r ON a.shingle = r.shingle
               JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT a_id, b_id, shared,
           CAST(shared AS DOUBLE) / (a_n + b_n - shared) AS jaccard_lb
    FROM pairs WHERE shared >= 2
    """,
)
def jaccard_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates via shared *rare* shingles (frequency-capped
    inverted index join — the scale-path trick that avoids O(n^2))."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    shingles = F.array_distinct(
        F.when(
            n >= 3,
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i),
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    # inverted index with the rarity filter BEFORE the postings
    # aggregation (skew safety at 100x: a stop-word-like shingle present
    # in millions of docs would otherwise materialize its whole postings
    # array inside ONE collect_list buffer -> OOM).  Two-pass: document-
    # frequency count -> keep 2..5 -> semi-join back -> collect_list,
    # whose buffers are now bounded at 5 entries by construction.  Both
    # aggregations and the semi-join hash-partition on shingle.  The
    # pairs are then generated IN-ROW from the sorted postings list (the
    # naive a JOIN rare JOIN b plan recomputed the explode three times
    # and was ~10x slower at sf0.01).  The shingle array is materialized
    # in its own projection first: size() + explode() of the raw
    # expression sit in separate Project/Generate nodes that Catalyst
    # does not CSE, so a one-step select would build the array twice.
    e = docs.select("doc_id", shingles.alias("sh")).select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    rare = (
        e.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= 5))
        .select("shingle")
    )
    postings = (
        e.join(rare, "shingle", "left_semi")
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ds"))
    )
    pair_list = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(
                    x.doc_id.alias("a_id"),
                    y.doc_id.alias("b_id"),
                    x.n_sh.alias("a_n"),
                    y.n_sh.alias("b_n"),
                ),
            ),
        )
    )
    pairs = (
        postings.select(F.explode(pair_list).alias("p"))
        .groupBy("p.a_id", "p.b_id", "p.a_n", "p.b_n")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= 2)
    )
    return pairs.select(
        "a_id", "b_id", "shared",
        (F.col("shared").cast("double") / (F.col("a_n") + F.col("b_n") - F.col("shared")))
        .alias("jaccard_lb"),
    )


# ---------------------------------------------------------------------------
# Text analysis (language-id features, quality scoring, token stats)
# ---------------------------------------------------------------------------

@register(
    "token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
           CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_token_len
    FROM documents
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) — all in-row."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks).cast("bigint")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        ((F.length("text") - (n - 1)).cast("double") / n).alias("avg_token_len"),
    )


def _substr_count_duck(s: str) -> str:
    return f"CAST((length(text) - length(replace(text, '{s}', ''))) / {len(s)} AS BIGINT)"


def _substr_count_spark(s: str):
    return ((F.length("text") - F.length(F.replace(F.col("text"), F.lit(s))))
            / len(s)).cast("bigint")


@register(
    "lang_marker_counts",
    f"""
    SELECT doc_id, lang,
           {_substr_count_duck('the')} AS cnt_the,
           {_substr_count_duck('table')} AS cnt_table,
           {_substr_count_duck('value')} AS cnt_value
    FROM documents
    """,
)
def lang_marker_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram heuristic features: marker-substring counts."""
    (docs,) = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang",
        _substr_count_spark("the").alias("cnt_the"),
        _substr_count_spark("table").alias("cnt_table"),
        _substr_count_spark("value").alias("cnt_value"),
    )


@register(
    "quality_scores",
    """
    SELECT doc_id,
           length(text) AS n_chars_actual,
           CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_lower,
           CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS n_spaces,
           CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text)
             + CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / length(text)
             AS quality
    FROM documents WHERE length(text) > 0
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: char-class ratios composed with fixed-order
    arithmetic (no transcendentals => bit-identical across engines)."""
    (docs,) = load(spark, sf_dir, "documents")
    n_lower = F.length(F.regexp_replace("text", "[^a-z]", "")).cast("bigint")
    n_spaces = F.length(F.regexp_replace("text", "[^ ]", "")).cast("bigint")
    length = F.length("text")
    return docs.where(length > 0).select(
        "doc_id",
        length.alias("n_chars_actual"),
        n_lower.alias("n_lower"),
        n_spaces.alias("n_spaces"),
        (n_lower.cast("double") / length + n_spaces.cast("double") / length).alias("quality"),
    )


# ---------------------------------------------------------------------------
# Embedding similarity search (brute-force baseline + per-label ANN + near-dup)
# ---------------------------------------------------------------------------

def _dot_chain_duck(e: str, q: str) -> str:
    return " + ".join(
        f"CAST({e}[{k+1}] AS DOUBLE) * CAST({q}[{k+1}] AS DOUBLE)" for k in range(EMB_DIM)
    )


def _dot_chain_spark(e, q):
    total = None
    for k in range(EMB_DIM):
        term = F.element_at(e, k + 1).cast("double") * F.element_at(q, k + 1).cast("double")
        total = term if total is None else total + term
    return total


def _cosine_spark(e, q):
    return _dot_chain_spark(e, q) / (
        F.sqrt(_dot_chain_spark(e, e)) * F.sqrt(_dot_chain_spark(q, q))
    )


def _cosine_duck(e: str, q: str) -> str:
    return (
        f"({_dot_chain_duck(e, q)}) / "
        f"(sqrt({_dot_chain_duck(e, e)}) * sqrt({_dot_chain_duck(q, q)}))"
    )


@register(
    "embedding_topk_cosine",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, {_cosine_duck('embedding', 'qe')} AS cos_sim
    FROM embeddings, q
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
)
def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs the vec_id=0 query vector — the ANN
    baseline.  Explicit left-to-right fold => bit-identical doubles."""
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    return (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id", _cosine_spark(F.col("embedding"), F.col("qe")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


@register(
    "ann_topk_per_label",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT label, vec_id, {_cosine_duck('embedding', 'qe')} AS cos_sim
      FROM embeddings, q)
    SELECT label, vec_id, cos_sim FROM (
      SELECT label, vec_id, cos_sim,
             row_number() OVER (PARTITION BY label ORDER BY cos_sim DESC, vec_id) AS rn
      FROM scored) t
    WHERE rn <= 3
    """,
)
def ann_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed search: label = coarse partition, exact top-k
    within each bucket (the scale path computes only the probed bucket)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        "label", "vec_id", _cosine_spark(F.col("embedding"), F.col("qe")).alias("cos_sim")
    )
    w = W.partitionBy("label").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("label", "vec_id", "cos_sim")
    )


@register(
    "embedding_near_dup_pairs",
    f"""
    WITH sub AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 128)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           {_cosine_duck('a.embedding', 'b.embedding')} AS cos_sim
    FROM sub a JOIN sub b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cosine_duck('a.embedding', 'b.embedding')} > 0.9
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection, bucketed by label so the
    pair join is per-bucket (the O(n^2) cross join never materializes)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    sub = emb.where(F.col("vec_id") < 128).select("vec_id", "label", "embedding")
    a = sub.alias("a")
    b = sub.alias("b")
    cos = _cosine_spark(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id"),
                cos.alias("cos_sim"))
        .where(F.col("cos_sim") > 0.9)
    )
