"""Direct pins for textops rules the synthetic corpus cannot
exercise: NULL-signature banding exclusion and oversized-bucket
star dedup (both code-review fixes whose oracles are blind to the
defect by construction)."""


def test_short_docs_are_not_banded_and_pass_as_novel(spark):
    """Docs too short to shingle (NULL minhash) must be EXCLUDED from
    LSH banding — the old 'x' sentinel gave every short doc the same
    band key in all bands, flagging any short incoming doc as a
    duplicate of any unrelated short indexed doc (code-review fix).
    Also pins that un-signable incoming docs still surface as 'novel'
    rather than vanishing from the decision output."""
    from pyspark.sql import functions as F

    from ocr_gang_spark.textops import _banded

    two_short = spark.createDataFrame(
        [(1, None), (2, None), (3, 42)],
        "doc_id bigint, mh0 bigint",
    )
    # _banded needs the full mh set; build a 1-perm-like frame by
    # aliasing mh0 into every expected column
    from ocr_gang_spark.textops import LSH_BANDS, LSH_ROWS

    sig = two_short.select(
        "doc_id",
        *[F.col("mh0").alias(f"mh{k}") for k in range(LSH_BANDS * LSH_ROWS)],
    )
    out = _banded(sig)
    assert out.where(F.col("doc_id") != 3).count() == 0  # NULLs excluded
    assert out.where(F.col("doc_id") == 3).count() == LSH_BANDS


def test_oversized_bucket_members_still_dedup_via_star_edges(spark):
    """A bucket larger than DEDUP_MAX_BUCKET must still produce
    verified pairs — as O(bucket) star edges to the bucket keeper —
    instead of being silently exempted (code-review fix: the most
    heavily duplicated content lives in exactly those buckets)."""
    from pyspark.sql import functions as F

    from ocr_gang_spark.textops import DEDUP_MAX_BUCKET, verified_pairs_from

    n = DEDUP_MAX_BUCKET + 6
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id bigint, text string"
    )
    pairs = verified_pairs_from(docs)
    got = pairs.select("a_id", "b_id").collect()
    # every member links to keeper 0 with jaccard 1.0; dedup keeps ONE
    assert {(r.a_id, r.b_id) for r in got} == {(0, i) for i in range(1, n)}
    assert pairs.where(F.col("jac") < 1.0).count() == 0


def _py_lev(a, b):
    """Textbook Levenshtein over arbitrary element sequences."""
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def test_ocr_error_rates_wer_encoding(spark):
    """The WER char-encoding trick (token -> one ASCII char by joint-
    vocab rank) must equal TRUE token-level Levenshtein, and the
    encoding must stay single-byte ASCII (DuckDB levenshtein counts
    bytes, Spark counts codepoints — they only agree inside ASCII).
    Cross-checked against an independent pure-Python DP on the token
    sequences themselves, not on any encoding."""
    from ocr_gang_spark.textops import ocr_error_rates

    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in ocr_error_rates(spark, sf).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    import re as _re

    checked = 0
    for doc_id, truth in docs.items():
        cls = doc_id % 4
        if cls == 0:
            hyp = truth.replace("table", "tbale")
        elif cls == 1:
            hyp = _re.sub(r" ?\ba\b ?", " ", truth)
        elif cls == 2:
            hyp = "noise " + truth
        else:
            hyp = truth
        tt, ht = truth.split(" "), hyp.split(" ")
        # ASCII guard: joint vocab must fit in chr(33..126)
        assert len(set(tt) | set(ht)) <= 94
        row = out[doc_id]
        assert row["word_edits"] == _py_lev(tt, ht), doc_id
        assert row["char_edits"] == _py_lev(truth, hyp), doc_id
        assert row["wer_ppm"] == row["word_edits"] * 1_000_000 // len(tt)
        checked += 1
    assert checked == len(out) > 0
    # every corruption class occurs and the clean class is exactly zero
    classes = {r["corruption_class"] for r in out.values()}
    assert classes == {0, 1, 2, 3}
    assert all(r["char_edits"] == 0 for r in out.values()
               if r["corruption_class"] == 3)


def test_wer_big_vocab_returns_value_not_error(spark):
    """> 94-token joint vocab: r4 failed the job loudly (assert_true);
    round 5 computes the exact token-level DP instead (VERDICT r4 next
    #4).  A 150-token-vocab doc and a small doc ride the SAME frame —
    the small one through the untouched ASCII branch, the big one
    through the kernels/editdist.py branch — and both must equal the
    independent textbook DP over the raw token sequences."""
    from ocr_gang_spark.textops import _error_rate_frame

    # doc_id % 4 == 3 -> clean class (hyp == truth) keeps hand-checking
    # easy; doc_id % 4 == 1 -> 'a'-deletion class exercises real edits
    big_truth = " ".join(f"w{i:03d}" for i in range(150))  # 150-tok vocab
    small_truth = "the a table of a data"
    docs = spark.createDataFrame(
        [(3, big_truth), (401, big_truth), (5, small_truth)],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in _error_rate_frame(docs).collect()}
    assert set(out) == {3, 401, 5}

    import re as _re

    for doc_id, truth in [(3, big_truth), (401, big_truth), (5, small_truth)]:
        hyp = (_re.sub(r" ?\ba\b ?", " ", truth)
               if doc_id % 4 == 1 else truth)
        tt, ht = truth.split(" "), hyp.split(" ")
        row = out[doc_id]
        assert row["word_edits"] == _py_lev(tt, ht), doc_id
        assert row["char_edits"] == _py_lev(truth, hyp), doc_id
        assert row["wer_ppm"] == row["word_edits"] * 1_000_000 // len(tt)
        assert row["cer_ppm"] == row["char_edits"] * 1_000_000 // len(truth)
    # the big clean doc is exactly zero edits; vocab genuinely > 94
    assert out[3]["word_edits"] == 0
    assert len(set(big_truth.split(" "))) == 150 > 94


def test_wer_oracle_guard_fires_on_big_vocab(tmp_path):
    """The DuckDB oracle mirrors only the ASCII branch; on a > 94-token
    joint vocab it must ERROR with a diagnostic naming the doc (review
    fix) — not silently return byte-inflated word_edits that would show
    up as an unexplained hash mismatch against the engine's correct DP
    branch."""
    import duckdb
    import pandas as pd
    import pytest

    from ocr_gang_spark.contract import oracle_sql

    big = " ".join(f"tok{i:03d}" for i in range(120))
    pd.DataFrame(
        {"doc_id": [7], "text": [big], "lang": ["en"],
         "source": ["s"], "n_chars": [len(big)]}
    ).to_parquet(tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    with pytest.raises(Exception, match="exceeds 94 tokens"):
        con.execute(oracle_sql()["ocr_error_rates"]).fetchall()


def test_token_levenshtein_kernel_matches_textbook():
    """Property pin for kernels/editdist.py: the vectorized prefix-min
    DP equals the textbook double loop on random token sequences,
    including empties and repeated symbols."""
    import random

    from ocr_gang_spark.kernels.editdist import token_levenshtein

    rng = random.Random(11)
    for _ in range(300):
        vocab = [f"t{k}" for k in range(rng.randint(1, 8))]
        a = [rng.choice(vocab) for _ in range(rng.randint(0, 15))]
        b = [rng.choice(vocab) for _ in range(rng.randint(0, 15))]
        assert token_levenshtein(a, b) == _py_lev(a, b), (a, b)
    assert token_levenshtein([], []) == 0
    assert token_levenshtein(["x"], []) == 1
    assert token_levenshtein([], ["x", "y"]) == 2


def test_bpe_memo_hit_rate_measured():
    """Memo economics of bpe_encode_large_vocab, measured not assumed
    (VERDICT r4 next #7): the kernel's throughput rests on Zipf making
    the per-word Python encode rare.  Drive the factored batch encoder
    over the sf0.001 documents and pin that (a) the hit-rate is high,
    (b) misses == distinct words (each word encoded exactly once per
    task) — the invariant the executor-log line reports in production."""
    import pyarrow.parquet as pq

    from ocr_gang_spark.textops import _bpe_encode_pdf, build_large_merge_table

    pdf = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    rank = {p: i for i, p in enumerate(build_large_merge_table())}
    memo, stats = {}, {"lookups": 0, "hits": 0}
    out = _bpe_encode_pdf(pdf, rank, memo, stats)
    assert len(out) == len(pdf)
    assert stats["lookups"] > 0
    rate = stats["hits"] / stats["lookups"]
    assert rate > 0.95, rate  # 31-word vocabulary over ~30k instances
    assert len(memo) == stats["lookups"] - stats["hits"]


def _bpe_inorder_passes(word, merges):
    """Reference semantics of the fold encoder: every merge of the
    table, in order, as one full greedy left-to-right pass."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_large_vocab_encoder_matches_fold_encoder(spark):
    """The Arrow-kernel 50k-table encoder must be BYTE-identical to the
    fold-based 6-merge encoder on the tier corpus (the big table's
    synthetic tail is inert by construction — disjoint alphabet)."""
    from ocr_gang_spark.textops import bpe_encode_large_vocab, bpe_encode_stats

    sf = "/root/testdata/sf0.001"
    a = {r["doc_id"]: tuple(r) for r in bpe_encode_stats(spark, sf).collect()}
    b = {r["doc_id"]: tuple(r)
         for r in bpe_encode_large_vocab(spark, sf).collect()}
    assert a == b and len(a) > 0


def test_bpe_rank_priority_equals_inorder_passes_on_wellformed_tables():
    """The kernel's rank-priority loop visits only occurring merges;
    its equivalence to the fold's in-order full passes holds for
    WELL-FORMED tables (each merge's parts are base symbols or earlier
    results — no merge can create an earlier-ranked pair) with UNIQUE
    result strings (trained tables have both by construction; round-4
    review showed the uniqueness half is load-bearing, see the negative
    test below).  Property-checked over random such tables and random
    words, so the equivalence claim doesn't rest on the 6-merge tier
    table alone."""
    import numpy as np

    from ocr_gang_spark.textops import bpe_encode_word

    rng = np.random.default_rng(11)
    alphabet = list("abcd")
    for trial in range(200):
        symbols = list(alphabet)
        merges = []
        seen = set()
        results = set()
        for _ in range(int(rng.integers(1, 12))):
            a = symbols[int(rng.integers(len(symbols)))]
            b = symbols[int(rng.integers(len(symbols)))]
            if (a, b) in seen or a + b in results:
                continue
            seen.add((a, b))
            results.add(a + b)
            merges.append((a, b))
            symbols.append(a + b)
        rank = {p: i for i, p in enumerate(merges)}
        word = "".join(
            alphabet[int(rng.integers(len(alphabet)))]
            for _ in range(int(rng.integers(0, 14)))
        )
        assert bpe_encode_word(word, rank) == _bpe_inorder_passes(
            word, merges
        ), (word, merges)


def test_bpe_duplicate_result_strings_break_equivalence_and_are_rejected():
    """Negative pin for the equivalence claim's boundary (round-4
    review): a table whose parts are all base symbols or earlier
    results but where two merges share a surface result — ('d','dd')
    and ('dd','d') both make 'ddd' — makes the rank-priority encoder
    and the in-order-pass reference genuinely diverge on 'ddcddda'.
    build_large_merge_table therefore dedups RESULT strings, not just
    pairs, and asserts the invariant."""
    from ocr_gang_spark.textops import (
        build_large_merge_table,
        bpe_encode_word,
    )

    merges = [("d", "d"), ("d", "dd"), ("ddd", "a"), ("dd", "d")]
    rank = {p: i for i, p in enumerate(merges)}
    word = "ddcddda"
    assert bpe_encode_word(word, rank) != _bpe_inorder_passes(word, merges)
    # the shipped 50k table is result-unique by construction
    table = build_large_merge_table()
    assert len({a + b for a, b in table}) == len(table)


def test_bpe_large_table_tail_fires_on_its_own_alphabet():
    """The 49,994 synthetic merges are not dead weight in the kernel:
    fed a word over THEIR alphabet, the encoder applies them (and in
    rank order — equal to the in-order-pass reference on the full
    table)."""
    from ocr_gang_spark.textops import (
        BPE_LARGE_VOCAB_SIZE,
        bpe_encode_word,
        build_large_merge_table,
    )

    table = build_large_merge_table()
    assert len(table) == BPE_LARGE_VOCAB_SIZE
    rank = {p: i for i, p in enumerate(table)}
    # build a word from the first synthetic merge's parts: it must fire
    a, b = table[6]  # first synthetic entry after the 6 real merges
    word = a + b + a + b
    got = bpe_encode_word(word, rank)
    assert a + b in got  # the tail merge applied
    assert got == _bpe_inorder_passes(word, table)
    # and corpus-alphabet words never touch the tail
    assert bpe_encode_word("table", rank) == _bpe_inorder_passes(
        "table", table[:6]
    )


def test_hll_small_range_correction_regimes(spark):
    """The linear-counting regime switch must actually help where it
    fires: on the ~31-token vocab scope the RAW m=64 estimator is off
    by ~2x while the corrected estimate lands within 10% of exact; on
    the shingle scope (thousands of distinct) no empty registers exist
    and corrected == raw.  The registry oracle pins exact values; this
    pins the SEMANTIC claim the correction was added for (VERDICT r3
    #5)."""
    from ocr_gang_spark.textops import hll_distinct_sketch

    rows = hll_distinct_sketch(spark, "/root/testdata/sf0.001").collect()
    by = {(r["lang"], r["scope"]): r for r in rows}
    assert len(by) == len(rows) and len(rows) >= 4
    fired = big = 0
    for (lang, scope), r in by.items():
        if scope == "token":
            assert r["n_empty_buckets"] > 0
            raw_err = abs(r["hll_est"] - r["n_distinct_exact"])
            cor_err = abs(r["hll_est_corrected"] - r["n_distinct_exact"])
            assert cor_err < raw_err  # strictly better where it fires
            assert cor_err <= 0.10 * r["n_distinct_exact"]
            fired += 1
        else:
            assert r["n_empty_buckets"] == 0
            assert r["hll_est_corrected"] == r["hll_est"]
            big += 1
    assert fired > 0 and big > 0


def test_ocr_error_rates_vocab_ceiling_via_registered_query(spark, tmp_path):
    """Lifecycle of the 94-token ASCII ceiling: r3 shipped it as a
    silent hazard, r4 as a loud assert_true failure, round 5 COMPLETES
    it — a document whose joint vocabulary exceeds 94 tokens now routes
    through the exact token-level DP branch of the REGISTERED query and
    returns a correct value instead of erroring (VERDICT r4 next #4;
    the constructed-frame variant is test_wer_big_vocab_returns_value_
    not_error, this one drives the registry entry end to end on a
    written parquet tier)."""
    import pandas as pd

    from ocr_gang_spark.textops import ocr_error_rates

    big = " ".join(f"tok{i:03d}" for i in range(120))  # 120 distinct
    ok = "alpha beta gamma alpha"
    pd.DataFrame(
        {"doc_id": [7, 8], "text": [big, ok], "lang": ["en", "en"],
         "source": ["synthetic"] * 2, "n_chars": [len(big), len(ok)]}
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {r["doc_id"]: r for r in ocr_error_rates(spark, str(tmp_path)).collect()}
    assert set(rows) == {7, 8}
    # doc 7: class 3 (clean) -> zero edits, computed by the DP branch
    assert rows[7]["word_edits"] == 0 and rows[7]["char_edits"] == 0
    assert rows[7]["n_truth_tokens"] == 120
    # doc 8: class 0 (typo swap; no 'table' present -> also zero) via
    # the untouched ASCII branch
    assert rows[8]["word_edits"] == 0
