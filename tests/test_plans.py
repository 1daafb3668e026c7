"""Physical-plan guards: the optimizations the 100TB design depends on
must be visible in the plan, or a refactor silently regresses them.

Checks .explain(formatted/simple) output for: parquet filter pushdown +
column pruning, broadcast of small dims, SHUFFLE_HASH (never sort) for
blob joins, and explicit parallelism of the CPU-bound OCR stage.
"""

import pytest

from ocr_gang_spark.pipeline import (
    broadcast_weights,
    explode_spans,
    extract_media_spans,
)
from ocr_gang_spark.queries import q1_pricing_summary, q3_top_orders
from ocr_gang_spark.synth import synth_documents, synth_media

SF = "/root/testdata/sf0.001"


def plan_of(df, mode="formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = plan_of(q1_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 11-column table scans only the 6 needed columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read_schema
    for col in ("l_partkey", "l_suppkey", "l_tax", "l_linenumber"):
        assert col not in read_schema


def test_q3_broadcasts_customer_dim(spark):
    plan = plan_of(q3_top_orders(spark, SF), mode="simple")
    assert "BroadcastHashJoin" in plan


def test_media_join_is_shuffle_hash_not_sort_merge(spark):
    """Sorting blob-sized rows is a scale hazard — pin the join strategy."""
    docs = synth_documents(spark, 8, seed=1)
    media = synth_media(spark, docs)
    df = extract_media_spans(explode_spans(docs), media, broadcast_weights(spark))
    plan = plan_of(df, mode="simple")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # blobs are never broadcast
    assert "BroadcastHashJoin" not in plan


def test_media_branch_has_explicit_parallelism(spark):
    """The CPU-bound OCR stage must not be at the mercy of AQE's
    byte-based coalescing: both join inputs carry an explicit
    repartitioning on media_ref."""
    docs = synth_documents(spark, 8, seed=1)
    media = synth_media(spark, docs)
    df = extract_media_spans(explode_spans(docs), media, broadcast_weights(spark))
    plan = plan_of(df, mode="formatted")
    assert plan.count("REPARTITION_BY_NUM") >= 2 or plan.count("hashpartitioning(media_ref") >= 2


def test_jaccard_rarity_filter_precedes_postings_collect(spark):
    """Skew guard: the document-frequency filter (2..5) must run BEFORE
    the collect_list postings aggregation — a frequent shingle must never
    reach a collect_list buffer (VERDICT r1 finding 1).  In the optimized
    plan that shows as a LeftSemi join *below* the collect_list aggregate
    (treeString prints parents before children)."""
    from ocr_gang_spark.textops import jaccard_candidate_pairs

    plan = plan_of(jaccard_candidate_pairs(spark, SF), mode="simple")
    assert "collect_list" in plan and "LeftSemi" in plan
    assert plan.index("collect_list") < plan.index("LeftSemi")


def test_jaccard_splits_text_once_per_branch(spark):
    """CSE guard: the shingle pipeline must split the text exactly once
    per scan branch.  Catalyst neither CSEs subexpressions into lambda
    bodies nor stops the explode's synthesized size()>0 pre-filter from
    being pushed (and re-inlined) below the materializing projections —
    both regressions reintroduce an O(tokens x shingles)-per-row
    re-split that measured ~7x on the whole query."""
    from ocr_gang_spark.textops import jaccard_candidate_pairs

    plan = plan_of(jaccard_candidate_pairs(spark, SF), mode="formatted")
    # two scan branches (postings side + rarity side) => exactly two
    # split calls in the whole plan
    assert plan.count("split(text") == 2, plan.count("split(text")


def test_dedup_pipeline_bucket_bound_precedes_collect(spark):
    """The end-to-end dedup pipeline must bound bucket state BEFORE
    materializing postings: the 2..DEDUP_MAX_BUCKET size filter shows as
    a LeftSemi join *below* the collect_list aggregate (treeString
    prints parents before children), so a degenerate bucket can never
    reach a collect_list buffer or emit O(bucket^2) pairs."""
    from ocr_gang_spark.textops import dedup_pipeline_decisions

    plan = plan_of(dedup_pipeline_decisions(spark, SF), mode="simple")
    assert "collect_list" in plan and "LeftSemi" in plan
    assert plan.index("collect_list") < plan.index("LeftSemi")


def test_near_dup_is_grouped_not_self_joined(spark):
    """The LSH near-dup must pair within bucket GROUPS (one grouped
    Python stage after one shuffle), never via embedding-carrying
    self-joins: a join re-runs the Python prep per side and ships
    O(pairs x dim) through the exchange."""
    from ocr_gang_spark.textops import embedding_near_dup_pairs

    plan = plan_of(embedding_near_dup_pairs(spark, SF), mode="simple")
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan


def test_ann_ivf_broadcasts_coarse_index(spark):
    """The probed IVF search must broadcast the small sides (reps,
    probe key, query vector) into the embeddings scan, never the
    reverse."""
    from ocr_gang_spark.textops import ann_ivf_probe_topk

    plan = plan_of(ann_ivf_probe_topk(spark, SF), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ann_ivf_multiprobe_broadcasts_coarse_index(spark):
    """Multi-probe IVF keeps the probe-one shape at every fan-out: the
    centroid ranking (coarse index), probe keys, query vector, and the
    k-row exact set for the recall column are ALL broadcast — the
    embeddings relation is never shuffled as a join side."""
    from ocr_gang_spark.textops import ann_ivf_multiprobe_topk

    plan = plan_of(ann_ivf_multiprobe_topk(spark, SF), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_extraction_metrics_partial_aggregation(spark):
    """groupBy must show a map-side partial aggregate (HashAggregate
    appears above and below the exchange)."""
    from ocr_gang_spark.queries import load
    from pyspark.sql import functions as F

    (li,) = load(spark, SF, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = plan_of(df, mode="simple")
    assert plan.count("HashAggregate") >= 2


def test_bucketed_media_join_shuffles_only_probe_side(spark, tmp_path):
    """write_bucketed persists the media_ref hash partitioning, so a
    later join reads buckets in place: the plan must carry exactly ONE
    Exchange (probe side) and scan the bucketed table as bucketed."""
    from pyspark.sql import functions as F

    from ocr_gang_spark.bucketing import bucketed_table, write_bucketed

    docs = synth_documents(spark, 60, seed=7)
    media = synth_media(spark, docs)
    try:
        write_bucketed(media, "t_media_bucketed", "media_ref", 8,
                       path=str(tmp_path / "media_bucketed"))
        spans = (
            explode_spans(docs)
            .where(F.col("kind") == "media")
            .select("doc_id", "media_ref")
        )
        # force a shuffle join (the test table is broadcast-small)
        joined = spans.hint("merge").join(
            bucketed_table(spark, "t_media_bucketed"), "media_ref"
        )
        # simple mode prints each node once (formatted repeats nodes in
        # the detail section, double-counting); Bucketed flag only shows
        # in formatted mode
        simple = plan_of(joined, mode="simple")
        assert simple.count("Exchange") == 1, simple
        assert "Bucketed: true" in plan_of(joined)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_media_bucketed")


def test_quality_filter_is_single_scan_no_shuffle(spark):
    """The composite quality filter must stay one codegen'd scan+project
    with a pruned ReadSchema — any Exchange here means a refactor turned
    a 100TB-safe in-row filter into a shuffle."""
    from ocr_gang_spark.textops import quality_filter_decisions

    plan = plan_of(quality_filter_decisions(spark, SF))
    assert "Exchange" not in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema


def test_tfidf_broadcasts_vocabulary_df(spark):
    """The tf-df join must broadcast the vocabulary-sized df side; a
    SortMergeJoin here means the token-count relation gets sorted on a
    corpus-scale key."""
    from ocr_gang_spark.textops import tfidf_top_terms

    plan = plan_of(tfidf_top_terms(spark, SF), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_curation_aggs_are_map_side_combined(spark):
    """url_domain_stats and chunk_dedup are explode -> groupBy pipelines;
    the count aggregation must partial-combine before the exchange
    (HashAggregate above AND below), or the explode's row multiplication
    crosses the shuffle unreduced."""
    from ocr_gang_spark.textops import chunk_dedup, url_domain_stats

    for q in (url_domain_stats, chunk_dedup):
        plan = plan_of(q(spark, SF), mode="simple")
        assert plan.count("HashAggregate") >= 2, q.__name__


def test_sequence_pack_scan_never_single_partitions_data(spark):
    """The global cumulative sum must be the two-level prefix scan:
    the data-sized window partitions by scan bucket (hash exchange),
    the bucket-offset table broadcasts back, and the only
    SinglePartition exchange feeds the tiny level-2 window (one row
    per SEQ_PACK_SCAN_BUCKET docs) — a naive unpartitioned window
    would move EVERY row to one task."""
    from ocr_gang_spark.textops import sequence_pack_bins

    plan = plan_of(sequence_pack_bins(spark, SF), mode="simple")
    assert "hashpartitioning(bkt" in plan
    assert "BroadcastHashJoin" in plan
    # the doc-level window runs under the bucket hash partitioning,
    # never under the SinglePartition exchange: the plan has exactly
    # one SinglePartition (the bucket-sums window input)
    assert plan.count("Exchange SinglePartition") == 1


def test_asof_join_is_joinless(spark):
    """The as-of join must stay the union-window plan: one hash
    exchange + sort + window, ZERO join operators (the naive range
    join is quadratic per user)."""
    from ocr_gang_spark.queries import events_asof_join

    plan = plan_of(events_asof_join(spark, SF), mode="simple")
    assert "Window" in plan
    assert "hashpartitioning(user_id" in plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert j not in plan, j


def test_decontaminate_broadcasts_bench_shingles(spark):
    """The benchmark shingle set must broadcast into the corpus scan as
    a left-semi hash join — the 100TB corpus side never shuffles for
    the membership test."""
    from ocr_gang_spark.textops import decontaminate_overlap

    plan = plan_of(decontaminate_overlap(spark, SF), mode="simple")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    for j in ("SortMergeJoin", "ShuffledHashJoin"):
        assert j not in plan, j


def test_domain_quota_first_window_is_salted(spark):
    """Phase 1 of the quota sample must rank within (source, salt) so a
    hot domain spreads over DOMAIN_QUOTA_SALTS reducers; only the
    bounded survivors (<= salts x Q per source) reach the per-source
    window."""
    from ocr_gang_spark.textops import domain_quota_sample

    plan = plan_of(domain_quota_sample(spark, SF), mode="simple")
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning(source" in ln
    ]
    assert len(exchanges) == 2, exchanges
    # plans print top-down: the DEEPEST (executed-first) exchange is the
    # salted one; the final per-source exchange sees only survivors
    assert "salt" in exchanges[-1] and "salt" not in exchanges[0]
    # both window ranks are additionally map-side bounded before their
    # exchange (Spark's WindowGroupLimit Partial — rank<=Q pushes into
    # the map side, so no partition ever ships an unbounded domain)
    assert plan.count("WindowGroupLimit") == 4
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan, j


def test_unigram_lm_vocab_broadcasts_and_tiers_partition_by_lang(spark):
    """The vocab/frequency table must broadcast into the token stream
    (the corpus side never shuffles for the lookup) and the tercile
    window must partition by lang so languages rank in parallel."""
    from ocr_gang_spark.textops import unigram_lm_tiers

    plan = plan_of(unigram_lm_tiers(spark, SF), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(lang" in plan


def test_mixture_window_only_over_domain_aggregate(spark):
    """The SinglePartition window must sit ABOVE the per-source hash
    aggregate (normalizing a #domains-row table), never over documents;
    the corpus side is one map-side-combined groupBy(source)."""
    from ocr_gang_spark.textops import domain_mixture_weights

    plan = plan_of(domain_mixture_weights(spark, SF), mode="simple")
    assert plan.count("Exchange SinglePartition") == 1
    # the single-partition exchange feeds on the source aggregate's
    # shuffle, so both must be present and the agg below the window
    assert "hashpartitioning(source" in plan
    assert plan.index("Exchange SinglePartition") < plan.index(
        "hashpartitioning(source"
    )


def test_bpe_merge_topk_is_take_ordered_not_global_sort(spark):
    """The vocab^2-bounded pair table must reach the driver via
    TakeOrderedAndProject (per-partition partial top-k), never via an
    Exchange SinglePartition + global Sort."""
    from ocr_gang_spark.textops import bpe_merge_pairs

    plan = plan_of(bpe_merge_pairs(spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_bm25_prunes_at_scan_and_broadcasts_stats(spark):
    """Docs without any query term must be dropped AT THE SCAN (the
    inferred size(filter(...)) > 0 predicate reaches the FileScan's
    DataFilters), term-df and corpus totals broadcast back, and the
    top-k is TakeOrderedAndProject — never a global sort."""
    from ocr_gang_spark.textops import bm25_retrieval_topk

    plan = plan_of(bm25_retrieval_topk(spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert any("size(filter(split" in ln for ln in scan_lines), scan_lines


def test_kmeans_broadcasts_centroids_and_argmin_is_aggregate(spark):
    """Every Lloyd assignment must broadcast the K centroids (never
    shuffle the points for the join) and take the per-vector argmin
    via a map-side-combinable min(struct) aggregate, not a row_number
    window over all K candidate rows."""
    from ocr_gang_spark.textops import kmeans_quantized_assign

    plan = plan_of(kmeans_quantized_assign(spark, SF), mode="simple")
    assert "BroadcastNestedLoopJoin" in plan  # crossJoin(broadcast(cents))
    assert "Window" not in plan
    assert "partial_min" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_kmeans_broadcasts_index_and_takeordered_topk(spark):
    """The trained-IVF search must never shuffle the member table as a
    join input: the probe clusters and query code enter the fine scan
    as LITERALS (the collected index artifact), the recall join is a
    broadcast of the k-row exact set, and top-k + exhaustive baseline
    are TakeOrderedAndProject."""
    from ocr_gang_spark.textops import ann_ivf_kmeans_topk

    plan = plan_of(ann_ivf_kmeans_topk(spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_iterations_read_graph_from_cache(spark):
    """The doc-scale work is building the edge list + node set ONCE;
    the power iterations must run on the persisted domain-sized graph.
    Every per-iteration reference to edges/out-degrees/nodes must be an
    InMemoryTableScan (un-persisted, each round re-embeds the edge-build
    subtree and rescans the corpus — the regression this pins out).
    NB: raw FileScan line counts overcount here because every
    InMemoryRelation echoes its cached child plan in the explain text."""
    from ocr_gang_spark.textops import PR_ITERS, pagerank_domains

    plan = plan_of(pagerank_domains(spark, SF), mode="simple")
    # >= 3 graph-frame reads per iteration (ew, outd, nodes_n) plus the
    # final select; all from cache.  (Join strategy between the cached
    # domain-sized frames is left to the planner: at 20 rows AQE
    # broadcasts, at 10^8 domains a co-partitioned shuffle join is
    # exactly right — neither is a regression.)
    assert plan.count("InMemoryTableScan") >= 3 * PR_ITERS


def test_snapshot_diff_is_union_aggregate_not_join(spark):
    """The two-version diff must be a tag-union + one map-side-
    combinable groupBy(doc_id), never a full-outer join of the
    snapshots — and the pivot must stay a HashAggregate (BIGINT
    fingerprints; max(string) md5s silently degrade it to
    SortAggregate, which adds a per-partition sort of the corpus)."""
    from ocr_gang_spark.textops import corpus_snapshot_diff

    plan = plan_of(corpus_snapshot_diff(spark, SF), mode="simple")
    assert "Join" not in plan
    assert "Union" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "SortAggregate" not in plan


def test_image_phash_dedup_single_exchange_hash_agg(spark):
    """Decode+hash is a shuffle-free Arrow kernel; the only exchange is
    the map-side-combined groupBy on the (64-bit perceptual, exact
    verify) pair, and it must stay a HashAggregate.  The in-bucket
    verification is a GROUP KEY, not a second pass — adding it must not
    add a shuffle or a join."""
    from ocr_gang_spark.media_queries import image_phash_dedup

    plan = plan_of(image_phash_dedup(spark, SF), mode="simple")
    assert "hashpartitioning(phash" in plan
    # exactly two exchanges: synth_media's render-spread repartition
    # (pre-kernel, on refs only) + the groupBy shuffle — the verify key
    # must not have added a third
    assert plan.count("Exchange") == 2
    assert "SortAggregate" not in plan
    assert "Join" not in plan


def test_line_dedup_broadcasts_frequent_lines(spark):
    """The heavy-hitter rejoin must broadcast the frequent-line set —
    a sort-merge join here would shuffle the full corpus line table a
    second time."""
    from ocr_gang_spark.textops import line_dedup_stats

    plan = plan_of(line_dedup_stats(spark, SF), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_decontaminate_corpus_side_never_shuffle_joins(spark):
    """Phase 1 must reach the corpus as a broadcast of ONE bloom row
    (nested-loop over a single-row build side) — never a shuffle join;
    phase 2's exact confirm must be a broadcast semi join."""
    from ocr_gang_spark.textops import decontaminate_bloom

    plan = plan_of(decontaminate_bloom(spark, SF), mode="simple")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bloom crossJoin
    assert "BroadcastHashJoin" in plan  # exact-confirm semi join


def test_zorder_layout_no_global_sort_no_window(spark):
    """The Morton fold is in-row and bucket stats are hash aggregates —
    a window or single-partition sort here would serialize the write
    path at scale.  The only SinglePartition exchanges are the two
    scalar min/max normalization aggregates (partial-agg'd: only four
    counters per task cross them, never rows)."""
    from ocr_gang_spark.textops import zorder_layout_stats

    plan = plan_of(zorder_layout_stats(spark, SF), mode="simple")
    assert "Window" not in plan
    assert "Sort" not in plan.replace("SortMergeJoin", "")
    assert plan.count("Exchange SinglePartition") == 2
    # bucket stats are real hash aggregates with map-side combine
    assert "partial_min(x" in plan and "partial_max(y" in plan


def test_c4_line_filter_zero_shuffle(spark):
    """C4 cleaning is one in-row projection: any Exchange/explode here
    would put a shuffle under an embarrassingly-parallel 100 TB pass."""
    from ocr_gang_spark.textops import c4_line_filter_stats

    plan = plan_of(c4_line_filter_stats(spark, SF), mode="simple")
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode — lines stay in-row


def test_dup_substring_text_never_hash_shuffles(spark):
    """ExactSubstr dedup: only the narrow (doc_id, k, h) triple may
    cross a hash exchange — a text column in one means the corpus
    payload is shuffling, which is the scale-killer this plan avoids.
    (The one RoundRobin carrying text is _spread's input-parallelism
    correction on the single-row-group testdata, a no-op at scale.)"""
    from ocr_gang_spark.textops import dup_substring_spans

    plan = plan_of(dup_substring_spans(spark, SF), mode="simple")
    assert "Window" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line, line


def test_semantic_dedup_grouped_not_self_joined(spark):
    """SemDeDup pairs must form INSIDE the cluster groups (one grouped
    Python stage after one hash shuffle on the cluster key), never via
    a code-carrying self-join; the only joins allowed are the broadcast
    centroid assignment."""
    from ocr_gang_spark.sketch_queries import semantic_dedup

    plan = plan_of(semantic_dedup(spark, SF), mode="simple")
    assert "FlatMapGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_cms_registers_partial_agg_and_broadcast_probe(spark):
    """The count-min register build must be map-side combined (the
    whole point: D*W rows cross the exchange, not the token stream),
    and the top-k probe joins against the BROADCAST register table."""
    from ocr_gang_spark.sketch_queries import cms_heavy_hitters

    df = cms_heavy_hitters(spark, SF)
    assert "partial_count" in plan_of(df, mode="formatted")
    assert "BroadcastHashJoin" in plan_of(df, mode="simple")


def test_cooc_pmi_topk_is_take_ordered(spark):
    """Collocation top-k must be TakeOrderedAndProject (per-partition
    partial top-k), never a global sort of the scored bigram table."""
    from ocr_gang_spark.sketch_queries import cooc_pmi_topk

    plan = plan_of(cooc_pmi_topk(spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan


def test_nfc_normalize_zero_shuffle(spark):
    """NFC normalization is one in-row Arrow-batched projection: no
    hash exchange, no explode (the only Exchange allowed is _spread's
    RoundRobin input-parallelism correction on tier data)."""
    from ocr_gang_spark.sketch_queries import text_normalize_stats

    plan = plan_of(text_normalize_stats(spark, SF), mode="simple")
    assert "Exchange hashpartitioning" not in plan
    assert "Generate" not in plan
    assert "ArrowEvalPython" in plan  # the kernel is Arrow-batched


def test_quality_classifier_zero_shuffle_no_udf(spark):
    """fastText-style classifier inference is one in-row integer fold:
    an Exchange or a Python eval node here would put a shuffle or the
    slow path under a map-only 100 TB scan."""
    from ocr_gang_spark.textops import quality_classifier_scores

    plan = plan_of(quality_classifier_scores(spark, SF), mode="simple")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan  # built-in exprs only, no UDF


def test_caption_mining_single_exchange_one_window(spark):
    """Caption pair mining: one shuffle on doc_id, both neighbor frames
    in ONE Window node, no join — a second Exchange or any join node
    means the operator stopped reusing the span table's partitioning."""
    from ocr_gang_spark.extraction_queries import caption_pair_mining

    plan = plan_of(caption_pair_mining(spark, SF), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1
    assert "Join" not in plan


def test_sorted_neighborhood_single_exchange_no_join(spark):
    """Sorted-neighborhood linkage: candidates come from lead() inside
    the block window — one hash exchange on the block key and NO join
    node (a join would mean the fuzzy match regressed to the quadratic
    blocked cross-join)."""
    from ocr_gang_spark.textops import sorted_neighborhood_pairs

    plan = plan_of(sorted_neighborhood_pairs(spark, SF), mode="simple")
    # union of base + mutated twins: each branch shuffles into the same
    # block-key window partitioning; no other hash exchange allowed
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 2, plan
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_merge_read_single_exchange_shared_by_both_windows(spark):
    """Merge-on-read: one hash exchange on the key feeds BOTH window
    functions (latest-version pick + version count); a join node or a
    second exchange means the upsert path regressed to anti-join
    deletes or stopped sharing the partitioning."""
    from ocr_gang_spark.queries import changelog_merge_read

    plan = plan_of(changelog_merge_read(spark, SF), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 2
    assert "Join" not in plan
    # changelog filters reach the parquet scans
    assert "PushedFilters: [IsNotNull(doc_id)]" in plan


def test_cdc_chunk_dedup_single_hash_agg(spark):
    """CDC chunking+hashing is a shuffle-free Arrow kernel; the only
    exchanges are synth_media's render-spread repartition and the
    map-side-combined groupBy on chunk_md5 — a HashAggregate (the
    keeper travels as a packed BIGINT; min(string) would degrade it),
    no joins anywhere."""
    from ocr_gang_spark.media_queries import cdc_chunk_dedup

    plan = plan_of(cdc_chunk_dedup(spark, SF), mode="simple")
    assert "hashpartitioning(chunk_md5" in plan
    assert plan.count("Exchange") == 2
    assert "SortAggregate" not in plan
    assert "Join" not in plan


def test_pq_adc_broadcast_only_joins_two_takeordered(spark):
    """PQ search: codebook + distance table + query + exact-top-10 set
    all ride broadcasts — every join must be a BroadcastHashJoin or
    BroadcastNestedLoopJoin against those tiny frames, never a
    shuffle/sort-merge join of the vector table; both top-k stages must
    be TakeOrderedAndProject, never a global Sort."""
    from ocr_gang_spark.textops import pq_adc_topk

    plan = plan_of(pq_adc_topk(spark, SF), mode="simple")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    # the per-(vector, subspace) argmin is a map-side-combined
    # min(struct) aggregate (one narrow row per group crosses the
    # shuffle — the kmeans pin), never a row_number window over all
    # K candidates
    assert "partial_min" in plan
    assert "Window" not in plan


def test_pq_adc_shortlist_rerank_recall(spark):
    """The two-stage search must actually recover what raw ADC loses:
    measured 8/10 exact-top-10 recall through the 100-candidate
    shortlist on this corpus (vs 2/10 ADC-only).  A recall collapse
    (codebook or distance-table bug that still produces plausible
    rankings) fails here even if the value hash is regenerated."""
    from ocr_gang_spark.textops import pq_adc_topk

    rows = pq_adc_topk(spark, SF).collect()
    assert len(rows) == 10
    assert sum(r["in_exact_topk"] for r in rows) >= 7
    # re-rank output is ordered by exact distance
    ds = [r["exact_dist"] for r in rows]
    assert ds == sorted(ds)
    # the query vector itself is its own nearest neighbor
    assert rows[0]["vec_id"] == 0 and rows[0]["exact_dist"] == 0


def test_ivfpq_broadcast_only_joins_two_takeordered(spark):
    """Composed IVF-PQ (faiss IndexIVFPQ+Refine): the coarse centroids
    are a driver-side index artifact (probed cell ids re-enter as
    literals), the PQ codebook / distance table / shortlist / recall
    set all ride broadcasts — so the data-sized side must never cross a
    SortMergeJoin or ShuffledHashJoin, both top-k stages must be
    TakeOrderedAndProject, and the per-(vector, subspace) argmin must
    be the map-side-combined min(struct) (partial_min), never a
    row_number window over all K candidates."""
    from ocr_gang_spark.textops import ann_ivfpq_topk

    plan = plan_of(ann_ivfpq_topk(spark, SF), mode="simple")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "partial_min" in plan
    assert "Window" not in plan


def test_ivfpq_rerank_recall_and_cell_prune(spark):
    """The composition must keep the halves' quality contracts: exact
    re-rank recovers the exact top-10 (recall 1.0 on this corpus —
    carried in-row), results are ordered by exact distance with the
    query as its own nearest neighbor, and every hit comes from one of
    the nprobe=2 probed cells (cells <= 2 distinct values)."""
    from ocr_gang_spark.textops import IVFPQ_NPROBE, ann_ivfpq_topk

    rows = ann_ivfpq_topk(spark, SF).collect()
    assert len(rows) == 10
    ds = [r["exact_dist"] for r in rows]
    assert ds == sorted(ds)
    assert rows[0]["vec_id"] == 0 and rows[0]["exact_dist"] == 0
    assert len({r["cluster"] for r in rows}) <= IVFPQ_NPROBE
    assert all(r["recall_at_k"] == rows[0]["recall_at_k"] for r in rows)


def test_ivfpq_residual_same_plan_shape_as_nonresidual(spark):
    """The residual variant's docstring claims the by_residual swap
    changes only the encode INPUTS, not the plan: both lineages must
    have zero SortMergeJoin/ShuffledHashJoin, TakeOrderedAndProject
    top-k stages, the map-side-combined min-struct argmin, no Window —
    and the same count of data shuffles (hash exchanges)."""
    from ocr_gang_spark.textops import ann_ivfpq_residual_topk, ann_ivfpq_topk

    p_res = plan_of(ann_ivfpq_residual_topk(spark, SF), mode="simple")
    p_raw = plan_of(ann_ivfpq_topk(spark, SF), mode="simple")
    for plan in (p_res, p_raw):
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan
        assert "TakeOrderedAndProject" in plan
        assert "partial_min" in plan
        assert "Window" not in plan
    assert (p_res.count("Exchange hashpartitioning")
            == p_raw.count("Exchange hashpartitioning"))


def test_ivfpq_residual_recall_and_ordering(spark):
    """Residual encoding must keep the quality contract: exact re-rank
    ordering, query self-match, nprobe cell bound, recall carried
    uniformly — and its recall may not fall below the non-residual
    lineage's on the same corpus (residuals concentrate near zero;
    faiss defaults to by_residual=True for exactly this reason)."""
    from ocr_gang_spark.textops import (
        IVFPQ_NPROBE,
        ann_ivfpq_residual_topk,
        ann_ivfpq_topk,
    )

    rows = ann_ivfpq_residual_topk(spark, SF).collect()
    assert len(rows) == 10
    ds = [r["exact_dist"] for r in rows]
    assert ds == sorted(ds)
    assert rows[0]["vec_id"] == 0 and rows[0]["exact_dist"] == 0
    assert len({r["cluster"] for r in rows}) <= IVFPQ_NPROBE
    raw = ann_ivfpq_topk(spark, SF).collect()
    assert rows[0]["recall_at_k"] >= raw[0]["recall_at_k"]


def test_phash_hamming_probe_properties(spark):
    """Bit-flip multiprobe radius search: (a) every injected '-hv' twin
    surfaces as a hamming-1 pair with its source ref — expected twin
    count derived INDEPENDENTLY from the documents table's span rule,
    not from the rows under test (a probe generator that dropped bit
    63 must fail here), (b) no pair exceeds radius 1 (a probe bug that
    flips two bits would), (c) no duplicate orientations (the strict
    a < b + single-probe-match argument), (d) the corpus's natural
    re-encoded duplicates surface as non-injected hamming-0 pairs."""
    from ocr_gang_spark.media_queries import PHASH_TWIN_MOD, phash_hamming_pairs

    rows = phash_hamming_pairs(spark, SF).collect()
    assert rows
    assert all(r["hamming"] <= 1 for r in rows)
    pairs = {(r["a_ref"], r["b_ref"]) for r in rows}
    assert len(pairs) == len(rows)  # no duplicate pairs
    twin_pairs = [r for r in rows if r["b_ref"] == r["a_ref"] + "-hv"]
    assert twin_pairs and all(
        r["hamming"] == 1 and r["injected"] for r in twin_pairs
    )
    # independent expected-twin derivation: the corpus has
    # 1 + doc_id % 2 media spans per doc (synth rule); a twin is
    # injected for every (doc_id + span) % PHASH_TWIN_MOD == 0 ref,
    # and EVERY twin must pair with its source (hamming exactly 1 by
    # construction, and the source's phash is in the index)
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id").collect()
    ]
    n_expected = sum(
        (d + i) % PHASH_TWIN_MOD == 0
        for d in doc_ids
        for i in range(1, d % 2 + 2)
    )
    assert n_expected > 0 and len(twin_pairs) == n_expected
    # natural hamming-0 re-encoded duplicates (synth.blob_for_dedup_ref)
    nat0 = [r for r in rows if r["hamming"] == 0 and not r["injected"]]
    assert nat0
    # and the plan has no cartesian product / window
    plan = plan_of(phash_hamming_pairs(spark, SF), mode="simple")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "Generate" in plan  # the in-row 65x probe fan-out


def test_spell_correction_broadcast_dict_minstruct(spark):
    """SymSpell correction: the deletion-variant dictionary must ride a
    broadcast (the token stream never shuffles to meet it), the
    per-token argmin must be the map-side-combined min(struct)
    (partial_min), and no Window/cartesian anywhere — the shuffles are
    the dictionary aggregate and the (doc_id, pos)/doc_id hash aggs."""
    from ocr_gang_spark.textops import ocr_spell_correction

    plan = plan_of(ocr_spell_correction(spark, SF), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan
    assert "Window" not in plan
    # the ONLY non-broadcast join is the final doc-granularity truth
    # join (text rides once per doc, never through the variant fan-out)
    assert (plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")) <= 1


def test_spell_correction_restores_typos_not_noise(spark):
    """The correction rule end to end on a constructed frame: the
    transposition typo class comes back restored ('tbale' shares a
    deletion variant with 'table'), the out-of-vocabulary insertion
    ('noise') survives uncorrected, and in-vocabulary text is never
    touched."""
    import pandas as pd

    from ocr_gang_spark.textops import ocr_spell_correction

    texts = {
        0: "the table of data sort table",   # class 0: typo -> restored
        2: "the sort of data",               # class 2: noise prepended
        3: "the data table",                 # class 3: clean
        5: "a table of data",                # class 1: LEADING 'a' deleted
    }
    with __import__("tempfile").TemporaryDirectory() as d:
        pd.DataFrame(
            {"doc_id": list(texts), "text": list(texts.values()),
             "lang": ["en"] * 4, "source": ["s"] * 4,
             "n_chars": [len(t) for t in texts.values()]}
        ).to_parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in ocr_spell_correction(spark, d).collect()}
    assert out[0]["restored"] and out[0]["n_corrected"] == 2  # both typos
    assert not out[2]["restored"] and out[2]["n_corrected"] == 0
    assert out[2]["n_oov"] == 1  # 'noise' flagged but left alone
    assert out[3]["restored"] and out[3]["n_corrected"] == 0
    # edge-position deletion leaves an empty split token; the corrector
    # must NOT hallucinate the deleted 'a' back into it (review fix:
    # '' shares its only deletion variant with every 1-char dict word)
    assert not out[5]["restored"] and out[5]["n_corrected"] == 0
    assert out[5]["n_tokens"] == 4  # incl. the preserved empty slot


def test_quality_classifier_trained_same_plan_as_formula(spark):
    """The trained-weights twin must keep the formula model's exact
    plan shape (the docstring's 'same plan' promise, VERDICT r4 next
    #6): zero Exchange, zero Python eval, and the same physical node
    sequence — the 2048-weight array is a folded constant, not a join
    side or a UDF closure."""
    import re

    from ocr_gang_spark.textops import (
        quality_classifier_scores,
        quality_classifier_trained,
    )

    p_formula = plan_of(quality_classifier_scores(spark, SF), mode="simple")
    p_trained = plan_of(quality_classifier_trained(spark, SF), mode="simple")
    for plan in (p_formula, p_trained):
        assert "Exchange" not in plan
        assert "EvalPython" not in plan
        assert "Join" not in plan
    # same physical node sequence (expression detail differs, shape not)
    assert re.findall(r"\b(FileScan|Project|ColumnarToRow)\b", p_formula) == \
        re.findall(r"\b(FileScan|Project|ColumnarToRow)\b", p_trained)


def test_wer_union_two_branch_no_shuffle(spark):
    """ocr_error_rates' two-branch plan (VERDICT r4 next #4): a union
    of the ASCII-encoded JVM path and the big-vocab Arrow DP branch —
    no Exchange beyond _spread's input repartition in either branch, no
    Join, exactly one MapInPandas (the DP branch), and the ASCII branch
    still reaches levenshtein in-row (no Python on the common case)."""
    from ocr_gang_spark.textops import ocr_error_rates

    plan = plan_of(ocr_error_rates(spark, SF), mode="simple")
    assert "Join" not in plan
    assert plan.count("MapInPandas") == 1
    assert "Union" in plan
    # _spread repartitions each union branch's input scan: allow those
    # round-robin exchanges but no hash/shuffle exchange anywhere
    assert "Exchange hashpartitioning" not in plan


def test_bpe_large_vocab_map_only_no_join(spark):
    """The 50k-merge encoder is ONE Arrow map pass: the ranked table
    rides a SparkContext broadcast (never a join side), so the plan
    must contain no Join and no aggregate, and the only permissible
    Exchange is _spread's input-parallelism repartition.  A Join or a
    second Exchange would mean the merge table leaked into the data
    plan."""
    from ocr_gang_spark.textops import bpe_encode_large_vocab

    plan = plan_of(bpe_encode_large_vocab(spark, SF), mode="simple")
    assert "Join" not in plan
    assert "Aggregate" not in plan
    assert plan.count("Exchange") <= 1  # _spread only (no-op at scale)
    assert "MapInPandas" in plan


def test_rag_chunking_zero_shuffle(spark):
    """Chunk planning is an in-row transform + posexplode: a Generate
    node is expected, any Exchange is a regression on a map-only pass."""
    from ocr_gang_spark.textops import rag_chunk_plan

    plan = plan_of(rag_chunk_plan(spark, SF), mode="simple")
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_incremental_dedup_no_cartesian_bounded_exchanges(spark):
    """Incremental dedup: the band-key probe is a hash join (broadcast
    at tier size, shuffle-hash with a bucketed index at scale) — never
    a cartesian or a sort-merge over the band rows; the only hash
    exchanges are the index aggregate and the per-doc verdict groupBy."""
    from ocr_gang_spark.textops import incremental_dedup_index

    plan = plan_of(incremental_dedup_index(spark, SF), mode="simple")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_multimodal_pack_uses_two_level_scan(spark):
    """Same contract as sequence_pack_bins: the multimodal cost scan
    must partition by bucket, broadcast the offset table, and keep the
    only SinglePartition exchange on the tiny level-2 window."""
    from ocr_gang_spark.textops import multimodal_pack_plan

    plan = plan_of(multimodal_pack_plan(spark, SF), mode="simple")
    assert "hashpartitioning(bkt" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange SinglePartition") == 1


def test_canonical_quality_window_partitions_by_component(spark):
    """Survivor ranking must run under the component hash partitioning
    (bounded by max cluster size), never a global window, and the
    component lineage must come from the materialized cache."""
    from ocr_gang_spark.textops import dedup_canonical_quality

    plan = plan_of(dedup_canonical_quality(spark, SF), mode="simple")
    assert "hashpartitioning(component_id" in plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # reads the CC loop's cache


def test_leakage_split_is_one_join_no_window(spark):
    """Split assignment is a left join + in-row hash: no window, no
    SinglePartition exchange, no cartesian anywhere."""
    from ocr_gang_spark.textops import leakage_safe_split

    plan = plan_of(leakage_safe_split(spark, SF), mode="simple")
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_ocr_confidence_is_map_only_with_explicit_parallelism(spark):
    """Confidence routing is a per-blob map: no join, no window, and
    exactly ONE exchange — the explicit repartition that protects the
    CPU-bound NN stage from AQE coalescing (media-branch convention)."""
    from ocr_gang_spark.extraction_queries import ocr_confidence_stats

    plan = plan_of(ocr_confidence_stats(spark, SF), mode="simple")
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
    assert "REPARTITION_BY_NUM" in plan


def test_caption_negatives_batched_never_global(spark):
    """In-batch negatives: windows partition by batch_id, the cyclic
    pick is a hash join — no SinglePartition, no cartesian, no SMJ."""
    from ocr_gang_spark.extraction_queries import caption_negative_samples

    plan = plan_of(caption_negative_samples(spark, SF), mode="simple")
    assert "hashpartitioning(batch_id" in plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_text_render_adds_no_shuffle(spark):
    """The render is an in-row fold over the pipeline's output: no
    window, and only the pipeline's own single blob join."""
    from ocr_gang_spark.extraction_queries import interleaved_text_render

    plan = plan_of(interleaved_text_render(spark, SF), mode="simple")
    assert "Window" not in plan
    assert plan.count("ShuffledHashJoin") == 1  # the pipeline's blob join
    assert "SortMergeJoin" not in plan


def test_media_resolution_is_scan_only(spark):
    """Zero shuffle, zero joins: ref derivation + membership filter are
    in-row."""
    from ocr_gang_spark.extraction_queries import media_resolution_report

    plan = plan_of(media_resolution_report(spark, SF), mode="simple")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_margin_extraction_adds_no_shuffle(spark):
    """Single-pass confidence: with_margins=True must produce the SAME
    exchange structure as the default path — the doc_min_margin_ppm
    aggregate rides the existing reassembly groupBy, never a second
    pass or join over the blobs."""
    from ocr_gang_spark.pipeline import extract_documents

    docs = synth_documents(spark, 8, seed=1)
    media = synth_media(spark, docs)
    base = plan_of(extract_documents(docs, media, spark=spark), mode="simple")
    marg = plan_of(
        extract_documents(docs, media, spark=spark, with_margins=True),
        mode="simple",
    )
    assert marg.count("Exchange") == base.count("Exchange")
    assert marg.count("ShuffledHashJoin") == base.count("ShuffledHashJoin") == 1
    # one aggregation pair (partial+final), not a second pass
    assert marg.count("HashAggregate") == base.count("HashAggregate")
    assert "SortMergeJoin" not in marg and "BroadcastHashJoin" not in marg


def test_warc_parse_stage_has_single_synth_exchange(spark):
    """warc_ingest_records: the ONLY exchange allowed is the file-synth
    groupBy (which does not exist in real runs — WARCs arrive as files);
    the build -> parse -> field-hash chain after it must be
    exchange-free, or the per-blob reader gained a shuffle that would
    move archive bytes across the network at 10^12-document scale."""
    from ocr_gang_spark.extraction_queries import warc_ingest_records

    plan = plan_of(warc_ingest_records(spark, SF), mode="simple")
    assert plan.count("Exchange") == 1
    # bounded collect_list: partial-agg below the exchange too
    assert "ObjectHashAggregate" in plan
    # both kernel stages present, field hashing stays relational (JVM md5)
    assert plan.count("MapInPandas") == 2
    assert "md5" in plan


def test_warc_extract_chain_is_single_exchange(spark):
    """warc_extract_main_content: the ingest->parse->status-gate->strip
    chain keeps the warc_ingest_records shape — one synth exchange, two
    kernel stages, nothing else."""
    from ocr_gang_spark.extraction_queries import warc_extract_main_content

    plan = plan_of(warc_extract_main_content(spark, SF), mode="simple")
    assert plan.count("Exchange") == 1
    assert plan.count("MapInPandas") == 2


def test_tar_shard_roundtrip_is_single_exchange(spark):
    """tar_shard_samples: one exchange (shard assembly — the real
    pipeline's packing stage), two kernel stages, relational md5."""
    from ocr_gang_spark.extraction_queries import tar_shard_samples

    plan = plan_of(tar_shard_samples(spark, SF), mode="simple")
    assert plan.count("Exchange") == 1
    assert plan.count("MapInPandas") == 2
    assert "md5" in plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """At 100 TB the fact table is lang/date-partitioned and a filtered
    dim join must prune fact PARTITIONS at runtime (DPP), not scan
    everything and filter after the join.  Pin that a join on the
    partition column against a filtered dim injects a dynamic-pruning
    expression into the fact scan's PartitionFilters — if a config or
    plan refactor silently disables DPP, a selective join goes back to
    reading the full corpus."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(SF + "/documents.parquet")
    fact_path = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("en", 1), ("fr", 2), ("de", 2)], "lang string, prio int"
    )
    j = fact.join(dim.where(F.col("prio") == 1), "lang").groupBy("lang").count()
    plan = plan_of(j)
    assert "dynamicpruningexpression" in plan.lower()


def test_schema_evolution_merge_schema_read(spark, tmp_path):
    """Long-lived corpora accumulate file generations with evolving
    schemas (a column added mid-pipeline).  Pin the read-path contract:
    mergeSchema unions the generations, rows from pre-evolution files
    surface the new column as NULL (never a crash, never silent column
    loss), and filter pushdown on a shared column still reaches the
    scan."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(SF + "/documents.parquet")
    path = str(tmp_path / "evolving")
    docs.select("doc_id", "text").where(F.col("doc_id") % 2 == 0).write.parquet(path)
    docs.select(
        "doc_id", "text", F.lit("round3").alias("pipeline_ver")
    ).where(F.col("doc_id") % 2 == 1).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"doc_id", "text", "pipeline_ver"}
    old_gen = merged.where(F.col("doc_id") % 2 == 0)
    assert old_gen.where(F.col("pipeline_ver").isNull()).count() == old_gen.count()
    assert (
        merged.where(F.col("pipeline_ver") == "round3").count()
        == docs.where(F.col("doc_id") % 2 == 1).count()
    )
    plan = plan_of(merged.where(F.col("doc_id") < 100).select("doc_id"))
    assert "LessThan(doc_id,100)" in plan  # pushdown survives the merge


def test_snapshot_time_travel_read_keeps_pushdown(spark, tmp_path):
    """snapshot_store.read_snapshot claims 'plans a plain multi-path
    parquet scan with pushdown/pruning' — pin it: a filter over a
    time-travel read of an append snapshot (two underlying data dirs)
    must reach PushedFilters, and column pruning must narrow
    ReadSchema to the selected columns."""
    import pyspark.sql.functions as F

    from ocr_gang_spark import snapshot_store as ss

    docs = spark.read.parquet(SF + "/documents.parquet").select(
        "doc_id", "text", "lang", "n_chars"
    )
    tbl = str(tmp_path / "t")
    ss.commit_snapshot(spark, tbl, docs.where(F.col("doc_id") % 3 == 0),
                       op="overwrite")
    ss.commit_snapshot(spark, tbl, docs.where(F.col("doc_id") % 3 == 1),
                       op="append")

    q = (
        ss.read_snapshot(spark, tbl, version=2)
        .where(F.col("doc_id") < 100)
        .select("doc_id", "n_chars")
    )
    plan = plan_of(q)
    assert "LessThan(doc_id,100)" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "n_chars" in read_schema and "text" not in read_schema


def test_interval_join_is_hash_join_not_nested_loop(spark):
    """The point-vs-interval comparison must ride an equi-join on the
    bucket key; a refactor that lets Spark fall back to the naive
    range-join plan (per-pair nested loop over the interval table)
    regresses O(points) to O(points x intervals)."""
    from ocr_gang_spark.queries import interval_overlap_join

    plan = plan_of(interval_overlap_join(spark, SF), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # exactly one 1-row bounds attachment; never the interval table
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_salted_join_splits_hot_key_across_reducers(spark):
    """salted_hot_key_join's physical contract: the join must be a
    shuffle join keyed on (ukey, salt) — hot-key rows spread over
    SALT_S reducers — with the x{S} replication on the DIM side only
    (a Generate/explode), and the fact side never broadcast."""
    from ocr_gang_spark.queries import salted_hot_key_join

    df = salted_hot_key_join(spark, SF)
    plan = plan_of(df, mode="simple")
    assert "ShuffledHashJoin [ukey" in plan and "salt" in plan.split(
        "ShuffledHashJoin"
    )[1].split("]")[0]
    assert plan.count("Generate explode") == 1  # dim replication only
    assert "BroadcastHashJoin" not in plan
    # semantic spot-check: the hot key aggregates back to ONE row
    rows = {r["ukey"]: r["n_events"] for r in df.collect()}
    assert rows["hot"] > sum(v for k, v in rows.items() if k != "hot") / 2
