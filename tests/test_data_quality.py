"""Direct pins for the round-3 relational operators registered in
queries.py: data_quality_checks (Deequ-style constraint suite —
injected-violation counts in both verdict directions, plus a plan
guard that the suite stays one aggregate pass per table) and
interval_overlap_join (all n_windows cardinalities exercised; its
hash-join-not-nested-loop plan guard lives in tests/test_plans.py)."""

from ocr_gang_spark.queries import data_quality_checks
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


def test_injected_violations_detected_exactly(spark):
    rows = {
        (r["table_name"], r["check_name"]): r
        for r in data_quality_checks(spark, SF).collect()
    }
    assert len(rows) == 10

    # sf0.001: 500 docs (ids 0..499) + 5 re-appended dups (%101).
    docs_n = rows[("documents", "completeness_text")]["n_rows"]
    assert docs_n == 505
    assert rows[("documents", "completeness_text")]["n_violations"] == 22  # %23
    assert rows[("documents", "completeness_lang")]["n_violations"] == 30  # %17
    assert rows[("documents", "uniqueness_doc_id")]["n_violations"] == 5  # %101

    failing = {k[1] for k, r in rows.items() if not r["passed"]}
    assert failing == {
        "completeness_text", "completeness_lang", "uniqueness_doc_id",
        "consistency_n_chars", "domain_lang", "range_n_chars",
    }
    # the clean checks pin the pass direction with zero violations
    for tbl, chk in [
        ("documents", "completeness_doc_id"),
        ("embeddings", "uniqueness_vec_id"),
        ("embeddings", "consistency_embedding_dim"),
        ("embeddings", "domain_label"),
    ]:
        assert rows[(tbl, chk)]["passed"]
        assert rows[(tbl, chk)]["n_violations"] == 0


def test_suite_is_one_aggregate_pass_per_table(spark):
    """The 7-constraint suite must never plan as one job per check:
    no joins, no windows, and exactly one documents + one embeddings
    scan (the COUNT DISTINCT rewrites to Expand, still a single scan)."""
    plan = plan_of(data_quality_checks(spark, SF), mode="simple")
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("documents.parquet") <= 2  # dirty union reuses the scan
    assert plan.count("embeddings.parquet") == 1
    assert "SortAggregate" not in plan


# --------------------------------------------------------------------------
# interval_overlap_join: range join via bucket decomposition
# --------------------------------------------------------------------------

def test_interval_join_exercises_all_cardinalities(spark):
    from ocr_gang_spark.queries import interval_overlap_join

    rows = interval_overlap_join(spark, SF).collect()
    assert len(rows) == 1000  # one row per event, including gap events
    counts = {r["n_windows"] for r in rows}
    assert {0, 1, 2} <= counts  # gaps, single-window, overlap all hit
    for r in rows:
        assert (r["first_window_id"] == -1) == (r["n_windows"] == 0)


