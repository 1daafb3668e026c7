"""dedup_canonical_quality: quality-aware survivor selection inside
near-dup components.  One keep per component, the keep is the score
argmax (tie -> min doc_id), and the policy genuinely differs from
dedup_components' earliest-id rule on the tier corpus (otherwise the
operator would be vacuous)."""

import pytest

from ocr_gang_spark.textops import dedup_canonical_quality, dedup_components

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def rows(spark):
    return dedup_canonical_quality(spark, SF).collect()


def test_one_keep_per_component_and_argmax(rows):
    assert rows
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    for comp, members in by_comp.items():
        keeps = [r for r in members if r.decision == "keep"]
        assert len(keeps) == 1, f"component {comp}: {len(keeps)} keeps"
        assert len(members) == members[0].component_size
        best = min(members, key=lambda r: (-r.score, r.doc_id))
        assert keeps[0].doc_id == best.doc_id


def test_policy_differs_from_min_id(spark, rows):
    min_id_keeps = {
        r.doc_id
        for r in dedup_components(spark, SF).collect()
        if r.decision == "keep"
    }
    quality_keeps = {r.doc_id for r in rows if r.decision == "keep"}
    assert len(min_id_keeps) == len(quality_keeps)  # same # of components
    assert quality_keeps != min_id_keeps
