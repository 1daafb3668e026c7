"""leakage_safe_split: near-dup groups never straddle train/val/test,
all three splits are populated at the tier size, and dup members carry
their component's group key (so the guarantee is group-level, not an
accident of singleton hashing)."""

import pytest

from ocr_gang_spark.textops import leakage_safe_split

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def rows(spark):
    return leakage_safe_split(spark, SF).collect()


def test_groups_never_straddle(rows):
    splits_by_group = {}
    for r in rows:
        splits_by_group.setdefault(r.group_id, set()).add(r.split)
    assert all(len(s) == 1 for s in splits_by_group.values())
    # the guarantee is exercised: multi-member groups exist on the tier
    sizes = {}
    for r in rows:
        sizes[r.group_id] = sizes.get(r.group_id, 0) + 1
    assert any(n > 1 for n in sizes.values())


def test_every_split_populated_and_sized(rows):
    counts = {}
    for r in rows:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    # 90/5/5 target with hash noise: train must dominate
    assert counts["train"] > 0.8 * len(rows)


def test_dup_members_use_component_group(rows):
    dup = [r for r in rows if r.is_dup_member]
    assert dup
    for r in dup:
        assert r.group_id <= r.doc_id  # component id = min member id
