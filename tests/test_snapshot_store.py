"""Snapshot store (time travel + expiry) direct pins: the invariants
the registry oracle can't see — expiry referenced-ness over append
chains, crashed-commit healing, expired-read refusal."""

import json
import os

import pytest

from ocr_gang_spark import snapshot_store as ss

SF = "/root/testdata/sf0.001"


def _base(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "n_chars")
    )


def _commit_three(spark, tbl):
    from pyspark.sql import functions as F

    base = _base(spark)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 0),
                       op="overwrite")
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 1),
                       op="append")
    rw = ss.read_snapshot(spark, tbl).where(F.col("doc_id") % 5 != 0)
    ss.commit_snapshot(spark, tbl, rw, op="overwrite")


def _ids(spark, tbl, version=None):
    return sorted(
        r["doc_id"] for r in ss.read_snapshot(spark, tbl, version).collect()
    )


def test_time_travel_reads_every_version(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _commit_three(spark, tbl)
    all_ids = sorted(r["doc_id"] for r in _base(spark).collect())
    v1 = [i for i in all_ids if i % 3 == 0]
    v2 = [i for i in all_ids if i % 3 in (0, 1)]
    v3 = [i for i in v2 if i % 5 != 0]
    assert _ids(spark, tbl, 1) == v1
    assert _ids(spark, tbl, 2) == v2
    assert _ids(spark, tbl, 3) == v3
    assert _ids(spark, tbl) == v3  # current
    assert ss.current_version(tbl) == 3
    log = ss.snapshot_log(tbl)
    assert [m["version"] for m in log] == [1, 2, 3]
    assert [m["parent"] for m in log] == [None, 1, 2]
    assert [m["op"] for m in log] == ["overwrite", "append", "overwrite"]
    # append manifest carries the parent's data dir forward
    assert log[1]["files"] == log[0]["files"] + [log[1]["files"][-1]]
    # overwrite starts fresh
    assert len(log[2]["files"]) == 1


def test_expiry_respects_append_chain_references(spark, tmp_path):
    """v1's data dir must SURVIVE v1's expiry while the retained v2
    append manifest still references it — referenced-ness is over kept
    manifests' file lists, never version numbers."""
    tbl = str(tmp_path / "t")
    _commit_three(spark, tbl)
    v2_before = _ids(spark, tbl, 2)
    log = ss.snapshot_log(tbl)
    v1_dir, v2_dir = log[0]["files"][0], log[1]["files"][-1]

    res = ss.expire_snapshots(tbl, keep_last=2)  # keep v2, v3
    assert res["expired_versions"] == [1]
    assert res["removed_data_dirs"] == []  # v1 dir still referenced by v2
    assert os.path.isdir(os.path.join(tbl, v1_dir))
    assert _ids(spark, tbl, 2) == v2_before  # kept versions intact
    with pytest.raises(FileNotFoundError):
        ss.read_snapshot(spark, tbl, version=1)

    res = ss.expire_snapshots(tbl, keep_last=1)  # keep only v3
    assert res["expired_versions"] == [2]
    # v3 is an overwrite referencing only its own dir -> v1+v2 dirs go
    assert sorted(res["removed_data_dirs"]) == sorted([v1_dir, v2_dir])
    assert _ids(spark, tbl) == _ids(spark, tbl, 3)


def test_crashed_commit_is_invisible_and_healed(spark, tmp_path):
    """A crash after the data write but before the manifest leaves the
    table readable at the old version; expiry sweeps the orphan dir;
    the retried commit succeeds at the same version number."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    base = _base(spark)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 0),
                       op="overwrite")
    # simulate the crash: data for v2 exists, no manifest, stale tmp
    base.limit(3).write.parquet(os.path.join(tbl, "data", "v00000002"))
    with open(os.path.join(tbl, "meta", ".tmp-v00000002.json"), "w") as f:
        json.dump({"half": "written"}, f)

    assert ss.current_version(tbl) == 1
    assert [m["version"] for m in ss.snapshot_log(tbl)] == [1]

    res = ss.expire_snapshots(tbl, keep_last=10)
    assert res["removed_data_dirs"] == ["data/v00000002"]

    v = ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 1),
                           op="append")
    assert v == 2
    assert len(_ids(spark, tbl, 2)) == len(
        [r for r in base.collect() if r["doc_id"] % 3 in (0, 1)]
    )


def test_incremental_read_appends_only(spark, tmp_path):
    """read_incremental returns exactly the rows added by the append
    commits in the range, and refuses a range crossing an overwrite
    (history rewritten -> file-list delta is not 'added rows')."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    _commit_three(spark, tbl)  # v1 overwrite, v2 append, v3 overwrite

    inc = sorted(
        r["doc_id"]
        for r in ss.read_incremental(spark, tbl, 1, 2).collect()
    )
    all_ids = sorted(r["doc_id"] for r in _base(spark).collect())
    assert inc == [i for i in all_ids if i % 3 == 1]

    with pytest.raises(ValueError, match="overwrite"):
        ss.read_incremental(spark, tbl, 2, 3)
    with pytest.raises(ValueError, match="exceed"):
        ss.read_incremental(spark, tbl, 2, 2)
    # another append after the overwrite: incremental works again
    ss.commit_snapshot(
        spark, tbl, _base(spark).where(F.col("doc_id") % 3 == 2),
        op="append",
    )
    inc2 = sorted(
        r["doc_id"]
        for r in ss.read_incremental(spark, tbl, 3, 4).collect()
    )
    assert inc2 == [i for i in all_ids if i % 3 == 2]


def test_phantom_manifest_is_invisible_and_expirable(spark, tmp_path):
    """The OTHER crash window (review fix): writer dies AFTER the
    manifest publish but BEFORE the current-pointer publish.  The
    phantom manifest must be invisible to snapshot_log and reads
    (its data was never committed), expire_snapshots must remove both
    the manifest and its data dir, and a retried commit heals by
    taking the same version number."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    base = _base(spark)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 0),
                       op="overwrite")
    v1_ids = _ids(spark, tbl, 1)

    # simulate: data + manifest for v2 exist, pointer still says v1
    base.limit(3).write.parquet(os.path.join(tbl, "data", "v00000002"))
    with open(os.path.join(tbl, "meta", "v00000002.json"), "w") as f:
        json.dump({"version": 2, "parent": 1, "op": "append",
                   "files": ["data/v00000001", "data/v00000002"]}, f)

    assert ss.current_version(tbl) == 1
    assert [m["version"] for m in ss.snapshot_log(tbl)] == [1]
    with pytest.raises(FileNotFoundError):
        ss.read_snapshot(spark, tbl, version=2)

    res = ss.expire_snapshots(tbl, keep_last=10)
    assert res["removed_data_dirs"] == ["data/v00000002"]
    assert not os.path.exists(os.path.join(tbl, "meta", "v00000002.json"))
    assert _ids(spark, tbl, 1) == v1_ids  # committed state untouched

    v = ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 1),
                           op="append")
    assert v == 2
    assert ss.read_snapshot(spark, tbl, version=2).count() == len(
        [r for r in base.collect() if r["doc_id"] % 3 in (0, 1)]
    )


def test_expiry_sweeps_stale_meta_tmp_files(spark, tmp_path):
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    ss.commit_snapshot(spark, tbl, _base(spark).where(F.col("doc_id") % 3 == 0),
                       op="overwrite")
    stale = os.path.join(tbl, "meta", ".tmp-v00000002.json")
    with open(stale, "w") as f:
        json.dump({"half": "written"}, f)
    ss.expire_snapshots(tbl, keep_last=10)
    assert not os.path.exists(stale)


def test_read_empty_table_and_bad_op(spark, tmp_path):
    tbl = str(tmp_path / "t")
    with pytest.raises(FileNotFoundError):
        ss.read_snapshot(spark, tbl)
    with pytest.raises(ValueError):
        ss.commit_snapshot(spark, tbl, _base(spark), op="merge")


def test_incremental_extraction_over_snapshot_appends(spark, tmp_path):
    """End-to-end tie between the snapshot layer and the flagship: when
    a new document batch lands as an append snapshot, extracting ONLY
    read_incremental's delta must produce span-for-span what a full
    re-extraction produces for those documents — the 10^12-scale
    pattern where re-extraction cost tracks the delta, not the table."""
    from ocr_gang_spark.pipeline import broadcast_weights, extract_documents
    from ocr_gang_spark.synth import synth_documents, synth_media

    docs = synth_documents(spark, 40, seed=7)
    media = synth_media(spark, docs)
    batch1 = docs.where("substr(doc_id, -1) < '8'")
    batch2 = docs.where("substr(doc_id, -1) >= '8'")
    assert 0 < batch2.count() < 40

    tbl = str(tmp_path / "docs_tbl")
    ss.commit_snapshot(spark, tbl, batch1, op="overwrite")
    ss.commit_snapshot(spark, tbl, batch2, op="append")

    bc = broadcast_weights(spark)
    inc = extract_documents(ss.read_incremental(spark, tbl, 1, 2), media, bc)
    full = extract_documents(ss.read_snapshot(spark, tbl, 2), media, bc)

    def spans_by_doc(df):
        return {
            r["doc_id"]: tuple(tuple(s) for s in r["spans"])
            for r in df.collect()
        }

    got = spans_by_doc(inc)
    delta_ids = {r["doc_id"] for r in batch2.select("doc_id").collect()}
    want = {
        k: v for k, v in spans_by_doc(full).items() if k in delta_ids
    }
    assert got == want and len(got) > 0


def test_streaming_ingest_commits_append_snapshots(spark, tmp_path):
    """Streaming ingest into the snapshot layer: every micro-batch is
    one append snapshot — current == all batches, read_incremental
    between consecutive versions == exactly one batch, and a replayed
    batch_id is a no-op (manifest-tag idempotency)."""
    from ocr_gang_spark.streaming import (
        snapshot_append_stream,
        write_time_split_events,
    )

    sf = "/root/testdata/sf0.001"
    ev_dir = write_time_split_events(spark, sf, str(tmp_path / "ev"), 4)
    tbl = str(tmp_path / "tbl")
    final = snapshot_append_stream(
        spark, ev_dir, tbl, str(tmp_path / "cp")
    )
    assert final == 4

    want_all = sorted(
        r["event_id"]
        for r in spark.read.parquet(f"{sf}/events.parquet").collect()
    )
    got_all = sorted(
        r["event_id"] for r in ss.read_snapshot(spark, tbl).collect()
    )
    assert got_all == want_all  # no loss, no duplication across batches

    # incremental read between consecutive versions == one batch
    sizes = [
        ss.read_incremental(spark, tbl, v, v + 1).count() for v in (1, 2, 3)
    ]
    first = ss.read_snapshot(spark, tbl, 1).count()
    assert first + sum(sizes) == len(want_all)

    # replayed batch: same tag -> skipped, version unchanged
    assert ss.has_tag(tbl, "batch-0")
    replay = spark.read.parquet(f"{sf}/events.parquet").limit(5)
    from ocr_gang_spark import snapshot_store as ss2

    before = ss2.current_version(tbl)
    if not ss2.has_tag(tbl, "batch-0"):
        ss2.commit_snapshot(spark, tbl, replay, op="append", tag="batch-0")
    assert ss2.current_version(tbl) == before


def test_compact_snapshots_collapses_chain_preserving_history(spark, tmp_path):
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    base = _base(spark)
    for k in range(3):  # 3-dir append chain
        ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == k),
                           op="append")
    before = _ids(spark, tbl)
    assert len(ss.snapshot_log(tbl)[-1]["files"]) == 3

    chain_dirs = ss.snapshot_log(tbl)[-1]["files"]
    v = ss.compact_snapshots(spark, tbl)
    assert v == 4
    m = ss.snapshot_log(tbl)[-1]
    assert len(m["files"]) == 1 and m["op"] == "overwrite"
    assert m["files"][0].startswith("data/v00000004")
    assert _ids(spark, tbl) == before          # values identical
    assert _ids(spark, tbl, 2) == sorted(      # history intact
        i for i in before if i % 3 in (0, 1)
    )
    assert ss.compact_snapshots(spark, tbl) == 4  # already-compact no-op

    res = ss.expire_snapshots(tbl, keep_last=1)
    assert sorted(res["removed_data_dirs"]) == sorted(chain_dirs)
    assert _ids(spark, tbl) == before  # one dir left, table unchanged


def test_write_audit_publish_flow(spark, tmp_path):
    """The Iceberg WAP pattern end-to-end: a staged snapshot is
    invisible to readers, auditable via read_staged, blocked from
    concurrent commits, protected from expiry, and either abandoned
    (table never changed) or published (O(1) pointer swap)."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    base = _base(spark)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 0),
                       op="overwrite")
    v1_ids = _ids(spark, tbl)

    # stage a BAD batch (audit rule: no NULL n_chars)
    bad = base.where(F.col("doc_id") % 3 == 1).withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("n_chars")
        ),
    )
    v = ss.stage_snapshot(spark, tbl, bad, op="append")
    assert v == 2
    # invisible to every normal reader; auditable via read_staged
    assert ss.current_version(tbl) == 1
    assert [m["version"] for m in ss.snapshot_log(tbl)] == [1]
    with pytest.raises(FileNotFoundError):
        ss.read_snapshot(spark, tbl, version=2)
    staged = ss.read_staged(spark, tbl, 2)
    n_null = staged.where(F.col("n_chars").isNull()).count()
    assert n_null > 0  # the audit catches the violation
    # a concurrent commit or second stage must refuse the slot
    with pytest.raises(RuntimeError, match="staged"):
        ss.commit_snapshot(spark, tbl, base.limit(1), op="append")
    with pytest.raises(RuntimeError, match="already exists"):
        ss.stage_snapshot(spark, tbl, base.limit(1), op="append")
    # expiry must not reap the in-flight stage
    with open(os.path.join(tbl, "meta", "v00000002.json")) as f:
        staged_dir = json.load(f)["files"][-1]
    ss.expire_snapshots(tbl, keep_last=10)
    assert os.path.isdir(os.path.join(tbl, staged_dir))
    assert os.path.exists(os.path.join(tbl, "meta", "v00000002.json"))

    ss.abandon_snapshot(tbl, 2)  # audit failed
    assert _ids(spark, tbl) == v1_ids  # table never changed
    assert not os.path.isdir(os.path.join(tbl, staged_dir))

    # stage the CLEAN batch, audit passes, publish
    good = base.where(F.col("doc_id") % 3 == 1)
    v = ss.stage_snapshot(spark, tbl, good, op="append")
    assert v == 2
    assert ss.read_staged(spark, tbl, 2).where(
        F.col("n_chars").isNull()
    ).count() == 0
    ss.publish_snapshot(tbl, 2)
    assert ss.current_version(tbl) == 2
    all_ids = sorted(r["doc_id"] for r in base.collect())
    assert _ids(spark, tbl) == [i for i in all_ids if i % 3 in (0, 1)]
    # published manifest is a normal snapshot now
    assert ss.snapshot_log(tbl)[-1]["staged"] is False
    with pytest.raises(ValueError, match="published"):
        ss.read_staged(spark, tbl, 2)
    # publish refuses replays and gaps
    with pytest.raises(ValueError):
        ss.publish_snapshot(tbl, 2)
    with pytest.raises(ValueError, match="expected"):
        ss.publish_snapshot(tbl, 9)


def test_named_refs_pin_snapshots_against_expiry(spark, tmp_path):
    """A named ref (Iceberg tag) gives readers a stable name and pins
    its snapshot: expiry skips it (manifest AND data survive) until
    the ref is dropped, after which the normal rules apply."""
    tbl = str(tmp_path / "t")
    _commit_three(spark, tbl)  # v1 overwrite, v2 append, v3 overwrite
    ss.set_ref(tbl, "eval-freeze", 1)
    assert ss.refs(tbl) == {"eval-freeze": 1}
    v1_ids = _ids(spark, tbl, 1)
    assert sorted(
        r["doc_id"]
        for r in ss.read_snapshot(spark, tbl, ref="eval-freeze").collect()
    ) == v1_ids

    res = ss.expire_snapshots(tbl, keep_last=1)  # would expire v1+v2
    assert res["expired_versions"] == [2]  # v1 pinned by the ref
    assert _ids(spark, tbl, 1) == v1_ids  # still readable by version too

    ss.set_ref(tbl, "eval-freeze", None)  # drop the ref
    assert ss.refs(tbl) == {}
    res = ss.expire_snapshots(tbl, keep_last=1)
    assert res["expired_versions"] == [1]
    with pytest.raises(FileNotFoundError):
        ss.read_snapshot(spark, tbl, version=1)

    with pytest.raises(FileNotFoundError):
        ss.read_snapshot(spark, tbl, ref="nope")
    with pytest.raises(FileNotFoundError):
        ss.set_ref(tbl, "bad", 99)  # refs only point at committed versions
    with pytest.raises(ValueError, match="not both"):
        ss.read_snapshot(spark, tbl, version=3, ref="x")


def test_concurrent_commit_conflict_detected_never_clobbers(spark, tmp_path):
    """Two writers commit against the same parent (VERDICT r3 #7).  The
    loser must detect the pointer move and refuse — and, crucially, the
    winner's committed DATA must be physically untouched (writer-unique
    data dirs: under the old data/v{N} naming the loser's
    mode=overwrite data write clobbered the winner's files even if its
    metadata commit was then refused)."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    base = _base(spark)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 0),
                       op="overwrite")

    # writer A plans against parent=1 and finishes its data write
    parent_a = ss.current_version(tbl)
    rel_a = ss._write_data(tbl, base.where(F.col("doc_id") % 3 == 1), 2)
    # writer B commits first (the interleave)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 2),
                       op="append")
    b_ids = _ids(spark, tbl, 2)
    # writer A's metadata commit must lose, loudly
    with pytest.raises(ss.SnapshotConflictError):
        ss._try_commit_metadata(tbl, rel_a, "append", None, parent_a)
    # the table is exactly as B left it; A left no manifest
    assert ss.current_version(tbl) == 2
    assert _ids(spark, tbl, 2) == b_ids
    assert [m["version"] for m in ss.snapshot_log(tbl)] == [1, 2]
    # A's orphan data dir is swept as unreferenced
    res = ss.expire_snapshots(tbl, keep_last=10)
    assert res["removed_data_dirs"] == [rel_a]


def test_commit_retrying_wins_after_conflict_reusing_data(spark, tmp_path):
    """commit_snapshot_retrying re-attempts only the METADATA commit
    against the new current: the conflicting append lands at the next
    version, its rows stack on the winner's, and the data dir written
    before the conflict is the one committed (no data rewrite)."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    base = _base(spark)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 0),
                       op="overwrite")

    real_write = ss._write_data
    interleaved = {}

    def write_then_lose_the_race(table_dir, df, version_label):
        rel = real_write(table_dir, df, version_label)
        interleaved["rel"] = rel
        ss._write_data = real_write  # interleave once (unpatch first:
        # the concurrent commit below goes through _write_data itself)
        # a concurrent writer publishes between our data write and our
        # metadata commit
        ss.commit_snapshot(spark, table_dir,
                           base.where(F.col("doc_id") % 3 == 2), op="append")
        return rel

    ss._write_data = write_then_lose_the_race
    try:
        v = ss.commit_snapshot_retrying(
            spark, tbl, base.where(F.col("doc_id") % 3 == 1), op="append"
        )
    finally:
        ss._write_data = real_write
    assert v == 3
    # the manifest committed the pre-conflict data dir at the new slot
    assert ss.snapshot_log(tbl)[-1]["files"][-1] == interleaved["rel"]
    all_ids = sorted(r["doc_id"] for r in _base(spark).collect())
    assert _ids(spark, tbl) == all_ids  # 0-slice + 2-slice + 1-slice
    # nothing to sweep: every dir written is referenced
    assert ss.expire_snapshots(tbl, keep_last=10)["removed_data_dirs"] == []


def test_commit_retrying_tag_idempotent_when_twin_wins(spark, tmp_path):
    """If the conflicting winner carried OUR tag (a replayed producer
    racing its own twin), the retry recognizes the tag and skips
    instead of double-appending."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    base = _base(spark)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 0),
                       op="overwrite")

    real_write = ss._write_data

    def write_then_twin_commits(table_dir, df, version_label):
        rel = real_write(table_dir, df, version_label)
        ss._write_data = real_write  # unpatch before the twin's commit
        ss.commit_snapshot(spark, table_dir,
                           base.where(F.col("doc_id") % 3 == 1),
                           op="append", tag="batch-7")
        return rel

    ss._write_data = write_then_twin_commits
    try:
        v = ss.commit_snapshot_retrying(
            spark, tbl, base.where(F.col("doc_id") % 3 == 1),
            op="append", tag="batch-7",
        )
    finally:
        ss._write_data = real_write
    assert v == 2  # the twin's commit; ours was skipped
    assert ss.current_version(tbl) == 2
    assert sum(m.get("tag") == "batch-7" for m in ss.snapshot_log(tbl)) == 1
    all_01 = sorted(r["doc_id"] for r in _base(spark).collect()
                    if r["doc_id"] % 3 in (0, 1))
    assert _ids(spark, tbl) == all_01  # appended exactly once


def test_publish_crash_window_is_retryable_not_expirable(spark, tmp_path):
    """ADVICE r3 (medium): publish_snapshot now swaps the pointer FIRST
    and clears the staged flag after.  Simulate a crash between the two
    steps (pointer says v2, manifest still flagged staged): the
    snapshot must be readable, listed in the log as published, immune
    to expiry, and a publish RETRY must complete idempotently — under
    the old order this exact state lost an audit-passed snapshot to the
    expiry sweep."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    base = _base(spark)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 0),
                       op="overwrite")
    v = ss.stage_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 1),
                          op="append")
    assert v == 2

    # simulate: publish crashed right after its pointer swap
    with open(os.path.join(tbl, "meta", ".tmp-current"), "w") as f:
        json.dump({"version": 2}, f)
    os.replace(os.path.join(tbl, "meta", ".tmp-current"),
               os.path.join(tbl, "meta", "current"))

    want = sorted(r["doc_id"] for r in base.collect()
                  if r["doc_id"] % 3 in (0, 1))
    # published for every reader, despite the leftover flag
    assert ss.current_version(tbl) == 2
    assert _ids(spark, tbl) == want
    assert _ids(spark, tbl, 2) == want
    log = ss.snapshot_log(tbl)
    assert [m["version"] for m in log] == [1, 2]
    assert log[-1]["staged"] is False  # normalized: the pointer decides
    with pytest.raises(ValueError, match="published"):
        ss.read_staged(spark, tbl, 2)
    with pytest.raises(ValueError, match="published"):
        ss.abandon_snapshot(tbl, 2)
    # expiry must NOT treat it as an uncommitted leftover
    res = ss.expire_snapshots(tbl, keep_last=10)
    assert res["expired_versions"] == [] and res["removed_data_dirs"] == []
    assert _ids(spark, tbl) == want
    # the publish retry completes the crashed cleanup step and lands
    # idempotently
    ss.publish_snapshot(tbl, 2)
    with open(os.path.join(tbl, "meta", "v00000002.json")) as f:
        assert json.load(f)["staged"] is False
    assert _ids(spark, tbl) == want
    with pytest.raises(ValueError, match="already published"):
        ss.publish_snapshot(tbl, 2)  # a third call is a replay
    # and the table keeps working: next commit takes v3
    assert ss.commit_snapshot(
        spark, tbl, base.where(F.col("doc_id") % 3 == 2), op="append"
    ) == 3


def test_stage_snapshot_heals_phantom_manifest(spark, tmp_path):
    """ADVICE r3 (low): a crashed plain commit's phantom manifest
    (manifest published, pointer never was) must not dead-end
    stage_snapshot — it heals the slot the same way commit_snapshot
    does, and the phantom's data dir is swept as unreferenced."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    base = _base(spark)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 0),
                       op="overwrite")
    v1_ids = _ids(spark, tbl)

    # phantom at v2: data + manifest exist, pointer still says v1
    base.limit(3).write.parquet(os.path.join(tbl, "data", "v00000002-dead"))
    with open(os.path.join(tbl, "meta", "v00000002.json"), "w") as f:
        json.dump({"version": 2, "parent": 1, "op": "append",
                   "files": ["data/v00000002-dead"]}, f)

    v = ss.stage_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 1),
                          op="append")
    assert v == 2  # healed in place, not dead-ended
    assert ss.current_version(tbl) == 1  # still invisible (staged)
    assert _ids(spark, tbl) == v1_ids
    ss.publish_snapshot(tbl, 2)
    want = sorted(r["doc_id"] for r in base.collect()
                  if r["doc_id"] % 3 in (0, 1))
    assert _ids(spark, tbl) == want
    # the phantom's data dir is unreferenced garbage for the sweep
    res = ss.expire_snapshots(tbl, keep_last=10)
    assert res["removed_data_dirs"] == ["data/v00000002-dead"]


def test_hammered_concurrent_retrying_commits_stay_consistent(spark, tmp_path):
    """Round-4 review regression: under the lock-free protocol a loser's
    post-replace cleanup could os.remove the manifest slot a winning
    racer's pointer had just started referencing, leaving a dangling
    current pointer.  Now the metadata phase is serialized by
    _commit_lock, so N threads of commit_snapshot_retrying must land N
    contiguous versions with every manifest loadable and every
    committed row present exactly once."""
    import threading

    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    base = _base(spark)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") == 0),
                       op="overwrite")

    n_threads, per_thread = 4, 2
    errors = []

    def writer(k):
        try:
            for j in range(per_thread):
                doc = 1 + k * per_thread + j
                ss.commit_snapshot_retrying(
                    spark, tbl, base.where(F.col("doc_id") == doc),
                    op="append", max_retries=50,
                )
        except Exception as ex:  # noqa: BLE001 — surfaced via the list
            errors.append(ex)

    threads = [threading.Thread(target=writer, args=(k,)) for k in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    n_commits = n_threads * per_thread
    assert ss.current_version(tbl) == 1 + n_commits
    log = ss.snapshot_log(tbl)
    assert [m["version"] for m in log] == list(range(1, n_commits + 2))
    # every manifest the pointer chain names is loadable (the reviewed
    # bug deleted one), and the data is the union of all commits
    for m in log:
        ss._load_manifest(tbl, m["version"])
    assert _ids(spark, tbl) == list(range(n_commits + 1))


def test_stage_loses_to_concurrent_commit_loudly(spark, tmp_path):
    """A plain commit publishing during a stage's data write moves the
    pointer; the stage must raise SnapshotConflictError under the lock
    instead of staging a manifest at a slot the winner's successor
    commit is about to take (pre-lock behavior staged at the stale
    slot silently)."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    base = _base(spark)
    ss.commit_snapshot(spark, tbl, base.where(F.col("doc_id") % 3 == 0),
                       op="overwrite")

    real_write = ss._write_data

    def write_then_racer_commits(table_dir, df, version_label):
        rel = real_write(table_dir, df, version_label)
        ss._write_data = real_write
        ss.commit_snapshot(spark, table_dir,
                           base.where(F.col("doc_id") % 3 == 2), op="append")
        return rel

    ss._write_data = write_then_racer_commits
    try:
        with pytest.raises(ss.SnapshotConflictError):
            ss.stage_snapshot(spark, tbl,
                              base.where(F.col("doc_id") % 3 == 1),
                              op="append")
    finally:
        ss._write_data = real_write
    # the winner's commit stands; no staged manifest was left behind
    assert ss.current_version(tbl) == 2
    assert all(not m.get("staged") for m in ss.snapshot_log(tbl))
    # the loser's data dir is sweepable garbage
    assert ss.expire_snapshots(tbl, keep_last=10)["removed_data_dirs"]


def test_commit_lock_excludes_across_processes(tmp_path):
    """_commit_lock is fcntl.flock, so exclusion must hold between
    PROCESSES, not just threads (the hammer test above shares one
    interpreter).  Two workers increment a non-atomic counter file 200
    times each under the lock; any interleaving loses increments."""
    import multiprocessing as mp

    tbl = str(tmp_path / "t")
    counter = tmp_path / "counter.txt"
    counter.write_text("0")

    def worker(n):
        for _ in range(n):
            with ss._commit_lock(tbl):
                v = int(counter.read_text())
                counter.write_text(str(v + 1))

    ctx = mp.get_context("fork")
    ps = [ctx.Process(target=worker, args=(200,)) for _ in range(2)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
        assert p.exitcode == 0
    assert counter.read_text() == "400"
