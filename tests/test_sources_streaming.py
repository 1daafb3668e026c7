"""S2/S3 binaryFile training-dir scan + Structured Streaming parity."""

import numpy as np
import pytest

from ocr_gang_spark.kernels.nn import load_weights, classify
from ocr_gang_spark.pipeline import DEFAULT_CNN, DEFAULT_MLP
from ocr_gang_spark.sources import load_training_set, write_glyph_fixture_dir
from ocr_gang_spark.streaming import (
    windowed_event_counts_batch,
    windowed_event_counts_stream,
)

SF = "/root/testdata/sf0.001"


def test_training_dir_scan_labels_and_classification(spark, tmp_path):
    base = str(tmp_path / "glyphs")
    write_glyph_fixture_dir(base, per_class=3)
    ds = load_training_set(spark, base)
    rows = ds.collect()
    assert len(rows) == 52 * 3
    labels = {r.label for r in rows}
    assert len(labels) == 52

    # the normalized pixels classify back to the filename label with the
    # committed fixture weights (S2 pipeline end-to-end)
    w = load_weights(DEFAULT_MLP, DEFAULT_CNN)
    mats = np.array([r.pixels for r in rows], dtype=np.float64).reshape(-1, 28, 28)
    preds = classify(mats, w)
    acc = float(np.mean(preds == np.array([r.label for r in rows])))
    assert acc == 1.0


def test_training_dir_case_coercion(spark, tmp_path):
    # files in maj/ get uppercase labels regardless of filename case
    # (reference tools.c:562-564)
    base = str(tmp_path / "glyphs2")
    write_glyph_fixture_dir(base, per_class=1)
    ds = load_training_set(spark, base)
    for r in ds.collect():
        if "/maj/" in r.path:
            assert r.label.isupper()
        else:
            assert r.label.islower()


def test_empty_training_dir_raises(spark, tmp_path):
    base = str(tmp_path / "empty")
    (tmp_path / "empty" / "maj").mkdir(parents=True)
    (tmp_path / "empty" / "min").mkdir(parents=True)
    with pytest.raises(Exception):
        load_training_set(spark, base)


def test_streaming_matches_batch(spark, tmp_path):
    got = windowed_event_counts_stream(
        spark, SF, checkpoint=str(tmp_path / "cp"), out_table="t_stream_counts"
    )
    expected = windowed_event_counts_batch(spark, SF)
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in expected.collect()}
    assert g == e and len(g) > 0


def test_watermark_drops_late_events(spark, tmp_path):
    """Watermark late-data contract (VERDICT r2 #8): an event arriving
    more than the watermark delay behind the observed max event time is
    DROPPED; an out-of-order event still inside the delay is ACCEPTED.
    The batch query (no watermark) counts both, so if the watermark
    silently stopped dropping, the streamed window-0 count would equal
    the batch count and this test fails."""
    import os
    import time as _time

    import pandas as pd

    from ocr_gang_spark.streaming import windowed_event_counts_stream_append

    def mk(ts_list, start_id):
        return pd.DataFrame({
            "event_id": pd.array(range(start_id, start_id + len(ts_list)), dtype="int64"),
            "ts": pd.to_datetime(ts_list),
            "user_id": pd.array([1] * len(ts_list), dtype="int64"),
            "event_type": ["click"] * len(ts_list),
            "value": [1.0] * len(ts_list),
            "props": ["{}"] * len(ts_list),
        })

    events_dir = tmp_path / "late_ev"
    events_dir.mkdir()
    # batch A: 3 on-time window-0 events + a 05:00 event that advances
    # the watermark to 03:00 (max ts - 2h)
    a = mk(["2024-01-01 00:10", "2024-01-01 00:20", "2024-01-01 00:30",
            "2024-01-01 05:00"], 1)
    # batch B: advances the watermark to 07:00, finalizing and emitting
    # window 0 (empirically the late filter lags the reported watermark
    # by one batch, so the drop must be provoked a batch later)
    b = mk(["2024-01-01 09:00"], 10)
    # batch C: 00:40 is hours behind the watermark and its window was
    # already emitted+evicted -> DROPPED; 06:30 is out-of-order (behind
    # batch B's 09:00) but within the 2h delay -> ACCEPTED, and its
    # window [06:00,07:00) finalizes at the final 07:30 watermark
    c = mk(["2024-01-01 00:40", "2024-01-01 06:30", "2024-01-01 09:30"], 20)
    now = _time.time()
    for i, frame in enumerate([a, b, c]):
        path = str(events_dir / f"part-{i}.parquet")
        # pandas defaults to ns-precision INT64 timestamps which Spark's
        # parquet reader refuses; coerce to micros
        frame.to_parquet(path, index=False, coerce_timestamps="us")
        os.utime(path, (now + i, now + i))  # deterministic batch order

    got = windowed_event_counts_stream_append(
        spark, str(events_dir), checkpoint=str(tmp_path / "cp_late"),
        out_table="t_late_counts",
    )
    counts = {r["window_start"].hour: r["n_events"] for r in got.collect()}

    batch = spark.read.parquet(str(events_dir))
    from pyspark.sql import functions as F
    batch_counts = {
        r["w"]["start"].hour: r["n"]
        for r in batch.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n")).collect()
    }

    assert batch_counts[0] == 4  # batch sees all 4 incl. the late one
    assert counts[0] == 3, f"late event not dropped: {counts}"  # stream drops it
    assert counts[6] == 1, f"in-watermark out-of-order event lost: {counts}"
    assert counts[5] == 1
    # hour-9 windows never finalize (watermark stops at 07:30) so
    # append mode must not have emitted them
    assert 9 not in counts


def test_stream_dedup_readmits_after_state_eviction(spark, tmp_path):
    """dropDuplicatesWithinWatermark's documented weaker guarantee: a
    duplicate arriving AFTER its key's state aged out of the watermark
    window is re-emitted.  The driver query avoids this by sizing the
    watermark to the corpus span; this pins the caveat so the guarantee
    is never silently overstated."""
    import os
    import time as _time

    import pandas as pd

    from ocr_gang_spark.streaming import dedup_events_stream

    def mk(rows, start_id=1):
        ids, tss = zip(*rows)
        return pd.DataFrame({
            "event_id": pd.array(ids, dtype="int64"),
            "ts": pd.to_datetime(list(tss)),
            "user_id": pd.array([1] * len(rows), dtype="int64"),
            "event_type": ["click"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        })

    d = tmp_path / "dedup_ev"
    d.mkdir()
    files = [
        mk([(1, "2024-01-01 00:00"), (2, "2024-01-01 00:10")]),
        # advances the watermark to 08:00 — id 1's state (kept for the
        # 2h delay past its event time) is now expirable
        mk([(3, "2024-01-01 10:00")]),
        # filler batch: state cleanup lags the watermark by one batch
        # (same empirical lag as the late-data filter above), so id 1's
        # entry is physically removed during THIS batch
        mk([(4, "2024-01-01 10:15")]),
        # duplicate of id 1, in-watermark ts, arriving after eviction
        mk([(1, "2024-01-01 09:00")]),
    ]
    now = _time.time()
    for i, frame in enumerate(files):
        sub = d / f"part{i:02d}"
        sub.mkdir()
        path = str(sub / "data.parquet")
        frame.to_parquet(path, index=False, coerce_timestamps="us")
        os.utime(path, (now + i, now + i))

    got = dedup_events_stream(
        spark, str(d), checkpoint=str(tmp_path / "cp_dedup"),
        out_table="t_dedup_readmit", watermark="2 hours",
    )
    rows = got.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["event_id"], []).append(r["ts"].hour)
    assert by_id[2] == [0] and by_id[3] == [10] and by_id[4] == [10]
    # the caveat: id 1 appears TWICE (original + post-eviction dup)
    assert sorted(by_id[1]) == [0, 9], f"readmission caveat drifted: {by_id}"


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over 4 time-ordered
    micro-batches must equal the batch window/lag sessionize query —
    state (last event time, counts) genuinely crosses batch boundaries
    because each file holds a disjoint time range."""
    from ocr_gang_spark.contract import queries
    from ocr_gang_spark.streaming import sessionize_stream, write_time_split_events

    events_dir = write_time_split_events(spark, SF, str(tmp_path / "ev"), n_files=4)
    got = sessionize_stream(
        spark, events_dir, checkpoint=str(tmp_path / "cp"),
        out_table="t_stream_sessions",
    )
    expected = queries()["sessionize_events"](spark, SF)
    g = {(r.user_id, r.n_sessions, r.n_events) for r in got.collect()}
    e = {(r.user_id, r.n_sessions, r.n_events) for r in expected.collect()}
    assert g == e and len(g) > 0


def test_foreachbatch_sink_replay_is_idempotent(spark, tmp_path):
    """The shared foreachBatch parquet sink must absorb a micro-batch
    REPLAY (crash between sink commit and checkpoint advance) without
    duplicating rows — the at-least-once hole the plain append sinks
    had (r3 self-review)."""
    from ocr_gang_spark.streaming import read_batches, write_batch_idempotent

    out = str(tmp_path / "sink")
    b0 = spark.range(0, 5).withColumnRenamed("id", "k")
    b1 = spark.range(5, 8).withColumnRenamed("id", "k")
    write_batch_idempotent(b0, out, 0)
    write_batch_idempotent(b1, out, 1)
    write_batch_idempotent(b1, out, 1)  # replay of batch 1
    got = sorted(r.k for r in read_batches(spark, out).collect())
    assert got == list(range(8))
    assert read_batches(spark, out).columns == ["k"]


def test_extraction_stream_multi_batch_matches_batch(spark, tmp_path):
    """The flagship as a stream: >=2 genuine micro-batches, and the
    streamed output equals the batch pipeline's row for row (documents
    are the unit of work, so batch boundaries cannot split one)."""
    import os

    from ocr_gang_spark.pipeline import broadcast_weights, extract_documents
    from ocr_gang_spark.streaming import extraction_stream
    from ocr_gang_spark.synth import synth_documents, synth_media

    docs = synth_documents(spark, 24, seed=7, skew_frac=0.0)
    media = synth_media(spark, docs)
    out = extraction_stream(spark, docs, media, str(tmp_path), n_files=3)

    markers = os.listdir(tmp_path / "batches")
    assert len(markers) >= 2, markers

    batch = extract_documents(docs, media, broadcast_weights(spark))
    got = {r.doc_id: [tuple(s) for s in r.spans] for r in out.collect()}
    want = {r.doc_id: [tuple(s) for s in r.spans] for r in batch.collect()}
    assert got == want and len(got) == 24


def test_stream_join_drops_pair_whose_click_state_was_evicted(spark, tmp_path):
    """Bounded-state guarantee of the stream-stream attribution join:
    a purchase whose event-time lies days behind the advanced watermark
    (its matching click's state long evicted) must produce NO pair,
    even though the batch interval join over the same rows would match
    it.  This is what makes state size O(watermark x rate), not O(N)."""
    import pyspark.sql.functions as F

    from ocr_gang_spark.streaming import (
        _write_time_sliced,
        attribution_join_stream,
    )

    LATE_ID = 9_999_999

    def late_purchase(k, events, lo_e, step):
        if k != 3:
            return None
        first_click = (
            events.where(
                (F.col("event_type") == "click")
                & (F.unix_timestamp("ts") < lo_e + step)
            )
            .orderBy("ts")
            .limit(1)
        )
        return first_click.select(
            F.lit(LATE_ID).cast("long").alias("event_id"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("ts"),
            "user_id",
            F.lit("purchase").alias("event_type"),
            "value",
            "props",
        )

    events_dir = _write_time_sliced(
        spark, SF, str(tmp_path / "attr_ev"), 4, extra_rows=late_purchase
    )
    got = attribution_join_stream(
        spark, events_dir, checkpoint=str(tmp_path / "cp_attr"),
        out_table="t_attr_evict",
    )
    # sanity: the batch interval join over the SAME input files WOULD
    # match the injected late purchase — the stream's omission is the
    # watermark at work, not a missing row
    allrows = spark.read.option("recursiveFileLookup", "true").parquet(events_dir)
    c = allrows.where(F.col("event_type") == "click").alias("c")
    p = allrows.where(F.col("event_type") == "purchase").alias("p")
    batch = c.join(
        p,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(F.col("c.event_id").alias("click_id"),
             F.col("p.event_id").alias("purchase_id"))
    assert batch.where(F.col("purchase_id") == LATE_ID).count() == 1
    assert got.where(F.col("purchase_id") == LATE_ID).count() == 0
    # and every on-time pair is still present
    on_time = {(r.click_id, r.purchase_id)
               for r in batch.where(F.col("purchase_id") != LATE_ID).collect()}
    got_pairs = {(r.click_id, r.purchase_id) for r in got.collect()}
    assert got_pairs == on_time


def test_cdc_generation_replay_is_idempotent(spark, tmp_path):
    """A replayed CDC micro-batch (crash between the gen-<bid> write and
    the checkpoint advance) must merge against its PREDECESSOR
    generation, not the gen-<bid> it is rewriting — the code-review bug
    was prev = gens[-1], which on replay read the batch's own output and
    double-counted n_versions."""
    import os

    from ocr_gang_spark.streaming import cdc_merge_generation

    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl)
    b0 = spark.createDataFrame(
        [(1, 0, "I", "a"), (2, 0, "I", "b")],
        "doc_id bigint, version int, op string, text string",
    )
    b1 = spark.createDataFrame(
        [(1, 1, "U", "a2")],
        "doc_id bigint, version int, op string, text string",
    )
    cdc_merge_generation(spark, tbl, b0, 0)
    cdc_merge_generation(spark, tbl, b1, 1)
    snap = sorted(
        tuple(r) for r in spark.read.parquet(tbl + "/gen-1").collect()
    )
    cdc_merge_generation(spark, tbl, b1, 1)  # replay of batch 1
    got = sorted(
        tuple(r) for r in spark.read.parquet(tbl + "/gen-1").collect()
    )
    assert got == snap
    nv = {r.doc_id: r.n_versions for r in
          spark.read.parquet(tbl + "/gen-1").collect()}
    assert nv == {1: 2, 2: 1}  # not {1: 3, ...}
