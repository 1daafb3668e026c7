#!/usr/bin/env python
"""Skew-treatment evidence (VERDICT r2 #7): prove, not describe.

Runs the extraction media branch on a deliberately skewed corpus
(``--skew-frac`` of documents carry 50-200 media spans, the rest 1-8)
twice — WITH the span-explode + media_ref-hash treatment (the shipped
plan) and WITHOUT it (the naive whole-document-per-task counterfactual:
same join, OCR stage re-partitioned by doc_id) — with Spark event
logging on, then parses per-task run times of the OCR stage from the
event log and reports median / p99 / max task time and the p99/median
straggler ratio for both, plus wall clock.

Usage:
    python scripts/skew_bench.py [--n-docs 3000] [--skew-frac 0.2] [--cpus 8]

Appends a markdown table to BENCH/NOTES.md with --write-notes.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

from ocr_gang_spark.hostprobe import ProbeSampler  # noqa: E402


def ocr_stage_task_times(event_dir: str) -> dict:
    """Per-task run times (ms) of the heaviest stage in the app's event
    log — for these jobs that is always the OCR mapInPandas stage."""
    stages: dict[int, list[float]] = {}
    paths = []
    for dirpath, _dirs, files in os.walk(event_dir):
        paths += [os.path.join(dirpath, n) for n in files if "appstatus" not in n]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                # failed/killed attempts are retried; counting both the
                # failure and its retry would inflate the distribution
                reason = (ev.get("Task End Reason") or {}).get("Reason")
                if reason != "Success":
                    continue
                info = ev.get("Task Info", {})
                metrics = ev.get("Task Metrics") or {}
                run = metrics.get("Executor Run Time")
                if run is None:
                    run = info.get("Finish Time", 0) - info.get("Launch Time", 0)
                stages.setdefault(ev.get("Stage ID", -1), []).append(float(run))
    if not stages:
        raise RuntimeError(f"no TaskEnd events under {event_dir}")
    sid, times = max(stages.items(), key=lambda kv: sum(kv[1]))
    times.sort()

    def pct(p: float) -> float:
        return times[min(len(times) - 1, int(p * (len(times) - 1) + 0.5))]

    med = pct(0.5)
    return {
        "stage_id": sid,
        "n_tasks": len(times),
        "median_ms": round(med, 1),
        "p99_ms": round(pct(0.99), 1),
        "max_ms": round(times[-1], 1),
        "p99_over_median": round(pct(0.99) / max(med, 1e-9), 2),
        "max_over_median": round(times[-1] / max(med, 1e-9), 2),
    }


def run_variant(treated: bool, base: str, cpus: int) -> dict:
    """One spark-session run of the media branch over the pre-generated
    corpus; returns wall time + OCR-stage task stats from its event log."""
    event_dir = f"{base}/events_{'treated' if treated else 'naive'}"
    shutil.rmtree(event_dir, ignore_errors=True)
    os.makedirs(event_dir)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"skew-{'treated' if treated else 'naive'}")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.eventLog.dir", f"file://{event_dir}")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        .getOrCreate()
    )
    try:
        from ocr_gang_spark.pipeline import (
            broadcast_weights,
            explode_spans,
            extract_media_spans,
        )

        docs = spark.read.parquet(f"{base}/docs")
        media = spark.read.parquet(f"{base}/media")
        bc = broadcast_weights(spark)
        df = extract_media_spans(
            explode_spans(docs), media, bc, skew_treatment=treated
        )
        # warm the python workers outside the timed window
        extract_media_spans(
            explode_spans(docs.limit(8)), media, bc, skew_treatment=treated
        ).write.mode("overwrite").format("noop").save()
        with ProbeSampler() as ps:
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            wall = time.time() - t0
    finally:
        spark.stop()
    time.sleep(2)  # let the event log flush
    stats = ocr_stage_task_times(event_dir)
    stats.update(
        variant="treated" if treated else "naive",
        wall_sec=round(wall, 2),
        probe_mean=ps.mean,
        quiet=ps.quiet,
    )
    return stats


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=3000)
    p.add_argument("--skew-frac", type=float, default=0.2)
    p.add_argument("--heavy-lo", type=int, default=50)
    p.add_argument("--heavy-hi", type=int, default=200)
    p.add_argument("--cpus", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--base", default="/tmp/skew_bench")
    p.add_argument("--write-notes", action="store_true")
    args = p.parse_args()

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

    # corpus prep (once, full parallelism, untimed)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ocr_gang_spark.synth import synth_documents, synth_media

    docs = synth_documents(
        spark, args.n_docs, seed=args.seed, skew_frac=args.skew_frac,
        heavy_spans=(args.heavy_lo, args.heavy_hi),
    )
    synth_media(spark, docs).write.mode("overwrite").parquet(f"{args.base}/media")
    docs.write.mode("overwrite").parquet(f"{args.base}/docs")
    spark.stop()

    results = [
        run_variant(False, args.base, args.cpus),
        run_variant(True, args.base, args.cpus),
    ]
    for r in results:
        print(json.dumps(r))

    if args.write_notes:
        naive, treated = results[0], results[1]
        lines = [
            "",
            f"### Skew treatment A/B (skew_frac={args.skew_frac}, "
            f"heavy_spans=({args.heavy_lo},{args.heavy_hi}), "
            f"n_docs={args.n_docs}, local[{args.cpus}], OCR stage task times "
            "from the Spark event log)",
            "",
            "| variant | OCR tasks | median ms | p99 ms | max ms | p99/median | max/median | wall s | probe |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        for r in (naive, treated):
            lines.append(
                f"| {r['variant']} | {r['n_tasks']} | {r['median_ms']} | "
                f"{r['p99_ms']} | {r['max_ms']} | {r['p99_over_median']} | "
                f"{r['max_over_median']} | {r['wall_sec']} | {r['probe_mean']} |"
            )
        lines.append("")
        with open(os.path.join(ROOT, "BENCH", "NOTES.md"), "a") as f:
            f.write("\n".join(lines) + "\n")
        print("appended to BENCH/NOTES.md")


if __name__ == "__main__":
    main()
