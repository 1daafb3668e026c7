#!/usr/bin/env python
"""spark-submit entry point: resumable corpus-curation job.

Quality filter -> near-dup dedup (LSH -> exact Jaccard -> connected
components) -> training-sequence packing -> partitioned materialization
with a done-part ledger (see ocr_gang_spark/curation.py for the
two-phase design and its resume semantics).

Deploy exactly like the extraction job:

    scripts/submit.sh --job curate --mode synth --n-docs 5000 \
        --output /tmp/cur_out --checkpoint /tmp/cur_cp --n-parts 64

Prints one JSON line with wall time, kept/dropped tallies, and bin count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def build_session(cpus: int | None, exec_mode: str | None = None) -> SparkSession:
    if os.environ.get("SPARK_SUBMIT_RUNNING") or "spark.master" in os.environ:
        return SparkSession.builder.getOrCreate()
    from ocr_gang_spark.session import get_spark

    return get_spark("curate_job", cpus=cpus, exec_mode=exec_mode)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["synth", "testdata", "parquet"], default="synth")
    p.add_argument("--n-docs", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--input-docs")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--n-parts", type=int, default=64)
    p.add_argument("--run-id", default=None)
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--exec-mode", choices=["threads", "processes"], default=None)
    args = p.parse_args()

    spark = build_session(args.cpus, exec_mode=args.exec_mode)

    from ocr_gang_spark.curation import run_curation

    if args.mode == "synth":
        from ocr_gang_spark.synth import synth_flat_documents

        docs = synth_flat_documents(spark, args.n_docs, seed=args.seed)
    elif args.mode == "testdata":
        docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    else:
        docs = spark.read.parquet(args.input_docs)

    t0 = time.time()
    result = run_curation(
        spark, docs, args.output, args.checkpoint,
        n_parts=args.n_parts, run_id=args.run_id,
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "run_id": result.run_id,
                "mode": args.mode,
                "n_parts_processed": result.n_parts_processed,
                "n_docs_out": result.n_docs_out,
                "n_dropped_quality": result.n_dropped_quality,
                "n_dropped_dedup": result.n_dropped_dedup,
                "n_bins": result.n_bins,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(result.n_docs_out / wall, 2) if wall > 0 else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
