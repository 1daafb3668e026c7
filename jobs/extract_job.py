#!/usr/bin/env python
"""spark-submit entry point: resumable extraction job.

Deploy (north_rule: spark-submit --py-files on a multi-executor cluster):

    scripts/submit.sh --mode synth --n-docs 5000 \
        --output /tmp/out --checkpoint /tmp/cp --n-parts 64

Modes:
  synth     generate the corpus on the executors (deterministic, --seed)
  testdata  derive spans from $SF_DIR/documents.parquet (--sf-dir)
  parquet   read pre-generated --input-docs/--input-media parquet

Prints one JSON line with wall time + docs/sec (the BASELINE metric)
and the per-partition lineage rows appended to the checkpoint table.
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

# when run directly (not via spark-submit --py-files), use the repo checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def build_session(cpus: int | None, exec_mode: str | None = None) -> SparkSession:
    from ocr_gang_spark.session import build_session as _bs

    return _bs("extract_job", cpus=cpus, exec_mode=exec_mode)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["synth", "testdata", "parquet"], default="synth")
    p.add_argument("--n-docs", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--skew-frac", type=float, default=0.01)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--input-docs")
    p.add_argument("--input-media")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--n-parts", type=int, default=64)
    p.add_argument("--run-id", default=None)
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--weights-mlp", default=None)
    p.add_argument("--weights-cnn", default=None)
    p.add_argument("--warmup", action=argparse.BooleanOptionalAction, default=True)
    # optional Hough deskew before OCR (pipeline.deskew_page) — off by
    # default: the acceptance invariant is equality with the reference
    # binary, which has no deskew; a no-op on straight pages either way
    p.add_argument("--deskew", action="store_true")
    # 'quarantine' turns corrupt blobs into kind='error' spans instead of
    # failed tasks (pipeline.extract_media_spans); pinned in the resume
    # manifest like every output-affecting option
    p.add_argument("--on-error", choices=["fail", "quarantine"], default="fail")
    # 'processes' runs N separate single-core executor JVMs
    # (local-cluster[N,1,M]) instead of N threads in one JVM — the honest
    # stand-in for the north rule's "N executors vs 4N executors"
    p.add_argument("--exec-mode", choices=["threads", "processes"],
                   default=None)
    p.add_argument("--compact-target-bytes", type=int, default=None,
                   help="after the run, compact small-file output "
                        "partitions up to this size into one file each "
                        "(the Iceberg OPTIMIZE analog)")
    args = p.parse_args()
    if args.mode == "parquet" and not (args.input_docs and args.input_media):
        p.error("--mode parquet requires --input-docs and --input-media")

    spark = build_session(args.cpus, exec_mode=args.exec_mode)

    from ocr_gang_spark.checkpoint import run_extraction
    from ocr_gang_spark.kernels.nn import load_weights
    from ocr_gang_spark.pipeline import DEFAULT_CNN, DEFAULT_MLP
    from ocr_gang_spark.synth import spans_from_testdata, synth_documents, synth_media

    weights = load_weights(
        args.weights_mlp or DEFAULT_MLP, args.weights_cnn or DEFAULT_CNN
    )
    weights_bc = spark.sparkContext.broadcast(weights)

    if args.warmup:
        # warm the executor python workers (imports + broadcast fetch)
        # before the timed run: steady-state throughput is the metric —
        # a real cluster job amortizes worker startup over hours
        wdocs = synth_documents(spark, 128, seed=1)
        wmedia = synth_media(spark, wdocs)
        from ocr_gang_spark.pipeline import extract_documents

        extract_documents(wdocs, wmedia, weights_bc).write.mode("overwrite").format(
            "noop"
        ).save()

    if args.mode == "synth":
        docs = synth_documents(spark, args.n_docs, seed=args.seed, skew_frac=args.skew_frac)
        media = synth_media(spark, docs)
    elif args.mode == "testdata":
        docs = spans_from_testdata(spark, args.sf_dir, seed=args.seed)
        media = synth_media(spark, docs)
    else:
        docs = spark.read.parquet(args.input_docs)
        media = spark.read.parquet(args.input_media)

    t0 = time.time()
    result = run_extraction(
        spark, docs, media, args.output, args.checkpoint,
        n_parts=args.n_parts, run_id=args.run_id, weights_bc=weights_bc,
        deskew=args.deskew, on_error=args.on_error,
    )
    wall = time.time() - t0
    line = {
        "run_id": result.run_id,
        "mode": args.mode,
        "n_parts_processed": result.n_parts_processed,
        "n_docs": result.n_docs,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(result.n_docs / wall, 2) if wall > 0 else None,
    }
    if args.compact_target_bytes:
        from ocr_gang_spark.checkpoint import compact_output

        c = compact_output(spark, args.output,
                           target_bytes=args.compact_target_bytes)
        line["compacted_parts"] = c.n_parts_compacted
        line["compacted_files"] = f"{c.files_before}->{c.files_after}"
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
