#!/usr/bin/env python
"""Probe-gated scaling runs for the CURATION job (quality -> dedup ->
packing), the shuffle-bound complement to the extraction job's
kernel-bound scaling evidence (scripts/quiet_runs.py).

Prepares a flat-documents corpus once (reused across runs), then runs
jobs/curate_job.py at the given parallelism from a fresh checkpoint each
time, gated and probe-sampled exactly like the extraction collector.

Usage:
    python scripts/curate_scaling.py --cpus 8 --runs 1 [--n-docs 100000]
        [--gate 0.45] [--base /tmp/ocr_gang_curate] [--out /tmp/qcur8.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

from ocr_gang_spark.hostprobe import ProbeSampler, steal_probe  # noqa: E402


def prep_input(n_docs: int, seed: int, base: str) -> str:
    docs_dir = f"{base}/docs{n_docs}"
    if os.path.exists(os.path.join(docs_dir, "_SUCCESS")):
        return docs_dir
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    code = f"""
import sys; sys.path.insert(0, {ROOT!r})
from ocr_gang_spark.session import get_spark
from ocr_gang_spark.synth import synth_flat_documents
spark = get_spark("prep", cpus=32)
synth_flat_documents(spark, {n_docs}, seed={seed}).write.mode(
    "overwrite").parquet({docs_dir!r})
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True, cwd=ROOT, env=env)
    return docs_dir


def run_level(cpus: int, docs_dir: str, base: str, n_parts: int, rep: int) -> dict:
    out = f"{base}/out{cpus}_{rep}"
    cp = f"{base}/cp{cpus}_{rep}"
    for d in (out, cp, cp.rstrip("/") + "_decisions"):
        shutil.rmtree(d, ignore_errors=True)
    env = dict(
        os.environ, SPARK_GRAFT_CPUS=str(cpus),
        OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1", MKL_NUM_THREADS="1",
    )
    t0 = time.time()
    with ProbeSampler() as ps:
        proc = subprocess.run(
            [
                sys.executable, os.path.join(ROOT, "jobs", "curate_job.py"),
                "--mode", "parquet", "--input-docs", docs_dir,
                "--output", out, "--checkpoint", cp,
                "--n-parts", str(n_parts), "--cpus", str(cpus),
            ],
            capture_output=True, text=True, cwd=ROOT, env=env, check=True,
        )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    res["total_wall_sec"] = round(time.time() - t0, 1)
    res["cpus"] = cpus
    res["n_docs_in"] = None  # filled by caller if known
    res["steal_probe_sec"] = ps.mean
    res["steal_probe_max"] = ps.max
    return res


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, required=True)
    p.add_argument("--runs", type=int, default=1)
    p.add_argument("--n-docs", type=int, default=100000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--gate", type=float, default=0.45)
    p.add_argument("--base", default="/tmp/ocr_gang_curate")
    p.add_argument("--n-parts", type=int, default=32)
    p.add_argument("--out", default=None)
    p.add_argument("--max-minutes", type=float, default=45)
    args = p.parse_args()
    out_path = args.out or f"/tmp/qcur{args.cpus}.jsonl"

    docs_dir = prep_input(args.n_docs, args.seed, args.base)
    t_end = time.time() + args.max_minutes * 60
    done, rep = 0, 0
    while done < args.runs and time.time() < t_end:
        pr = steal_probe()
        if pr > args.gate:
            print(f"probe {pr:.3f} > gate {args.gate} — waiting", flush=True)
            time.sleep(45)
            continue
        print(f"probe {pr:.3f} — launching curate local[{args.cpus}]", flush=True)
        r = run_level(args.cpus, docs_dir, args.base, args.n_parts, rep)
        r["gate_probe_sec"] = pr
        r["n_docs_in"] = args.n_docs
        with open(out_path, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)
        rep += 1
        done += 1


if __name__ == "__main__":
    main()
