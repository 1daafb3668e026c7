#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

A real N-vs-4N-executor run needs a cluster; in this sandbox the same
job runs at two parallelism levels (local[8] vs local[32]) on the SAME
pre-generated parquet input, reporting docs/sec at both and the scaling
efficiency  eff = throughput(32) / (4 * throughput(8)).

Writes BENCH/BASELINE.md.  Usage:
    python scripts/scaling_bench.py [--n-docs 4000] [--levels 8 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def prep_input(n_docs: int, seed: int, base: str) -> None:
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    code = f"""
import sys; sys.path.insert(0, {ROOT!r})
from ocr_gang_spark.session import get_spark
from ocr_gang_spark.synth import synth_documents, synth_media
spark = get_spark("prep", cpus=32)
docs = synth_documents(spark, {n_docs}, seed={seed}, skew_frac=0.01)
synth_media(spark, docs).write.mode("overwrite").parquet({base!r} + "/media")
docs.write.mode("overwrite").parquet({base!r} + "/docs")
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True, cwd=ROOT, env=env)


def run_level(cpus: int, base: str, n_parts: int, rep: int = 0) -> dict:
    # fresh output/checkpoint dirs per repeat — a leftover checkpoint dir
    # would make the run a resume no-op
    import shutil

    out = f"{base}/out{cpus}_{rep}"
    cp = f"{base}/cp{cpus}_{rep}"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(cp, ignore_errors=True)
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    t0 = time.time()
    proc = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "extract_job.py"),
            "--mode", "parquet",
            "--input-docs", f"{base}/docs",
            "--input-media", f"{base}/media",
            "--output", out, "--checkpoint", cp,
            "--n-parts", str(n_parts), "--cpus", str(cpus),
        ],
        capture_output=True, text=True, cwd=ROOT, env=env, check=True,
    )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    res["total_wall_sec"] = round(time.time() - t0, 1)
    res["cpus"] = cpus
    return res


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=4000)
    p.add_argument("--seed", type=int, default=42)
    # NB levels: with pandas-UDF stages, each local-mode task occupies a
    # JVM thread AND a python worker process, so a level above cores/2
    # measures oversubscription, not parallel scaling. On this 32-core
    # box the honest N-vs-4N pair is 4 vs 16 (both fit: level*2 <= 32).
    p.add_argument("--levels", type=int, nargs=2, default=[4, 16])
    p.add_argument("--n-parts", type=int, default=128)
    p.add_argument("--base", default="/tmp/ocr_gang_scaling")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--skip-prep", action="store_true")
    args = p.parse_args()

    if not args.skip_prep:
        print(f"prep: {args.n_docs} docs -> {args.base}", flush=True)
        prep_input(args.n_docs, args.seed, args.base)

    # INTERLEAVED repeats (4,16,4,16,...) so host-level drift on this
    # shared VM hits both levels equally; medians per level
    by_level = {c: [] for c in args.levels}
    for i in range(args.repeats):
        for cpus in args.levels:
            print(f"running local[{cpus}] (round {i + 1}/{args.repeats}) ...", flush=True)
            r = run_level(cpus, args.base, args.n_parts, rep=i)
            print(json.dumps(r), flush=True)
            by_level[cpus].append(r)
    results = []
    for cpus in args.levels:
        runs = sorted(by_level[cpus], key=lambda r: r["docs_per_sec"])
        med = runs[len(runs) // 2]
        med["all_docs_per_sec"] = [r["docs_per_sec"] for r in runs]
        results.append(med)

    lo, hi = results
    ratio = hi["cpus"] / lo["cpus"]
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    md = f"""# BENCH/BASELINE — measured numbers (this round)

## Scaling evidence (north_rule: >=0.8 efficiency from N to 4N)

Same extraction job (jobs/extract_job.py, --mode parquet) on the SAME
pre-generated input ({args.n_docs} docs, seed={args.seed}, skew 1%,
~2.4 spans/doc + media blobs), BLAS pinned to 1 thread, measured inside
the job (session startup excluded by comparing in-job wall):

| parallelism | wall (s) | docs/sec (median of {args.repeats}) | all runs |
|---|---|---|---|
| local[{lo['cpus']}] | {lo['wall_sec']} | {lo['docs_per_sec']} | {lo['all_docs_per_sec']} |
| local[{hi['cpus']}] | {hi['wall_sec']} | {hi['docs_per_sec']} | {hi['all_docs_per_sec']} |

**Scaling efficiency {lo['cpus']} -> {hi['cpus']} (x{ratio:.0f} cores):
{eff:.3f}**  (target >= 0.8)

Throughput metric (BASELINE.json): documents/sec end-to-end extraction
= **{hi['docs_per_sec']} docs/sec at local[{hi['cpus']}]** on this
corpus shape.

Raw results:
```json
{json.dumps(lo)}
{json.dumps(hi)}
```

Reproduce: `python scripts/scaling_bench.py --n-docs {args.n_docs}`
"""
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(f"scaling efficiency: {eff:.3f}")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
