#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

A real N-vs-4N-executor run needs a cluster; in this sandbox the same
job runs at two parallelism levels (local[2] vs local[8] by default) on
the SAME pre-generated parquet input, reporting docs/sec at both and
the scaling efficiency  eff = throughput(4N) / (4 * throughput(N)).

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
sys.path.insert(0, ROOT)

from ocr_gang_spark.hostprobe import ProbeSampler, steal_probe  # noqa: E402


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


def wait_for_quiet(threshold: float, max_wait: float = 900, poll: float = 30):
    """Pre-flight gate: hold the next round until the host looks quiet
    (probe <= threshold) or max_wait elapses.  Concentrates measurement
    into quiet windows instead of burning rounds during steal storms;
    the in-run probe still decides whether the run counts as quiet."""
    t0 = time.time()
    while True:
        p = steal_probe()
        if p <= threshold:
            return p
        if time.time() - t0 >= max_wait:
            return None
        print(f"preflight probe {p:.2f}s > {threshold}s — waiting", flush=True)
        time.sleep(poll)


def run_level(cpus: int, base: str, n_parts: int, rep: int = 0,
              exec_mode: str | None = None) -> dict:
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
    # sample the single-core steal probe every ~10s DURING the run (one
    # core of 32 — negligible perturbation): a contended run is then
    # visibly contended in its probe trace, not just suspiciously slow
    t0 = time.time()
    with ProbeSampler() as ps:
        proc = subprocess.run(
            [
                sys.executable, os.path.join(ROOT, "jobs", "extract_job.py"),
                "--mode", "parquet",
                "--input-docs", f"{base}/docs",
                "--input-media", f"{base}/media",
                "--output", out, "--checkpoint", cp,
                "--n-parts", str(n_parts), "--cpus", str(cpus),
            ] + (["--exec-mode", exec_mode] if exec_mode else []),
            capture_output=True, text=True, cwd=ROOT, env=env, check=True,
        )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    res["total_wall_sec"] = round(time.time() - t0, 1)
    res["cpus"] = cpus
    if exec_mode:
        res["exec_mode"] = exec_mode
    res["steal_probe_sec"] = ps.mean
    res["steal_probe_max"] = ps.max
    return res


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=4000)
    p.add_argument("--seed", type=int, default=42)
    # NB levels: with pandas-UDF stages, each local-mode task occupies a
    # JVM thread AND a python worker process, plus GC/netty/scheduler
    # threads on top, so a level at cores/2 (16 here) already
    # oversubscribes the box and measures context-switch thrash, not
    # parallel scaling (measured: local[16] reproducibly ~3x slower than
    # local[4] on this corpus).  2 vs 8 keeps 4N*2 = 16 hot threads well
    # under the 32 cores — the same discipline as leaving executor
    # headroom on a real cluster node.
    p.add_argument("--levels", type=int, nargs=2, default=[2, 8])
    p.add_argument("--n-parts", type=int, default=128)
    p.add_argument("--base", default="/tmp/ocr_gang_scaling")
    p.add_argument("--repeats", type=int, default=7)
    p.add_argument("--min-quiet", type=int, default=5,
                   help="quiet-window runs required per level")
    p.add_argument("--quiet-probe", type=float, default=0.8,
                   help="max mean steal-probe sec for a run to count as quiet")
    p.add_argument("--max-rounds", type=int, default=40)
    p.add_argument("--preflight-wait", type=float, default=900,
                   help="max seconds to wait for a quiet window before each round")
    p.add_argument("--skip-prep", action="store_true")
    args = p.parse_args()

    if not args.skip_prep:
        print(f"prep: {args.n_docs} docs -> {args.base}", flush=True)
        prep_input(args.n_docs, args.seed, args.base)

    # INTERLEAVED repeats (2,8,2,8,...) so host-level drift on this
    # shared VM hits both levels alike.  Selection discipline (ADVICE
    # r1): never let the selection rule decide the pass/fail threshold.
    # The HEADLINE efficiency uses the per-level MEDIAN; the best-of-N
    # alternative is computed and disclosed alongside, together with the
    # range over both defensible selections and every raw run + its
    # steal probe.  Host CPU steal can depress an arbitrary whole run
    # 3-5x for minutes, so medians need enough interleaved repeats to be
    # stable — default 7.
    import statistics

    # probe-gated quiet-window collection (ADVICE r1): interleave rounds
    # until each level has >= min_quiet runs whose mean in-run steal
    # probe is below --quiet-probe (host-quiet baseline ~0.2s; a probe
    # multiples above it marks a window where the host stole the cores
    # mid-run).  The gate is on the PROBE (an independent witness), not
    # on the throughput being measured, so it cannot select the answer.
    by_level = {c: [] for c in args.levels}

    def quiet(runs):
        return [r for r in runs if r["steal_probe_sec"] <= args.quiet_probe]

    i = 0
    while i < args.max_rounds:
        need = any(
            len(quiet(by_level[c])) < args.min_quiet for c in args.levels
        )
        if i >= args.repeats and not need:
            break
        if need and args.preflight_wait > 0:
            wait_for_quiet(args.quiet_probe * 0.75, max_wait=args.preflight_wait)
        for cpus in args.levels:
            print(f"running local[{cpus}] (round {i + 1}) ...", flush=True)
            r = run_level(cpus, args.base, args.n_parts, rep=i)
            print(json.dumps(r), flush=True)
            by_level[cpus].append(r)
        i += 1

    results = []
    for cpus in args.levels:
        runs = sorted(by_level[cpus], key=lambda r: r["docs_per_sec"])
        q = quiet(runs) or runs  # fall back to all runs, disclosed below
        rep = dict(q[len(q) // 2])  # median quiet run's metadata
        rep["median_docs_per_sec"] = round(
            statistics.median(r["docs_per_sec"] for r in q), 1
        )
        rep["n_quiet"] = len(quiet(runs))
        rep["best_docs_per_sec"] = runs[-1]["docs_per_sec"]
        rep["all_docs_per_sec"] = [r["docs_per_sec"] for r in runs]
        rep["all_steal_probe_sec"] = [r["steal_probe_sec"] for r in runs]
        results.append(rep)

    lo, hi = results
    contaminated = min(lo["n_quiet"], hi["n_quiet"]) < args.min_quiet
    ratio = hi["cpus"] / lo["cpus"]
    eff_median = (hi["median_docs_per_sec"] / lo["median_docs_per_sec"]) / ratio
    eff_best = (hi["best_docs_per_sec"] / lo["best_docs_per_sec"]) / ratio
    eff_lo, eff_hi = sorted([eff_median, eff_best])
    md = f"""# BENCH/BASELINE — measured numbers (this round)

## Scaling evidence (north_rule: >=0.8 efficiency from N to 4N)

Same extraction job (jobs/extract_job.py, --mode parquet) on the SAME
pre-generated input ({args.n_docs} docs, seed={args.seed}, skew 1%,
media blobs), BLAS pinned to 1 thread, measured inside the job (session
startup excluded).  Levels interleaved so host drift hits both alike;
rounds continue until each level has >= {args.min_quiet} QUIET runs
(mean in-run steal probe <= {args.quiet_probe}s; quiet host baseline
~0.2s — the probe is an independent witness, so the gate cannot select
the answer).  **Headline = MEDIAN over quiet runs**; best-of-all-N is
disclosed as the alternative defensible selection, with the efficiency
range across both.  All runs + per-run steal probes disclosed:

| parallelism | median docs/sec (quiet) | n quiet | best docs/sec (all) | all runs | steal probes (s) |
|---|---|---|---|---|---|
| local[{lo['cpus']}] | {lo['median_docs_per_sec']} | {lo['n_quiet']} | {lo['best_docs_per_sec']} | {lo['all_docs_per_sec']} | {lo['all_steal_probe_sec']} |
| local[{hi['cpus']}] | {hi['median_docs_per_sec']} | {hi['n_quiet']} | {hi['best_docs_per_sec']} | {hi['all_docs_per_sec']} | {hi['all_steal_probe_sec']} |

**Scaling efficiency {lo['cpus']} -> {hi['cpus']} (x{ratio:.0f} cores):
median-selection {eff_median:.3f}, best-selection {eff_best:.3f},
range [{eff_lo:.3f}, {eff_hi:.3f}]**  (target >= 0.8)

Throughput metric (BASELINE.json): documents/sec end-to-end extraction
= **{hi['median_docs_per_sec']} docs/sec (median) at
local[{hi['cpus']}]** (best run: {hi['best_docs_per_sec']}) on this
corpus shape.  Conditions: extraction measured inside the job at
local[{hi['cpus']}], session startup excluded, no warm-up exclusion in
this harness.

Raw results (median run's metadata per level):
```json
{json.dumps(lo)}
{json.dumps(hi)}
```

Reproduce: `python scripts/scaling_bench.py --n-docs {args.n_docs}`
"""
    if contaminated:
        md += f"""
> **WARNING — contended measurement window.** The harness could not
> collect {args.min_quiet} quiet runs per level within {args.max_rounds}
> rounds (quiet counts: local[{lo['cpus']}]={lo['n_quiet']},
> local[{hi['cpus']}]={hi['n_quiet']}); the host stole CPU through the
> whole window (see the probe columns — quiet baseline is ~0.2s).
> Steal hits the higher-parallelism level harder, so the efficiency
> above is a meaningless LOWER BOUND, not a property of the engine.
> Treat the most recent quiet-window measurement in git history as the
> standing number and re-run this harness in a quiet window.
"""
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(f"scaling efficiency: median {eff_median:.3f} best {eff_best:.3f}")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
