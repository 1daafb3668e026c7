#!/usr/bin/env python
"""Round-4 scaling evidence collector (VERDICT r3 #4 + the per-round
north_rule reporting duty): interleaved probe-gated runs of the same
extraction job on the same pre-generated 40k corpus at

    processes 2-exec, processes 8-exec, threads local[2], threads local[8]

per round, so one quiet window yields probe-matched pairings for BOTH
modes.  Appends every run + its in-run probe trace to --out; nothing is
discarded.  Reuses scripts/scaling_bench.run_level (which embeds the
ProbeSampler) and its corpus prep.

Usage:
    python scripts/r4_scaling.py [--rounds 3] [--gate 0.40] \
        [--base /tmp/ocr_gang_scaling40r4] [--out BENCH/runs_r4_40k.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

from scripts.scaling_bench import prep_input, run_level, steal_probe  # noqa: E402

SEQ = [
    ("processes", 2),
    ("processes", 8),
    ("threads", 2),
    ("threads", 8),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=40000)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--gate", type=float, default=0.40)
    p.add_argument("--base", default="/tmp/ocr_gang_scaling40r4")
    p.add_argument("--n-parts", type=int, default=32)
    p.add_argument("--out", default=os.path.join(ROOT, "BENCH", "runs_r4_40k.jsonl"))
    p.add_argument("--max-minutes", type=float, default=120)
    args = p.parse_args()

    if not os.path.isdir(f"{args.base}/docs"):
        print(f"prep: {args.n_docs} docs -> {args.base}", flush=True)
        prep_input(args.n_docs, 42, args.base)

    t_end = time.time() + args.max_minutes * 60
    rep = 400  # distinct output dirs from other collectors'
    for rnd in range(args.rounds):
        for mode, cpus in SEQ:
            if time.time() > t_end:
                return
            # pre-flight gate before EVERY run (the window can close
            # mid-round; better to wait than to burn a denominator)
            while True:
                pr = steal_probe()
                if pr <= args.gate:
                    break
                print(f"probe {pr:.3f} > gate {args.gate} — waiting",
                      flush=True)
                if time.time() > t_end:
                    return
                time.sleep(45)
            print(f"round {rnd + 1}: {mode} x{cpus} (gate probe {pr:.3f})",
                  flush=True)
            r = run_level(cpus, args.base, args.n_parts, rep=rep,
                          exec_mode=mode)
            r["gate_probe_sec"] = pr
            r["round"] = rnd + 1
            with open(args.out, "a") as f:
                f.write(json.dumps(r) + "\n")
            print(json.dumps(r), flush=True)
            rep += 1


if __name__ == "__main__":
    main()
