#!/usr/bin/env python
"""Probe-gated extraction runs: wait for a quiet host window, then run.

The sandbox host steals CPU in multi-minute windows (BENCH/NOTES.md).
This runner samples the single-core steal probe and only launches the
extraction job when the probe is below --gate, so each recorded run is
from a comparably uncontended window — the fair way to compare
parallelism levels on this box.  Results append as JSON lines to
--out; merge them into BENCH/BASELINE.md by hand or with
scripts/scaling_bench.py's reporting.

Usage:
    python scripts/quiet_runs.py --cpus 8 --runs 2 [--gate 0.45] \
        [--base /tmp/ocr_gang_scaling] [--n-parts 32] [--out /tmp/quiet8.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.scaling_bench import run_level, steal_probe  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, required=True)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--gate", type=float, default=0.45)
    p.add_argument("--base", default="/tmp/ocr_gang_scaling")
    p.add_argument("--n-parts", type=int, default=32)
    p.add_argument("--out", default=None)
    p.add_argument("--max-minutes", type=float, default=90)
    # 'processes' = local-cluster[N,1,M]: N separate executor JVMs — the
    # honest N-executors-vs-4N-executors configuration (session.get_spark)
    p.add_argument("--exec-mode", choices=["threads", "processes"], default=None)
    args = p.parse_args()
    out_path = args.out or f"/tmp/quiet{args.cpus}.jsonl"

    t_end = time.time() + args.max_minutes * 60
    done = 0
    rep = 100  # distinct output dirs from scaling_bench's
    while done < args.runs and time.time() < t_end:
        pr = steal_probe()
        if pr > args.gate:
            print(f"probe {pr:.3f} > gate {args.gate} — waiting", flush=True)
            time.sleep(45)
            continue
        print(f"probe {pr:.3f} — launching local[{args.cpus}]", flush=True)
        r = run_level(args.cpus, args.base, args.n_parts, rep=rep,
                      exec_mode=args.exec_mode)
        r["gate_probe_sec"] = pr
        with open(out_path, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)
        rep += 1
        done += 1


if __name__ == "__main__":
    main()
