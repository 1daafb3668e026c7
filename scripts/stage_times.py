#!/usr/bin/env python
"""Per-stage time attribution from a Spark event log.

For every stage: wall clock (submission -> completion), task count, and
the core-seconds spent in run/GC/shuffle-fetch-wait/shuffle-write/
(de)serialization, plus the slot-idle estimate (slots * wall - run) that
exposes wave-tail and scheduling bubbles.  Used to attribute the
threads-vs-processes throughput gap (BENCH/NOTES.md) to a mechanism
instead of guessing.

Usage: python scripts/stage_times.py /path/to/event_dir [--slots 8]
"""

from __future__ import annotations

import argparse
import json
import os


def stage_report(event_dir: str) -> list[dict]:
    stages: dict[tuple[int, int], dict] = {}
    paths = []
    for dirpath, _dirs, files in os.walk(event_dir):
        paths += [os.path.join(dirpath, fn) for fn in files
                  if not fn.startswith("appstatus_")]
    for path in sorted(paths):
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    key = (si["Stage ID"], si["Stage Attempt ID"])
                    st = stages.setdefault(key, {"run_ms": 0, "gc_ms": 0,
                                                 "fetch_ms": 0, "swrite_ms": 0,
                                                 "deser_ms": 0, "rser_ms": 0,
                                                 "n_tasks": 0})
                    st["name"] = si.get("Stage Name", "?").split("\n")[0][:60]
                    sub, comp = si.get("Submission Time"), si.get("Completion Time")
                    st["wall_ms"] = (comp - sub) if sub and comp else None
                elif kind == "SparkListenerTaskEnd":
                    si = ev.get("Stage ID"), ev.get("Stage Attempt ID")
                    st = stages.setdefault(si, {"run_ms": 0, "gc_ms": 0,
                                                "fetch_ms": 0, "swrite_ms": 0,
                                                "deser_ms": 0, "rser_ms": 0,
                                                "n_tasks": 0})
                    m = ev.get("Task Metrics") or {}
                    st["n_tasks"] += 1
                    st["run_ms"] += m.get("Executor Run Time", 0)
                    st["gc_ms"] += m.get("JVM GC Time", 0)
                    st["deser_ms"] += m.get("Executor Deserialize Time", 0)
                    st["rser_ms"] += m.get("Result Serialization Time", 0)
                    st["fetch_ms"] += (m.get("Shuffle Read Metrics") or {}).get(
                        "Fetch Wait Time", 0)
                    # Shuffle Write Time is reported in NANOseconds
                    st["swrite_ms"] += (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Write Time", 0) // 1_000_000
    out = []
    for (sid, att), st in sorted(stages.items()):
        st["stage"] = f"{sid}.{att}"
        out.append(st)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("event_dir")
    p.add_argument("--slots", type=int, default=None,
                   help="task slots; adds an idle = slots*wall - run column")
    p.add_argument("--min-wall-ms", type=int, default=500)
    args = p.parse_args()

    rows = stage_report(args.event_dir)
    hdr = ["stage", "n_tasks", "wall_s", "run_cs", "gc_cs", "fetch_cs",
           "swrite_cs", "deser_cs"]
    if args.slots:
        hdr.append("idle_cs")
    hdr.append("name")
    print("\t".join(hdr))
    for st in rows:
        wall = st.get("wall_ms") or 0
        if wall < args.min_wall_ms:
            continue
        vals = [st["stage"], st["n_tasks"], round(wall / 1e3, 1),
                round(st["run_ms"] / 1e3, 1), round(st["gc_ms"] / 1e3, 1),
                round(st["fetch_ms"] / 1e3, 1), round(st["swrite_ms"] / 1e3, 1),
                round(st["deser_ms"] / 1e3, 1)]
        if args.slots:
            vals.append(round((args.slots * wall - st["run_ms"]) / 1e3, 1))
        vals.append(st.get("name", "?"))
        print("\t".join(str(v) for v in vals))


if __name__ == "__main__":
    main()
