"""Analyze Spark event logs from a profile_scaling run.

For each stage: wall time (submission -> completion), task count, sum
of task run times, and the max single task time.  A stage whose wall
time ~= max-task >> sum/cores is a straggler/serial stage; a stage
with task count < cores cannot use the machine.  Attributes stages to
profiler phases via the __spans timestamps in the profile JSON.

Usage: python tools/analyze_eventlog.py EVENT_DIR CORES [TOP]
(PROFILE_JSON with __spans is optional via --spans FILE)
"""
from __future__ import annotations

import json
import os
import sys


def _event_files(evdir: str) -> list[str]:
    # newest application; handle both single-file and rolling
    # (eventlog_v2_<app>/events_N_...) layouts
    entries = sorted((os.path.getmtime(os.path.join(evdir, f)),
                      os.path.join(evdir, f))
                     for f in os.listdir(evdir)
                     if not f.startswith("."))
    path = entries[-1][1]
    if os.path.isdir(path):
        return sorted(os.path.join(path, f) for f in os.listdir(path)
                      if f.startswith("events_"))
    return [path]


def _lines(evdir: str):
    import io
    for path in _event_files(evdir):
        if path.endswith(".zstd"):
            import pyarrow as pa
            stream = pa.CompressedInputStream(pa.OSFile(path), "zstd")
            yield from io.TextIOWrapper(stream, encoding="utf-8")
        else:
            with open(path) as f:
                yield from f


def load_events(evdir: str):
    stages: dict[tuple, dict] = {}
    if True:
        for line in _lines(evdir):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                stages[key] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "ntasks": si["Number of Tasks"],
                    "submit": si.get("Submission Time"),
                    "tasks": [], "complete": None}
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                if key in stages:
                    stages[key]["submit"] = si.get("Submission Time")
                    stages[key]["complete"] = si.get("Completion Time")
            elif t == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                ti = ev.get("Task Info", {})
                if key in stages and ti:
                    dur = ti.get("Finish Time", 0) - ti.get(
                        "Launch Time", 0)
                    stages[key]["tasks"].append(dur)
    return stages


def main():
    evdir = sys.argv[1]
    cores = int(sys.argv[2])
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    spans = []
    if "--spans" in sys.argv:
        prof = json.load(open(sys.argv[sys.argv.index("--spans") + 1]))
        spans = prof["phases"].get("__spans", [])

    def phase_of(ms):
        s = ms / 1000.0
        for sp in spans:
            if sp["t0"] <= s <= sp["t1"]:
                return sp["phase"]
        return "?"

    stages = load_events(evdir)
    rows = []
    for (sid, att), s in stages.items():
        if s["complete"] is None or s["submit"] is None:
            continue
        wall = (s["complete"] - s["submit"]) / 1000.0
        tsum = sum(s["tasks"]) / 1000.0
        tmax = max(s["tasks"], default=0) / 1000.0
        rows.append((wall, sid, s["ntasks"], tsum, tmax,
                     phase_of(s["submit"]), s["name"]))
    rows.sort(reverse=True)
    print(f"cores={cores}  (top {top} stages by wall)")
    print(f"{'wall':>8} {'sid':>5} {'ntask':>6} {'tsum':>8} "
          f"{'tmax':>7} {'par%':>5}  phase/name")
    tot_wall = 0.0
    for wall, sid, nt, tsum, tmax, ph, name in rows[:top]:
        par = 100.0 * tsum / (wall * cores) if wall > 0 else 0
        print(f"{wall:8.1f} {sid:5d} {nt:6d} {tsum:8.1f} "
              f"{tmax:7.1f} {par:5.0f}  [{ph}] {name}")
        tot_wall += wall
    print(f"sum wall of shown: {tot_wall:.1f}s")


if __name__ == "__main__":
    main()
