"""Analyze Spark event logs from a profile_scaling run.

For each stage: wall time (submission -> completion), task count, sum
of task run times, and the max single task time.  A stage whose wall
time ~= max-task >> sum/cores is a straggler/serial stage; a stage
with task count < cores cannot use the machine.  Attributes stages to
profiler phases via the __spans timestamps in the profile JSON.

Usage: python tools/analyze_eventlog.py EVENT_DIR PROFILE_JSON [TOP]
"""
from __future__ import annotations

import json
import os
import sys


def load_events(evdir: str):
    # pick the newest application log
    files = sorted((os.path.getmtime(os.path.join(evdir, f)),
                    os.path.join(evdir, f))
                   for f in os.listdir(evdir)
                   if not f.startswith("."))
    path = files[-1][1]
    stages: dict[tuple, dict] = {}
    with open(path) as f:
        for line in f:
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
    evdir, profile = sys.argv[1], sys.argv[2]
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    prof = json.load(open(profile))
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
    cores = prof["cores"]
    print(f"cores={cores} total={prof['total_sec']}s  "
          f"(top {top} stages by wall)")
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
