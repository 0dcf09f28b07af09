"""Parse a Spark event log into per-stage task-metric aggregates.

Used by bench_scaling.py to attach stage-level evidence (shuffle bytes,
spill, GC, task-time histogram) to each scaling run, so "stage X stops
scaling" claims are backed by data instead of single-box guesses.
"""

from __future__ import annotations

import json
import os


def parse_event_log(path: str) -> list[dict]:
    """Aggregate TaskEnd metrics per stage; returns stages sorted by
    total executor run time (descending)."""
    stages: dict[int, dict] = {}
    names: dict[int, str] = {}
    groups: dict[int, str] = {}
    # Spark 4 rolling event logs are DIRECTORIES of events_N_* files
    if os.path.isdir(path):
        parts = sorted(os.path.join(path, p) for p in os.listdir(path)
                       if p.startswith("events"))
    else:
        parts = [path]

    def lines():
        for p in parts:
            with open(p) as f:
                yield from f

    if True:
        for line in lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                grp = (ev.get("Properties") or {}).get(
                    "spark.jobGroup.id", "")
                for sid in ev.get("Stage IDs", []):
                    groups[sid] = grp
            elif et == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                names[si["Stage ID"]] = si.get("Stage Name", "")
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                if not tm:
                    continue
                s = stages.setdefault(sid, {
                    "stage_id": sid, "n_tasks": 0, "run_ms": 0,
                    "gc_ms": 0, "input_mb": 0.0, "shuffle_read_mb": 0.0,
                    "shuffle_write_mb": 0.0, "spill_mem_mb": 0.0,
                    "spill_disk_mb": 0.0, "max_task_ms": 0,
                    "task_ms": []})
                s["n_tasks"] += 1
                run = tm.get("Executor Run Time", 0)
                s["run_ms"] += run
                s["task_ms"].append(run)
                s["max_task_ms"] = max(s["max_task_ms"], run)
                s["gc_ms"] += tm.get("JVM GC Time", 0)
                s["input_mb"] += tm.get("Input Metrics", {}).get(
                    "Bytes Read", 0) / 1e6
                s["shuffle_read_mb"] += (
                    tm.get("Shuffle Read Metrics", {}).get(
                        "Local Bytes Read", 0)
                    + tm.get("Shuffle Read Metrics", {}).get(
                        "Remote Bytes Read", 0)) / 1e6
                s["shuffle_write_mb"] += tm.get(
                    "Shuffle Write Metrics", {}).get(
                    "Shuffle Bytes Written", 0) / 1e6
                s["spill_mem_mb"] += tm.get("Memory Bytes Spilled", 0) / 1e6
                s["spill_disk_mb"] += tm.get("Disk Bytes Spilled", 0) / 1e6

    out = []
    for sid, s in stages.items():
        ts = sorted(s.pop("task_ms"))
        s["p50_task_ms"] = ts[len(ts) // 2] if ts else 0
        s["name"] = names.get(sid, "")[:80]
        s["group"] = groups.get(sid, "")
        for k in ("input_mb", "shuffle_read_mb", "shuffle_write_mb",
                  "spill_mem_mb", "spill_disk_mb"):
            s[k] = round(s[k], 1)
        out.append(s)
    out.sort(key=lambda s: -s["run_ms"])
    return out


def newest_log(ev_dir: str) -> str | None:
    logs = [os.path.join(ev_dir, p) for p in os.listdir(ev_dir)
            if not p.startswith(".")]
    return max(logs, key=os.path.getmtime) if logs else None


if __name__ == "__main__":
    import sys
    path = sys.argv[1]
    if os.path.isdir(path):
        path = newest_log(path)
    for s in parse_event_log(path)[:12]:
        print(json.dumps(s))
