"""Per-stage profile of one registered query (guide §1: measure first).

Runs the named query with event logging enabled, then parses the event
log to attribute wall-clock and task time per stage: where the seconds
go (compute vs shuffle fetch vs scheduling), how many jobs/stages/tasks
the plan costs, and how many bytes each exchange moves.

Usage:
    python tools/profile_query.py <query_name> [sf_dir] [repeats]

Prints a per-stage table (sorted by task time) plus job/stage/task
totals. The numbers this reports are the empirical side of the
optimization loop; the plan (`explain`) is the structural side.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_stream_spark.registry import load_all
from kafka_stream_spark.session import get_spark

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spec = load_all()[name]
    # warm: codegen + page cache, same as bench.py
    spec.build(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()
    t0 = time.time()
    spec.build(spark, sf_dir).count()
    wall_first = time.time() - t0
    best = wall_first
    marker = time.time() * 1000  # only profile events after this? keep all
    for _ in range(repeats - 1):
        spark.catalog.clearCache()
        t0 = time.time()
        spec.build(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    spark.stop()

    # parse the event log (Spark 4 may write a rolling eventlog_v2_* dir)
    logs = []
    for root, _dirs, files in os.walk(EVDIR):
        for f in files:
            if not f.startswith(".") and "appstatus" not in f:
                logs.append(os.path.join(root, f))
    stages: dict[tuple[int, int], dict] = {}
    jobs = 0
    for path in logs:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    jobs += 1
                elif et == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    key = (si["Stage ID"], si["Stage Attempt ID"])
                    st = stages.setdefault(key, {
                        "name": "?", "tasks": 0,
                        "wall_ms": 0, "run_ms": 0, "fetch_ms": 0,
                        "sh_read": 0, "sh_write": 0, "input": 0,
                        "gc_ms": 0, "deser_ms": 0, "result_ms": 0,
                        "cpu_ms": 0,
                    })
                    st["name"] = si["Stage Name"].split("\n")[0][:70]
                    st["tasks"] += si["Number of Tasks"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    if sub and comp:
                        st["wall_ms"] = comp - sub
                elif et == "SparkListenerTaskEnd":
                    key = (ev["Stage ID"], ev["Stage Attempt ID"])
                    st = stages.setdefault(key, {
                        "name": "?", "tasks": 0,
                        "wall_ms": 0, "run_ms": 0, "fetch_ms": 0,
                        "sh_read": 0, "sh_write": 0, "input": 0,
                        "gc_ms": 0, "deser_ms": 0, "result_ms": 0,
                        "cpu_ms": 0,
                    })
                    tm = ev.get("Task Metrics") or {}
                    st["run_ms"] += tm.get("Executor Run Time", 0)
                    st["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
                    st["gc_ms"] += tm.get("JVM GC Time", 0)
                    st["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                    st["result_ms"] += tm.get("Result Serialization Time", 0)
                    srm = tm.get("Shuffle Read Metrics") or {}
                    st["fetch_ms"] += srm.get("Fetch Wait Time", 0)
                    st["sh_read"] += srm.get("Remote Bytes Read", 0) + srm.get(
                        "Local Bytes Read", 0
                    )
                    swm = tm.get("Shuffle Write Metrics") or {}
                    st["sh_write"] += swm.get("Shuffle Bytes Written", 0)
                    im = tm.get("Input Metrics") or {}
                    st["input"] += im.get("Bytes Read", 0)

    total_run = sum(s["run_ms"] for s in stages.values())
    total_wall = sum(s["wall_ms"] for s in stages.values())
    print(f"query={name} best_wall={best:.3f}s first_wall={wall_first:.3f}s "
          f"(all repeats pooled below)")
    print(f"jobs={jobs} stages={len(stages)} "
          f"tasks={sum(s['tasks'] for s in stages.values())} "
          f"sum_stage_wall={total_wall/1000:.2f}s sum_task_run={total_run/1000:.2f}s")
    print(f"{'stage':>6} {'tasks':>5} {'wall':>7} {'run':>7} {'cpu':>7} "
          f"{'fetch':>6} {'gc':>5} {'shR_KB':>8} {'shW_KB':>8} {'in_KB':>8}  name")
    for (sid, att), s in sorted(stages.items(), key=lambda kv: -kv[1]["run_ms"]):
        print(f"{sid:>6} {s['tasks']:>5} {s['wall_ms']:>6}m {s['run_ms']:>6}m "
              f"{s['cpu_ms']:>6}m {s['fetch_ms']:>5}m {s['gc_ms']:>4}m "
              f"{s['sh_read']//1024:>8} {s['sh_write']//1024:>8} "
              f"{s['input']//1024:>8}  {s['name']}")


if __name__ == "__main__":
    main()
