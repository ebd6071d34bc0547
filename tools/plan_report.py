"""Physical-plan audit across the whole registry.

For every registered query, compile (never execute) the plan at the
given SF and count the operators that decide 100 TB behavior: data
exchanges, broadcast vs sort-merge joins, nested loops / cartesians,
parquet filter pushdown, and whole-stage-codegen coverage. Output: one
JSON line per query plus a summary; exit non-zero if any plan contains
a CartesianProduct (the one shape never allowed here — the few queries
with bounded 1-row crossJoins plan them as BroadcastNestedLoopJoin,
which is reported but allowed when the build side is a scalar).

Usage: python tools/plan_report.py [sf_dir] > PLAN_AUDIT.jsonl
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from kafka_stream_spark.registry import load_all
from kafka_stream_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    spark = get_spark("plan-report")
    rows = []
    cartesian = []
    for name, spec in sorted(load_all().items()):
        try:
            plan = (
                spec.build(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"query": name, "error": f"{type(e).__name__}: {e}"[:200]}))
            continue
        row = {
            "query": name,
            "exchanges": plan.count("Exchange hashpartitioning"),
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "sort_merge_joins": plan.count("SortMergeJoin"),
            "nested_loops": plan.count("BroadcastNestedLoopJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "pushed_filters": "PushedFilters: [" in plan
            and "PushedFilters: []" not in plan,
            "codegen_stages": plan.count("WholeStageCodegen"),
            # Arrow-batched pandas operators + any row-wise Python eval
            "python_stages": plan.count("InPandas") + plan.count("Python"),
        }
        rows.append(row)
        if row["cartesian"]:
            cartesian.append(name)
        print(json.dumps(row))
    summary = {
        "summary": "plan_report",
        "n": len(rows),
        "total_exchanges": sum(r["exchanges"] for r in rows),
        "queries_with_sort_merge": sum(1 for r in rows if r["sort_merge_joins"]),
        "queries_with_nested_loop": sum(1 for r in rows if r["nested_loops"]),
        "queries_with_cartesian": cartesian,
        "queries_with_pushdown": sum(1 for r in rows if r["pushed_filters"]),
    }
    print(json.dumps(summary))
    return 1 if cartesian else 0


if __name__ == "__main__":
    raise SystemExit(main())
