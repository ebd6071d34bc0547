"""Empirical scaling audit: run bench-flagged queries at sf0.001 / 0.01 /
0.1 and report the per-decade runtime growth factor.

A query whose cost is linear in data grows ≤ ~10× per decade; fixed
overhead (session, planning, tiny inputs) makes small-SF times flat, so
the informative number is the LAST decade (0.01 → 0.1). Growth far above
10× at the last decade flags a super-linear shape (pairwise blowup,
unpruned shuffle) that will not survive 100 TB.

Usage: python tools/scale_check.py [query ...]   (default: bench set)
Output: one JSON line per query:
  {"query": ..., "t_small": s, "t_mid": s, "t_big": s, "x_last_decade": r}
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from kafka_stream_spark.registry import load_all
from kafka_stream_spark.session import get_spark

_TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")
SFS = [f"{_TESTDATA}/sf0.001", f"{_TESTDATA}/sf0.01", f"{_TESTDATA}/sf0.1"]


def main() -> None:
    spark = get_spark("kafka-stream-spark-scale-check")
    specs = load_all()
    names = sys.argv[1:] or sorted(n for n, s in specs.items() if s.bench)
    # warm the JVM once
    spark.read.parquet(SFS[0] + "/lineitem.parquet").count()
    rows = []
    for name in names:
        spec = specs[name]
        times = []
        for sf_dir in SFS:
            # warmup pass compiles codegen for this plan shape
            try:
                spec.build(spark, sf_dir).count()
            except Exception as e:
                print(f"# {name} failed at {sf_dir}: {e}", file=sys.stderr)
                times.append(None)
                continue
            spark.catalog.clearCache()
            t0 = time.time()
            spec.build(spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        if None in times:
            continue
        r = {
            "query": name,
            "t_small": times[0],
            "t_mid": times[1],
            "t_big": times[2],
            "x_last_decade": round(times[2] / max(times[1], 1e-3), 2),
        }
        rows.append(r)
        print(json.dumps(r))
    flagged = [r for r in rows if r["x_last_decade"] > 15]
    print(
        json.dumps(
            {
                "summary": "scale_check",
                "n": len(rows),
                "max_x_last_decade": max((r["x_last_decade"] for r in rows), default=0),
                "flagged_superlinear": [r["query"] for r in flagged],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
