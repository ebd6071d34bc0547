"""Headline benchmark: runs the bench-flagged queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints TWO JSON lines on stdout:

1. the full record {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {per-query sec}, "sf": ...} — wide (60+ queries), and
2. a COMPACT summary {"metric": ..., "value": ..., "unit": "sec",
   "sf": ..., "n_queries": N} as the FINAL line.

The compact line exists because the driver's tail-capture window is
smaller than the wide line (BENCH_r03.json recorded "parsed": null when
the 66-query map outgrew it — VERDICT r3, item 4): whichever direction
the window truncates from, one complete, parseable JSON line survives.

Each query is fully materialized (count) so the measured time includes
the whole plan, not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_stream_spark.registry import load_all
from kafka_stream_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("kafka-stream-spark-bench")
    specs = {n: s for n, s in load_all().items() if s.bench}

    # warm the JVM + parquet footers/page cache once so per-query times
    # measure the query, not the first cold read (the alphabetically-first
    # ANN queries were paying the embeddings cold read)
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    # per-query warmup at the smallest SF: compiles the same generated code
    # (Janino codegen dominates cold first-run time), so the timed pass
    # measures steady-state execution at the target SF
    warm_dir = "/root/testdata/sf0.001"
    times: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        if os.path.isdir(warm_dir) and warm_dir != sf_dir:
            try:
                spec.build(spark, warm_dir).count()
            except Exception:
                pass
        # cache isolation: each query pays its own full cost — no accidental
        # cross-query reuse of cached shingle/token tables. min-of-N runs
        # (BENCH_REPEATS, default 3 — raised round 3 after a sitting where
        # uniform host noise inflated every query 20-40%) filters GC/
        # compilation/host jitter so round-over-round comparisons track
        # real plan changes.
        repeats = max(1, int(os.environ.get("BENCH_REPEATS", "3")))
        best, n = None, 0
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.time()
            df = spec.build(spark, sf_dir)
            n = df.count()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        times[name] = round(best, 3)
        print(f"# {name}: {n} rows in {times[name]}s (min of {repeats})", file=sys.stderr)

    total = round(sum(times.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    record = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
    }
    print(json.dumps(record, separators=(",", ":")))
    # ALSO persist the wide record to a file (r8, additions-only): the
    # wide stdout line keeps outgrowing the driver's tail-capture window
    # (PERF r6/r7 both lost the per-query map, n_common=0), so the
    # per-query ground truth lands on disk where the next round can diff
    # it without tail archaeology. Path overridable; never fatal.
    try:
        out = os.environ.get(
            "BENCH_SELF_OUT",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_self_r08.json"),
        )
        with open(out, "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        pass
    # compact final line — guaranteed to fit any tail-capture window
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(times),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
