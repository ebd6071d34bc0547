"""Measure applyInPandasWithState per-key throughput for the soak
processors (funnel / as-of) at a configurable key count, mirroring
tests/test_state_soak.py's exact topology (local[4], 4 shuffle
partitions, RocksDB state store).

Usage: python tools/soak_probe.py [n_keys] [processor]
"""

import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
WHICH = sys.argv[2] if len(sys.argv) > 2 else "funnel"

sys.path.insert(0, "/root/repo")

import tempfile

from kafka_stream_spark.session import enable_rocksdb_state, get_spark

spark = get_spark("soak-probe", master="local[4]", shuffle_partitions=4)
enable_rocksdb_state(spark)
tmp = tempfile.mkdtemp()
src = f"{tmp}/src"

if WHICH == "funnel":
    from kafka_stream_spark.streaming.stateful import funnel_tracker

    spark.range(N).selectExpr(
        "cast(id AS string) AS user",
        "explode(array(0, 1, 2)) AS si",
    ).selectExpr(
        "user",
        "CASE si WHEN 0 THEN 'signup' WHEN 1 THEN 'view'"
        " ELSE 'purchase' END AS event_type",
        "timestamp_micros(1700000000000000 + cast(user AS long) * 10 + si) AS ts",
    ).repartition(32).write.parquet(src)

    stream = spark.readStream.schema(
        "user string, event_type string, ts timestamp"
    ).parquet(src)
    res = funnel_tracker(
        stream.groupBy("user"), "user", "event_type", "ts",
        ("signup", "view", "purchase"),
    )
    n_rows = 3 * N
elif WHICH == "asof":
    import pyspark.sql.functions as F

    from kafka_stream_spark.streaming.stateful import stream_stream_asof_join

    base_us = 1_700_000_000_000_000
    spark.range(N).selectExpr(
        "id AS user_id", "explode(array(0, 1)) AS side"
    ).selectExpr(
        "user_id",
        f"{base_us} + user_id * 20 + side * 5000000 AS ts_us",
        "user_id * 2 + side AS event_id",
        "cast(side AS int) AS side",
    ).repartition(32).write.parquet(f"{src}/b1.parquet")
    spark.createDataFrame(
        [(10**9, base_us + 365 * 86400 * 1_000_000, 10**9, 0)],
        "user_id long, ts_us long, event_id long, side int",
    ).coalesce(1).write.parquet(f"{src}/b2.parquet")
    import os

    os.utime(f"{src}/b1.parquet", (1000, 1000))
    os.utime(f"{src}/b2.parquet", (2000, 2000))
    stream = (
        spark.readStream.schema("user_id long, ts_us long, event_id long, side int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*.parquet")
        .withColumn("ts", F.timestamp_micros("ts_us"))
        .withWatermark("ts", "1 hour")
    )
    res = stream_stream_asof_join(stream.groupBy("user_id"), "ts", "event_id", "side")
    n_rows = 2 * N
elif WHICH == "null":
    # pure bridge-overhead floor: same grouping as funnel, no-op closure
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    spark.range(N).selectExpr(
        "cast(id AS string) AS user",
        "explode(array(0, 1, 2)) AS si",
    ).repartition(32).write.parquet(src)

    def fn(key, pdfs, state: GroupState):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"key": [key[0]], "n": [n]})

    stream = spark.readStream.schema("user string, si long").parquet(src)
    res = stream.groupBy("user").applyInPandasWithState(
        fn,
        StructType([StructField("key", StringType()), StructField("n", LongType())]),
        "n LONG",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    n_rows = 3 * N
else:
    raise SystemExit(f"unknown processor {WHICH}")

mode = "update" if WHICH == "null" else "append"
t0 = time.monotonic()
q = (
    res.writeStream.format("memory")
    .queryName("probe")
    .outputMode(mode)
    .option("checkpointLocation", f"{tmp}/ck")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination(1800)
elapsed = time.monotonic() - t0
out_n = spark.sql("SELECT count(*) n FROM probe").first().n
for p in q.recentProgress:
    d = p["durationMs"]
    print(
        f"  batch {p['batchId']}: rows={p['numInputRows']} total={d.get('triggerExecution')}ms "
        f"addBatch={d.get('addBatch')}ms stateRows={[s['numRowsTotal'] for s in p.get('stateOperators', [])]} "
        f"commit={[s.get('commitTimeMs') for s in p.get('stateOperators', [])]}"
    )
print(
    f"PROBE {WHICH}: keys={N} rows={n_rows} out={out_n} "
    f"elapsed={elapsed:.1f}s rate={n_rows / elapsed:.0f} rec/s "
    f"per_key_ms={1000 * elapsed / N:.2f} (x4 threads)"
)
spark.stop()
