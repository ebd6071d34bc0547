"""Per-processor micro-throughput floors (VERDICT r4 item 4).

The 1M-key soaks (test_state_soak.py) catch throughput regressions in
funnel/as-of/kmv/saturation/bloom but take minutes each; every OTHER
stateful processor gets a cheap 50k-key (or 400k-row for the per-shard
sketches) floor here so a per-key Python hot-path regression surfaces
in seconds, not only in the soak tier. The floor is the reference's
replay rate (~5,000 rec/s, sample-data/put.sh:24); measured rates are
recorded in SCALING.md §round-5 and sit 10-100x above it on the
full-node session.
"""

import os
import time

import pytest

from kafka_stream_spark.streaming import stateful as st

N_KEYS = 50_000
FLOOR = 5_000


@pytest.fixture(scope="module", autouse=True)
def full_node_partitions(spark):
    """One state partition per core (same stance as the soak tier)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.fixture(scope="module")
def soak_src(spark, tmp_path_factory):
    """One shared source shaped for every processor: 2 rows per key."""
    src = str(tmp_path_factory.mktemp("microsoak") / "src")
    spark.range(N_KEYS).selectExpr(
        "id AS user", "explode(array(0, 1)) AS side"
    ).selectExpr(
        "cast(user AS string) AS key",
        "user",
        "cast(user % 997 AS double) + side AS val",
        "user * 2 + side AS id",
        "timestamp_micros(1700000000000000 + user * 10 + side) AS ts",
        "1700000000000000 + user * 10 + side AS ts_us",
        "concat('item', cast(user % 100000 AS string)) AS item",
        "cast(user % 8 AS int) AS shard",
        "cast(user % 4 AS int) AS j",
        "cast(side AS int) AS side",
    ).repartition(32).write.parquet(src)
    return src


_SCHEMA = (
    "key string, user long, val double, id long, ts timestamp, "
    "ts_us long, item string, shard int, j int, side int"
)


def _run(spark, df, name, mode, n_rows, budget=240):
    # wall-clock floors on a shared machine are load-sensitive: a
    # transient CPU spike (another test session, OS noise) can halve a
    # 1-2s measurement. One retry keeps the floor meaningful — a REAL
    # per-key regression fails both attempts deterministically.
    rate = None
    for attempt in (1, 2):
        t0 = time.monotonic()
        q = (
            df.writeStream.format("memory")
            .queryName(f"{name}_a{attempt}")
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(budget)
        elapsed = time.monotonic() - t0
        rate = n_rows / elapsed
        if rate >= FLOOR:
            break
    assert rate >= FLOOR, f"{name}: {rate:.0f} rec/s < {FLOOR} floor (2 attempts)"
    print(f"{name}: {rate:.0f} rec/s ({elapsed:.1f}s)")
    return rate


CASES = {
    "running_counter": (
        lambda s: st.running_counter(s.groupBy("key"), "key", "val"),
        "update",
    ),
    "threshold_alerter": (
        lambda s: st.threshold_alerter(s.groupBy("key"), "key", "val", 1e12),
        "append",
    ),
    "cohort_tracker": (
        lambda s: st.cohort_tracker(s.groupBy("user"), "user", "ts"),
        "append",
    ),
    "table_join_enricher": (
        lambda s: st.table_join_enricher(s.groupBy("user"), "ts", "id", "side"),
        "append",
    ),
    "anomaly_detector": (
        lambda s: st.anomaly_detector(s.groupBy("key"), "key", "val", "id"),
        "append",
    ),
    "decayed_counter": (
        lambda s: st.decayed_counter(s.groupBy("key"), "key", "ts_us", 1e9),
        "update",
    ),
    "hash_reservoir_sampler": (
        lambda s: st.hash_reservoir_sampler(s.groupBy("key"), "key", "item"),
        "update",
    ),
    # per-shard constant-state sketches: throughput is row-dominated
    "cms_tracker": (
        lambda s: st.cms_tracker(s.groupBy("j"), "item", w=256),
        "update",
    ),
    "histogram_tracker": (
        lambda s: st.histogram_tracker(s.groupBy("shard"), "val", 0.0, 1000.0),
        "update",
    ),
    "space_saving_tracker": (
        lambda s: st.space_saving_tracker(s.groupBy("shard"), "shard", "item"),
        "update",
    ),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(CASES))
def test_processor_clears_reference_floor(spark, soak_src, name):
    build, mode = CASES[name]
    stream = spark.readStream.schema(_SCHEMA).parquet(soak_src)
    _run(spark, build(stream), f"micro_{name}", mode, 2 * N_KEYS)
