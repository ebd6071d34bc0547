"""Streaming KMV distinct tracker: multi-batch state evolution equals the
batch sketch over the union of all batches (min-k is mergeable)."""

import hashlib

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_stream_spark.streaming.stateful import _KMV_DOMAIN, kmv_distinct_tracker

EV_SCHEMA = StructType(
    [StructField("event_type", StringType()), StructField("user_id", LongType())]
)

_K = 8  # small k so the estimator path (not the exact path) is exercised


def _py_kmv(ids) -> tuple[int, float]:
    hs = sorted(
        {int(hashlib.md5(f"kmv:{u}".encode()).hexdigest()[:8], 16) for u in ids}
    )[:_K]
    est = float(len(hs)) if len(hs) < _K else (_K - 1) * _KMV_DOMAIN / hs[-1]
    return len(hs), round(est, 2)


@pytest.fixture()
def batched_events_dir(spark, tmp_path):
    """Three parquet files = three micro-batches, types interleaved."""
    rows = [("click", u) for u in range(40)] + [("view", u) for u in range(0, 80, 2)]
    path = str(tmp_path / "ev")
    for i in range(3):
        chunk = [r for j, r in enumerate(rows) if j % 3 == i]
        spark.createDataFrame(chunk, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    return path, rows


def test_kmv_tracker_converges_to_batch_sketch(spark, batched_events_dir):
    path, rows = batched_events_dir
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = kmv_distinct_tracker(stream.groupBy("event_type"), "event_type", "user_id", k=_K)
    q = (
        out.writeStream.format("memory")
        .queryName("kmv_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    updates = spark.sql("SELECT * FROM kmv_updates").collect()
    # one update per (batch, key) present in that batch; the LAST update
    # per key must equal the batch sketch over ALL rows — state merged
    # across batches is the global min-k set
    assert len(updates) >= 4
    final: dict = {}
    for r in updates:  # memory sink appends in batch order
        final[r.key] = (r.n_minima, r.est_distinct)
    for key in ("click", "view"):
        ids = [u for t, u in rows if t == key]
        assert final[key] == _py_kmv(ids)
    # sanity: estimator path engaged (sets bigger than k) and estimates
    # in a plausible band around the true distincts (40 resp. 40)
    for key in ("click", "view"):
        n_min, est = final[key]
        assert n_min == _K
        assert 10 <= est <= 160


def test_decayed_counter_matches_batch_sum(spark, tmp_path):
    """Streaming decay-then-fold state equals the batch Σ 2^(-(T-ti)/hl)
    (up to float associativity) across micro-batches."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from kafka_stream_spark.streaming.stateful import decayed_counter

    hl = 3.0 * 86400e6  # 3 days in µs
    schema = StructType(
        [StructField("k", StringType()), StructField("t_us", LongType())]
    )
    rows = [("a", i * 7_200_000_000) for i in range(50)] + [
        ("b", i * 43_200_000_000) for i in range(20)
    ]
    ordered = sorted(rows, key=lambda r: (r[0], r[1]))
    path = str(tmp_path / "src")
    third = (len(ordered) + 2) // 3
    for i in range(3):
        spark.createDataFrame(
            ordered[i * third : (i + 1) * third], schema
        ).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = decayed_counter(stream.groupBy("k"), "k", "t_us", hl)
    q = (
        out.writeStream.format("memory")
        .queryName("decayed")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for r in spark.sql("SELECT * FROM decayed").collect():
        final[r.key] = (r.last_ts_us, r.decayed_count, r.n_events)

    for k in ("a", "b"):
        ts = [t for kk, t in rows if kk == k]
        T = max(ts)
        batch = sum(2.0 ** (-(T - t) / hl) for t in ts)
        last, score, n = final[k]
        assert last == T and n == len(ts)
        assert abs(score - batch) <= 1e-9 * batch
