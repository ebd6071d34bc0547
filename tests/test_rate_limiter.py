"""Token-bucket rate limiter: pure-fold law tests (burst, refill,
clamp-at-capacity, out-of-order grace), end-to-end streaming parity
with the pure fold, and state continuity across checkpoint restarts."""

import datetime

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_stream_spark.streaming.rate_limiter import (
    _MICRO,
    streaming_rate_limit,
    token_bucket_fold,
)

SCHEMA = StructType(
    [
        StructField("client", StringType()),
        StructField("rec_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)

T0 = datetime.datetime(2026, 3, 1, 12, 0, 0)


def test_fold_burst_drains_then_refills():
    # capacity 3, 1 token/s: a 5-record burst at t=0 admits 3;
    # 2 seconds later there are exactly 2 fresh tokens
    burst = [(0, i) for i in range(5)]
    verdicts, last, tokens = token_bucket_fold(burst, 3, 1, 0, 3 * _MICRO)
    assert [v[2] for v in verdicts] == [True, True, True, False, False]
    assert tokens == 0
    later = [(2 * _MICRO, 10), (2 * _MICRO, 11), (2 * _MICRO, 12)]
    verdicts, _, tokens = token_bucket_fold(later, 3, 1, last, tokens)
    assert [v[2] for v in verdicts] == [True, True, False]


def test_fold_clamps_at_capacity_and_handles_stale_rows():
    # a year of idle refills to capacity, not beyond
    verdicts, last, tokens = token_bucket_fold(
        [(10**9 * _MICRO, 1)], 5, 100, 0, 0
    )
    assert verdicts[0][2] is True
    assert tokens == 5 * _MICRO - _MICRO
    # a stale row (older than the clock) gets no refill but can spend
    verdicts, last2, tokens2 = token_bucket_fold(
        [(10**9 * _MICRO - 50, 2)], 5, 100, last, 0
    )
    assert verdicts[0][2] is False  # no tokens, no refill for stale ts
    assert last2 == last  # clock never goes backward


def test_streaming_matches_pure_fold(spark, tmp_path):
    rows = []
    rid = 0
    for client in ("a", "b"):
        for s in range(20):  # one record every 250ms → 4/s vs rate 2/s
            rows.append((client, rid, T0 + datetime.timedelta(milliseconds=250 * s)))
            rid += 1
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    out = str(tmp_path / "out")
    q = (
        streaming_rate_limit(
            spark.readStream.schema(SCHEMA).parquet(src),
            "client", "ts", "rec_id", capacity=4, rate_per_sec=2,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.rec_id: (r.admitted, r.tokens_after_u) for r in spark.read.parquet(out).collect()}
    assert len(got) == 40
    base_us = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp()) * _MICRO
    for client in ("a", "b"):
        # rebuild the exact per-client event list the stream saw
        evs = sorted(
            (base_us + 250_000 * (rid % 20), rid)
            for (c, rid, _) in rows
            if c == client
        )
        verdicts, _, _ = token_bucket_fold(evs, 4, 2, 0, 4 * _MICRO)
        for ts_us, rid, admitted, tokens in verdicts:
            assert got[rid] == (admitted, tokens), (client, rid)
    # the limiter actually limited: over 5s at 2/s from a 4-token start,
    # at most 4 + 2*5 = 14 admits per client (and fewer than all 20)
    admits = sum(1 for a, _ in got.values() if a)
    assert 2 * 10 <= admits < 40


def test_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("a", i, T0 + datetime.timedelta(milliseconds=100 * i)) for i in range(10)],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")

    def drain():
        q = (
            streaming_rate_limit(
                spark.readStream.schema(SCHEMA).parquet(src),
                "client", "ts", "rec_id", capacity=3, rate_per_sec=1,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    # second wave: immediately after, bucket should still be drained
    spark.createDataFrame(
        [("a", 100 + i, T0 + datetime.timedelta(milliseconds=1000 + 100 * i)) for i in range(5)],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    rows = {r.rec_id: r.admitted for r in spark.read.parquet(out).collect()}
    assert len(rows) == 15
    # wave 1: capacity 3 at 1/s over 0.9s → exactly 3 admits
    assert sum(1 for i in range(10) if rows[i]) == 3
    # wave 2 rides the RECOVERED drained bucket: ~1 token refilled in
    # the 0.1-1.4s window → at most 2 admits, not a fresh capacity of 3
    assert 1 <= sum(1 for i in range(100, 105) if rows[i]) <= 2
