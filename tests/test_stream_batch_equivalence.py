"""Streaming and batch executions of the same logical operator must agree —
the KStream/KTable duality claim (SURVEY.md §1.1) made testable.

Pattern: run the operator over events.parquet (sf0.001) as a batch plan
AND as an availableNow streaming plan into a memory sink; compare rows.
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.streaming import ops

EVENTS_NTZ = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


@pytest.fixture(scope="module")
def events_ntz_dir(spark, sf_dir, tmp_path_factory):
    """events with the nanos ts already converted to NTZ (what a Kafka
    source + from_avro decode would deliver)."""
    (events,) = load(spark, sf_dir, "events")
    path = str(tmp_path_factory.mktemp("ntz") / "events")
    events.coalesce(2).write.parquet(path)
    return path


def _collect_stream(spark, stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_agg_stream_equals_batch(spark, sf_dir, events_ntz_dir):
    (events,) = load(spark, sf_dir, "events")
    batch = (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sv")
    )
    stream = spark.readStream.schema(EVENTS_NTZ).parquet(events_ntz_dir)
    streamed = ops.windowed_agg(
        stream, "ts", "10 minutes", ["event_type"],
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv")],
        watermark="30 minutes",
    ).select(F.col("window.start").alias("ws"), "event_type", "n", "sv")
    got = _collect_stream(spark, streamed, "eq_tumble", "update")
    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, got.collect()))
    assert b == s


def test_running_agg_stream_equals_batch(spark, sf_dir, events_ntz_dir):
    (events,) = load(spark, sf_dir, "events")
    batch = sorted(
        map(
            tuple,
            events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
            .collect(),
        )
    )
    stream = spark.readStream.schema(EVENTS_NTZ).parquet(events_ntz_dir)
    streamed = ops.running_agg(
        stream, ["user_id"],
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv")],
    )
    got = _collect_stream(spark, streamed, "eq_running", "complete")
    assert sorted(map(tuple, got.collect())) == batch


def test_latest_by_key_stream_equals_batch(spark, sf_dir, events_ntz_dir, tmp_path):
    (events,) = load(spark, sf_dir, "events")
    batch = {
        r.user_id: r.event_id
        for r in events.groupBy("user_id")
        .agg(F.max_by("event_id", F.struct("ts", "event_id")).alias("event_id"))
        .collect()
    }
    stream = spark.readStream.schema(EVENTS_NTZ).parquet(events_ntz_dir)
    sink = str(tmp_path / "latest")
    q = (
        ops.foreach_batch_upsert(
            stream.select("user_id", "ts", "event_id"), sink,
            keys=["user_id"], order_col="ts",
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: r.event_id for r in ops.read_upserted(spark, sink).collect()}
    assert got == batch


def test_cc_payments_fraud_join(spark):
    """FIXTURES.md §8: cc_payments ⋈ cc_data on creditCardId, blocked=true —
    the canonical fraud streaming join, run as stream-static enrichment."""
    cc_data = spark.createDataFrame(
        [("4001", "Ada", "GB", False), ("4002", "Bob", "US", True), ("4003", "Eve", "DE", True)],
        ["number", "customerFirstName", "country", "blocked"],
    )
    payments = spark.createDataFrame(
        [("p1", 10.0, "4001"), ("p2", 99.0, "4002"), ("p3", 5.0, "4003"), ("p4", 7.0, "4001")],
        ["id", "amount", "creditCardId"],
    )
    flagged = ops.stream_static_join(
        payments, cc_data.filter("blocked"), payments["creditCardId"] == cc_data["number"]
    )
    got = sorted(r.id for r in flagged.collect())
    assert got == ["p2", "p3"]


def test_sessionize_matches_session_window(spark, sf_dir):
    """The lag+cumsum sessionizer and Spark's built-in session_window must
    agree on session boundaries and sizes for the same gap."""
    import pyspark.sql.functions as F

    from kafka_stream_spark.operators._common import load

    (events,) = load(spark, sf_dir, "events")
    # built-in gap windows (6h, matching operators/event_analytics.py)
    sw = (
        events.groupBy("user_id", F.session_window("ts", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("start"),
             F.max("ts").alias("end"))
        .select("user_id", "start", "end", "n_events")
    )
    from kafka_stream_spark.operators.event_analytics import sessionize_events

    an = sessionize_events(spark, sf_dir).select(
        "user_id",
        F.col("session_start").alias("start"),
        F.col("session_end").alias("end"),
        "n_events",
    )
    a = sorted(map(tuple, sw.collect()))
    b = sorted(map(tuple, an.collect()))
    assert a == b


def test_cohort_tracker_stream_equals_batch(spark, sf_dir, events_ntz_dir):
    """Streaming cohort tracker (applyInPandasWithState), reduced by
    cohort_counts, must reproduce the batch cohort_retention table even
    when the stream arrives as multiple micro-batches."""
    from kafka_stream_spark.operators.event_analytics import cohort_retention
    from kafka_stream_spark.streaming.stateful import cohort_counts, cohort_tracker

    stream = (
        spark.readStream.schema(EVENTS_NTZ)
        .option("maxFilesPerTrigger", 1)  # force >1 micro-batch (2 files)
        .parquet(events_ntz_dir)
    )
    tracked = cohort_tracker(stream.groupBy("user_id"), "user_id", "ts")
    # localCheckpoint: cohort_counts self-joins its input, which the
    # optimizer can't plan over a memory-sink table (NOTES.md edge #9)
    got = _collect_stream(spark, tracked, "eq_cohort", "append").localCheckpoint()
    streamed = sorted(
        map(
            tuple,
            cohort_counts(got)
            .select(
                F.date_from_unix_date(F.col("cohort_day").cast("int")).alias("cohort_day"),
                "day_offset",
                "n_users",
            )
            .collect(),
        )
    )
    batch = sorted(map(tuple, cohort_retention(spark, sf_dir).collect()))
    assert streamed == batch


def test_cohort_step_rebases_out_of_order_days():
    """An activity day earlier than the stored cohort re-bases and
    re-emits the full corrected set; in-order days emit only deltas."""
    from kafka_stream_spark.streaming.stateful import _cohort_step

    # first batch: all days emitted, cohort = min
    c, days, emit = _cohort_step(None, set(), {100, 102})
    assert (c, days, emit) == (100, {100, 102}, [100, 102])
    # later day: delta only
    c, days, emit = _cohort_step(c, days, {103})
    assert (c, days, emit) == (100, {100, 102, 103}, [103])
    # OUT-OF-ORDER earlier day: re-base, re-emit everything
    c, days, emit = _cohort_step(c, days, {98})
    assert (c, days, emit) == (98, {98, 100, 102, 103}, [98, 100, 102, 103])
    # duplicate delivery: no emission, state unchanged
    c2, days2, emit = _cohort_step(c, days, {100})
    assert (c2, days2, emit) == (c, days, [])


def test_table_join_enricher_equals_batch_asof(spark, sf_dir, events_ntz_dir):
    """KStream-KTable enrichment over the event stream must equal the
    batch as-of join when rows arrive in event-time order (single
    availableNow batch; within-batch ordering is by event time)."""
    from kafka_stream_spark.operators.event_analytics import asof_join_last_view
    from kafka_stream_spark.streaming.stateful import table_join_enricher

    stream = (
        spark.readStream.schema(EVENTS_NTZ)
        .parquet(events_ntz_dir)
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id", "ts", "event_id",
            F.when(F.col("event_type") == "view", 0).otherwise(1).alias("side"),
        )
    )
    enriched = table_join_enricher(stream.groupBy("user_id"), "ts", "event_id", "side")
    got = _collect_stream(spark, enriched, "eq_asof", "append")
    streamed = sorted(
        map(
            tuple,
            got.select(
                "event_id", "user_id",
                F.timestamp_micros("ts").alias("ts"),
                "view_event_id",
                F.timestamp_micros("view_ts").alias("view_ts"),
            ).collect(),
        ),
    )
    batch = sorted(map(tuple, asof_join_last_view(spark, sf_dir).collect()))
    assert streamed == batch


def test_asof_step_processing_order_semantics():
    """Kafka Streams stream-table contract: within a batch, event-time
    order with table-side winning ties; across batches, state carries and
    late table updates don't retro-correct."""
    from kafka_stream_spark.streaming.stateful import _asof_step

    # batch 1: view@10 then purchase@20 -> attributed; tie at 30 (view
    # processes first); purchase@5 precedes any view -> unattributed
    view, out = _asof_step(
        None, [(20, 101, 1), (10, 1, 0), (30, 2, 0), (30, 102, 1), (5, 100, 1)]
    )
    assert view == (30, 2)
    assert out == [(100, 5, None), (101, 20, (10, 1)), (102, 30, (30, 2))]
    # batch 2: state carried; a LATE view@15 updates nothing (25 > 15 kept)
    view2, out2 = _asof_step(view, [(15, 3, 0), (40, 103, 1)])
    assert view2 == (30, 2)
    assert out2 == [(103, 40, (30, 2))]


def test_cms_sketch_merges_across_microbatches(spark, sf_dir, events_ntz_dir):
    """Count-min sketches are linear (bucket counts add), so a streaming
    sketch built across micro-batches must equal the batch sketch."""
    from kafka_stream_spark.operators.analytics_ext import (
        _CMS_D,
        _cms_bucket_spark,
    )

    def bucketize(df):
        hashes = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(_cms_bucket_spark(d)).alias("bucket"),
                    )
                    for d in range(_CMS_D)
                ]
            )
        ).alias("h")
        return df.select("user_id", hashes).select("h.d", "h.bucket")

    (events,) = load(spark, sf_dir, "events")
    batch = sorted(
        map(
            tuple,
            bucketize(events).groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c")).collect(),
        )
    )
    stream = (
        spark.readStream.schema(EVENTS_NTZ)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_ntz_dir)
    )
    streamed_df = ops.running_agg(
        bucketize(stream), ["d", "bucket"], [F.count(F.lit(1)).alias("c")]
    )
    got = _collect_stream(spark, streamed_df, "eq_cms", "complete")
    assert sorted(map(tuple, got.collect())) == batch


def test_trending_topk_stream_equals_batch(spark, sf_dir, events_ntz_dir, tmp_path):
    """Streaming windowed counts + read-time ranking must equal the batch
    top-3 event types per 10-minute window, across micro-batches."""
    from kafka_stream_spark.streaming.ops import read_trending, trending_topk

    stream = (
        spark.readStream.schema(EVENTS_NTZ)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_ntz_dir)
    )
    sink = str(tmp_path / "trend")
    # files aren't time-ordered, so batch 2 replays "old" events: widen the
    # watermark past the data span so no row is late-dropped (the test
    # isolates cross-batch MERGE semantics, not lateness policy)
    q = (
        trending_topk(stream, "ts", "event_type", "10 minutes", sink, watermark="40 days")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, read_trending(spark, sink, k=3).collect()))

    from pyspark.sql import Window

    (events,) = load(spark, sf_dir, "events")
    counts = (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    batch = sorted(
        map(
            tuple,
            counts.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .drop("rnk")
            .collect(),
        )
    )
    assert got == batch


def test_asof_buffer_step_event_time_semantics():
    """Unlike _asof_step (processing order), the buffered step lets a
    LATE view retro-attribute a purchase that is still inside the
    watermark horizon, and only finalizes past-watermark purchases."""
    from kafka_stream_spark.streaming.stateful import _asof_buffer_step

    # batch 1: purchase@100 arrives BEFORE any view; wm=0 → held
    v, p, out = _asof_buffer_step([], [], [(100, 1, 1)], 0)
    assert (v, p, out) == ([], [(100, 1)], [])
    # batch 2: late view@50 arrives; wm=90 → purchase@100 still pending
    v, p, out = _asof_buffer_step(v, p, [(50, 10, 0)], 90)
    assert (v, p, out) == ([(50, 10)], [(100, 1)], [])
    # batch 3: wm passes → purchase finalizes WITH the late view
    v, p, out = _asof_buffer_step(v, p, [], 200)
    assert p == [] and out == [(1, 100, (50, 10))]
    assert v == [(50, 10)]  # latest pre-wm view retained for future keys
    # tie: view@300 vs purchase@300 → view wins (ASOF >=); max-id view wins
    v, p, out = _asof_buffer_step(v, p, [(300, 11, 0), (300, 12, 0), (300, 2, 1)], 400)
    assert out == [(2, 300, (300, 12))]
    # pruning: only the latest pre-watermark view survives
    assert v == [(300, 12)]


def test_stream_stream_asof_multibatch_out_of_order(spark, sf_dir, tmp_path):
    """Three time-ordered micro-batches, rows SHUFFLED inside each batch:
    the watermarked stream-stream as-of join must equal the batch as-of
    attribution for every purchase (sentinel advances the watermark past
    the tail so everything flushes)."""
    import os
    import random

    from kafka_stream_spark.streaming.stateful import stream_stream_asof_join

    import datetime

    (events,) = load(spark, sf_dir, "events")
    utc = datetime.timezone.utc
    rows = [
        (
            r.user_id,
            int(r.ts.replace(tzinfo=utc).timestamp() * 1_000_000),
            r.event_id,
            0 if r.event_type == "view" else 1,
        )
        for r in events.filter(F.col("event_type").isin("view", "purchase")).collect()
    ]
    rows.sort(key=lambda r: r[1])
    rng = random.Random(7)
    thirds = [rows[: len(rows) // 3], rows[len(rows) // 3 : 2 * len(rows) // 3],
              rows[2 * len(rows) // 3 :]]
    sentinel = (
        10**9,
        max(r[1] for r in rows) + 30 * 86400 * 1_000_000,
        10**9,
        0,
    )
    thirds[2] = thirds[2] + [sentinel]
    src = tmp_path / "asof_src"
    src.mkdir()
    schema = "user_id long, ts_us long, event_id long, side int"
    for i, part in enumerate(thirds):
        rng.shuffle(part)  # out-of-order WITHIN each micro-batch
        f = str(src / f"part{i}.parquet")
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f)
        os.utime(f, (1000 + i, 1000 + i))  # deterministic batch order
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/part*.parquet")
        .withColumn("ts", F.timestamp_micros("ts_us"))
        .withWatermark("ts", "1 hour")
    )
    joined = stream_stream_asof_join(
        stream.groupBy("user_id"), "ts", "event_id", "side"
    )
    got = _collect_stream(spark, joined, "ss_asof", "append")
    streamed = sorted(
        (r.event_id, r.user_id, r.ts, r.view_event_id, r.view_ts)
        for r in got.collect()
    )
    # brute-force expectation over the real (non-sentinel) events
    views, purchases = {}, []
    for uid, us, eid, side in rows:
        if side == 0:
            views.setdefault(uid, []).append((us, eid))
        else:
            purchases.append((uid, us, eid))
    expected = []
    for uid, us, eid in purchases:
        prior = [v for v in views.get(uid, []) if v[0] <= us]
        best = max(prior) if prior else None
        expected.append(
            (eid, uid, us, best[1] if best else None, best[0] if best else None)
        )
    assert streamed == sorted(expected) and streamed
