"""Structured-Streaming end-to-end tests (SURVEY.md §7 M4).

Pattern: file/rate sources → streaming ops → memory sink, driven with
availableNow triggers so each test is bounded and deterministic.
"""

import time

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_stream_spark.streaming import ops
from kafka_stream_spark.streaming.pipelines import PipelineRegistry

EVENTS_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.fixture()
def events_dir(spark, tmp_path):
    rows = [
        ("2024-01-01 00:01:00", 1, "click", 1.0),
        ("2024-01-01 00:04:00", 1, "purchase", 10.0),
        ("2024-01-01 00:14:00", 1, "click", 2.0),
        ("2024-01-01 00:55:00", 2, "click", 3.0),
        ("2024-01-01 00:57:00", 2, "purchase", 30.0),
        ("2024-01-01 00:58:00", 2, "click", 4.0),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "user_id", "event_type", "value"]).select(
        F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value"
    )
    path = str(tmp_path / "events")
    df.coalesce(1).write.parquet(path)
    return path


def _run_to_memory(stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    return q


def test_streaming_tumbling_window(spark, events_dir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    agg = ops.windowed_agg(
        stream, "ts", "10 minutes", ["user_id"],
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")],
    )
    # update mode: append mode would (correctly) withhold windows still
    # above the watermark — here we want every window's current state
    _run_to_memory(agg, "tumble", mode="update")
    rows = {
        (r.user_id, r.window.start.minute): (r.n, r.sv)
        for r in spark.sql("SELECT * FROM tumble").collect()
    }
    assert rows[(1, 0)] == (2, 11.0)
    assert rows[(1, 10)] == (1, 2.0)
    assert rows[(2, 50)] == (3, 37.0)


def test_streaming_session_window(spark, tmp_path):
    rows = [
        ("2024-01-01 00:01:00", 1, "click", 1.0),
        ("2024-01-01 00:04:00", 1, "purchase", 10.0),
        ("2024-01-01 00:14:00", 1, "click", 2.0),
        ("2024-01-01 00:55:00", 2, "click", 3.0),
        ("2024-01-01 00:57:00", 2, "purchase", 30.0),
        ("2024-01-01 00:58:00", 2, "click", 4.0),
        # sentinel far in the future: session windows only support append
        # mode, which emits a session once the watermark passes its close
        ("2024-01-01 06:00:00", 99, "click", 0.0),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "user_id", "event_type", "value"]).select(
        F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value"
    )
    path = str(tmp_path / "sess_events")
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    agg = ops.session_agg(
        stream, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")]
    )
    _run_to_memory(agg, "sess", mode="append")
    got = {
        (r.user_id, r.n)
        for r in spark.sql("SELECT user_id, n FROM sess WHERE user_id < 99").collect()
    }
    # user 1: events at 00:01/00:04/00:14 merge into one session of 3
    # user 2: 00:55/00:57/00:58 one session of 3
    assert got == {(1, 3), (2, 3)}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    rows = [
        ("2024-01-01 00:01:00", "a"),
        ("2024-01-01 00:02:00", "a"),  # duplicate key
        ("2024-01-01 00:03:00", "b"),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "k"]).select(
        F.to_timestamp("ts_s").alias("ts"), "k"
    )
    path = str(tmp_path / "dups")
    df.coalesce(1).write.parquet(path)
    schema = StructType([StructField("ts", TimestampType()), StructField("k", StringType())])
    stream = spark.readStream.schema(schema).parquet(path)
    out = ops.dedup_within_watermark(stream, ["k"], "ts", "1 hour")
    _run_to_memory(out, "dedup")
    assert spark.sql("SELECT count(*) c FROM dedup").first().c == 2


def test_streaming_stream_static_join(spark, events_dir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], ["user_id", "tier"])
    joined = ops.stream_static_join(stream, dim, "user_id")
    _run_to_memory(joined, "enriched")
    tiers = {
        (r.user_id, r.tier)
        for r in spark.sql("SELECT DISTINCT user_id, tier FROM enriched").collect()
    }
    assert tiers == {(1, "gold"), (2, "silver")}


def test_streaming_interval_join(spark, events_dir):
    clicks = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
        .filter("event_type = 'click'")
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("click_ts"))
    )
    buys = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
        .filter("event_type = 'purchase'")
        .select(F.col("user_id").alias("bu"), F.col("ts").alias("buy_ts"))
    )
    cw = clicks.withWatermark("click_ts", "10 minutes")
    bw = buys.withWatermark("buy_ts", "10 minutes")
    joined = cw.join(
        bw,
        (cw.cu == bw.bu)
        & (bw.buy_ts >= cw.click_ts)
        & (bw.buy_ts <= cw.click_ts + F.expr("INTERVAL 10 MINUTES")),
    )
    _run_to_memory(joined, "ij")
    pairs = {
        (r.cu, r.click_ts.minute, r.buy_ts.minute)
        for r in spark.sql("SELECT cu, click_ts, buy_ts FROM ij").collect()
    }
    # user1 click@01 → buy@04; user2 clicks@55 → buy@57 (click@58 has no later buy)
    assert pairs == {(1, 1, 4), (2, 55, 57)}


def test_foreach_batch_upsert_compacts(spark, tmp_path, events_dir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    latest = stream.select("user_id", "ts", "event_type", "value")
    sink = str(tmp_path / "latest_state")
    ckpt = str(tmp_path / "ckpt")
    q = (
        ops.foreach_batch_upsert(latest, sink, keys=["user_id"], order_col="ts")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = {r.user_id: r.event_type for r in ops.read_upserted(spark, sink).collect()}
    # latest event per user: user1 click@00:14, user2 click@00:58
    assert out == {1: "click", 2: "click"}


def test_pipeline_registry_crud(spark, tmp_path):
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "a.txt").write_text("INFO boot\nERROR disk\nINFO ok\n")
    reg = PipelineRegistry(spark)
    # Connect-style spec with a KCQL transform (P1) routing to memory sink
    spec = {
        "name": "logs_pipeline",
        "source": {
            "format": "text",
            "path": str(src_dir),
            "schema": StructType([StructField("value", StringType())]),
        },
        "transform": "INSERT INTO out SELECT value FROM logs WITHWHERE value LIKE 'ERROR%'",
        "sink": {"format": "memory", "table": "logs_out"},
        "trigger": {"availableNow": True},
        "checkpoint": str(tmp_path / "ckpt"),
    }
    p = reg.start(spec)
    assert reg.list() == ["logs_pipeline"]
    p.query.awaitTermination(60)
    vals = [r.value for r in spark.sql("SELECT * FROM logs_out").collect()]
    assert vals == ["ERROR disk"]
    st = reg.status("logs_pipeline")
    assert st["name"] == "logs_pipeline"
    reg.delete("logs_pipeline")
    assert reg.list() == []


def test_pipeline_sql_transform(spark, tmp_path):
    """Lenses-processor spec: SQL text as the pipeline transform (§3.3b)."""
    src_dir = tmp_path / "sqlsrc"
    src_dir.mkdir()
    (src_dir / "a.txt").write_text("x\nyy\nzzz\n")
    reg = PipelineRegistry(spark)
    p = reg.start(
        {
            "name": "sql_proc",
            "source": {
                "format": "text",
                "path": str(src_dir),
                "schema": StructType([StructField("value", StringType())]),
            },
            "transform": "SELECT length(value) AS n FROM source WHERE value <> 'x'",
            "sink": {"format": "memory", "table": "sql_proc_out"},
            "trigger": {"availableNow": True},
            "checkpoint": str(tmp_path / "ck_sql"),
        }
    )
    p.query.awaitTermination(60)
    assert sorted(r.n for r in spark.sql("SELECT * FROM sql_proc_out").collect()) == [2, 3]
    reg.delete("sql_proc")


def test_pipeline_validation_errors(spark):
    reg = PipelineRegistry(spark)
    problems = reg.validate({"name": "", "source": {}, "sink": {"format": "bogus"}})
    assert any("name" in p for p in problems)
    assert any("source.format" in p for p in problems)
    assert any("sink.format" in p for p in problems)
    with pytest.raises(ValueError):
        reg.start({"name": "x", "source": {}, "sink": {"format": "bogus"}})


def test_foreach_batch_merge_compacts_and_prunes(spark, tmp_path, events_dir):
    """The partition-pruned MERGE sink: same semantics as the full-rewrite
    upsert, but a second batch touching one key must rewrite ONLY that
    key's bucket partition (the other bucket's files stay untouched)."""
    import glob
    import os

    sink = str(tmp_path / "merged_state")
    n_buckets = 8

    def drain(src_dir, ckpt):
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)
        latest = stream.select("user_id", "ts", "event_type", "value")
        q = (
            ops.foreach_batch_merge(
                latest, sink, keys=["user_id"], order_col="ts", num_buckets=n_buckets
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    drain(events_dir, str(tmp_path / "ckpt1"))
    out = {r.user_id: r.event_type for r in ops.read_merged(spark, sink).collect()}
    assert out == {1: "click", 2: "click"}  # same as foreach_batch_upsert

    files_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{sink}/state-*/_bucket=*/*.parquet")
    }
    bucket_of = {
        r.user_id: r._bucket
        for r in ops.read_merged(spark, sink)
        .withColumn("_bucket", F.pmod(F.hash("user_id"), F.lit(n_buckets)))
        .select("user_id", "_bucket")
        .collect()
    }

    # second feed updates ONLY user 1
    src2 = tmp_path / "events2"
    src2.mkdir()
    spark.createDataFrame(
        [("2024-01-01 02:00:00", 1, "refund", 5.0)], ["ts", "user_id", "event_type", "value"]
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode("overwrite").parquet(str(src2))
    drain(str(src2), str(tmp_path / "ckpt2"))

    out2 = {r.user_id: r.event_type for r in ops.read_merged(spark, sink).collect()}
    assert out2 == {1: "refund", 2: "click"}
    if bucket_of[1] != bucket_of[2]:  # hash collision would merge the buckets
        untouched = [
            p for p in files_before if f"_bucket={bucket_of[2]}/" in p or f"_bucket={bucket_of[2]}{os.sep}" in p
        ]
        assert untouched, "expected files in user 2's bucket"
        for p in untouched:
            assert os.path.getmtime(p) == files_before[p], "untouched bucket was rewritten"


def test_streaming_interval_join_left_outer(spark, events_dir):
    """J2 outer variant (Kafka Streams leftOuter JoinWindows): clicks with
    no purchase within the window emit with nulls once the watermark passes."""
    clicks = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
        .filter("event_type = 'click'")
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("click_ts"))
    )
    buys = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
        .filter("event_type = 'purchase'")
        .select(F.col("user_id").alias("bu"), F.col("ts").alias("buy_ts"))
    )
    joined = ops.interval_join(
        clicks, buys, key=None, left_ts="click_ts", right_ts="buy_ts",
        lower="0 MINUTES", upper="10 MINUTES", watermark="1 minutes",
        how="leftOuter", left_key="cu", right_key="bu",
    )
    _run_to_memory(joined, "ij_outer")
    rows = spark.sql("SELECT cu, click_ts, buy_ts FROM ij_outer").collect()
    matched = {(r.cu, r.click_ts.minute, r.buy_ts.minute) for r in rows if r.buy_ts}
    unmatched = {(r.cu, r.click_ts.minute) for r in rows if r.buy_ts is None}
    assert matched == {(1, 1, 4), (2, 55, 57)}
    # the click with no purchase in-window surfaces with a null right side
    assert (2, 58) in unmatched or (1, 14) in unmatched


def test_streaming_interval_join_full_outer(spark, events_dir):
    """J2 fullOuter (Kafka Streams outerJoin): unmatched rows on BOTH sides
    emit with nulls after the watermark."""
    clicks = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
        .filter("event_type = 'click'")
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("click_ts"))
    )
    buys = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
        .filter("event_type = 'purchase'")
        .select(F.col("user_id").alias("bu"), F.col("ts").alias("buy_ts"))
    )
    joined = ops.interval_join(
        clicks, buys, key=None, left_ts="click_ts", right_ts="buy_ts",
        lower="0 MINUTES", upper="2 MINUTES", watermark="1 minutes",
        how="fullOuter", left_key="cu", right_key="bu",
    )
    _run_to_memory(joined, "ij_full")
    rows = spark.sql("SELECT cu, bu, click_ts, buy_ts FROM ij_full").collect()
    # a narrow 2-min window: user1 click@01 has no buy within 2 min (buy@04),
    # so both the orphan click AND the orphan buy must surface
    assert any(r.cu is not None and r.bu is None for r in rows), "left orphan missing"
    assert any(r.cu is None and r.bu is not None for r in rows), "right orphan missing"
