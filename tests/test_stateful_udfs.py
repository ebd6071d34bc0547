"""Custom stateful processors (X1) and the UDF/UDAF/UDTF surface (§2.10)."""

import math

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from kafka_stream_spark.functions.udfs import geometric_mean, haversine_km, ngrams
from kafka_stream_spark.observability import MetricsListener, list_active, topic_stats
from kafka_stream_spark.streaming import stateful

PAY_SCHEMA = StructType(
    [StructField("card", StringType()), StructField("amount", DoubleType())]
)


@pytest.fixture()
def payments_dir(spark, tmp_path):
    rows = [
        ("card1", 40.0), ("card1", 70.0),   # card1 total 110 → alert at 100
        ("card2", 10.0), ("card2", 20.0),   # card2 total 30 → no alert
        ("card3", 250.0),                    # card3 single large → alert
    ]
    path = str(tmp_path / "payments")
    spark.createDataFrame(rows, ["card", "amount"]).coalesce(1).write.parquet(path)
    return path


def test_running_counter_state(spark, payments_dir):
    stream = spark.readStream.schema(PAY_SCHEMA).parquet(payments_dir)
    out = stateful.running_counter(stream.groupBy("card"), "card", "amount")
    q = (
        out.writeStream.format("memory").queryName("counter")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {r.key: (r.n, r.total) for r in spark.sql("SELECT * FROM counter").collect()}
    assert got == {"card1": (2, 110.0), "card2": (2, 30.0), "card3": (1, 250.0)}


def test_threshold_alerter_fires_and_resets(spark, payments_dir):
    stream = spark.readStream.schema(PAY_SCHEMA).parquet(payments_dir)
    out = stateful.threshold_alerter(stream.groupBy("card"), "card", "amount", 100.0)
    q = (
        out.writeStream.format("memory").queryName("alerts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {r.key: r.total for r in spark.sql("SELECT * FROM alerts").collect()}
    assert got == {"card1": 110.0, "card3": 250.0}  # card2 under threshold


def test_haversine_pandas_udf(spark):
    # NYC -> LA ≈ 3936 km
    df = spark.createDataFrame([(40.7128, -74.0060, 34.0522, -118.2437)],
                               ["lat1", "lon1", "lat2", "lon2"])
    km = df.select(haversine_km("lat1", "lon1", "lat2", "lon2").alias("km")).first().km
    assert abs(km - 3936) < 10


def test_geometric_mean_udaf(spark):
    df = spark.createDataFrame([("a", 2.0), ("a", 8.0), ("b", 5.0)], ["k", "v"])
    got = {r.k: r.gm for r in df.groupBy("k").agg(geometric_mean("v").alias("gm")).collect()}
    assert abs(got["a"] - 4.0) < 1e-9  # sqrt(2*8)
    assert abs(got["b"] - 5.0) < 1e-9


def test_ngrams_udtf_expression(spark):
    df = spark.createDataFrame([("the quick brown fox",)], ["text"]).select(
        F.split("text", " ").alias("toks")
    )
    out = df.select(F.explode(ngrams(F.col("toks"), 2)).alias("g")).collect()
    assert [r.g for r in out] == ["the quick", "quick brown", "brown fox"]
    # short input → empty, not error (ANSI-safe)
    short = spark.createDataFrame([("hi",)], ["text"]).select(F.split("text", " ").alias("toks"))
    assert short.select(F.explode(ngrams(F.col("toks"), 3))).count() == 0


def test_metrics_listener_collects_progress(spark, payments_dir):
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(PAY_SCHEMA).parquet(payments_dir)
        q = (
            stream.groupBy("card").count()
            .writeStream.format("memory").queryName("obs_q")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        assert any(a["name"] == "obs_q" for a in list_active(spark))
        q.awaitTermination(60)
        import time
        deadline = time.time() + 10
        while time.time() < deadline:
            snaps = [m for m in listener.snapshot() if m.name == "obs_q" and m.batches]
            if snaps:
                break
            time.sleep(0.5)
        assert snaps and snaps[0].total_input_rows == 5
    finally:
        spark.streams.removeListener(listener)


def test_topic_stats(spark, tmp_path):
    from kafka_stream_spark.sources.topics import FileTopic

    t = FileTopic(spark, str(tmp_path), "obs", partitions=2)
    t.append(spark.createDataFrame([(f"k{i}", "v") for i in range(10)], ["key", "value"]))
    stats = topic_stats(t.read())
    assert stats["rows"] == 10
    assert sum(stats["partitions"].values()) == 10


def test_python_udtf_lateral_join(spark):
    from kafka_stream_spark.functions.udfs import HAS_UDTF, register_udtfs

    assert HAS_UDTF  # PySpark 4 in this container
    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "solo")], ["doc_id", "text"]
    )
    docs.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """SELECT d.doc_id, g.gram, g.pos
           FROM udtf_docs d, LATERAL ngrams_udtf(d.text, 2) g
           ORDER BY d.doc_id, g.pos"""
    ).collect()
    got = [(r.doc_id, r.gram, r.pos) for r in rows]
    assert got == [
        (1, "a b", 0), (1, "b c", 1), (1, "c d", 2),
        (2, "x y", 0),
    ]  # doc 3 has no bigram -> no rows (UDTF emits nothing)


def test_funnel_tracker_across_restarts(spark, tmp_path):
    # state machine survives a checkpointed restart: stages delivered in
    # two separate runs still complete the funnel exactly once
    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    from kafka_stream_spark.streaming.stateful import funnel_tracker

    schema = StructType([
        StructField("user", StringType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
    ])
    src = tmp_path / "in"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(rows, ["user", "event_type", "ts_s"]).select(
            "user", "event_type", F.to_timestamp("ts_s").alias("ts")
        ).coalesce(1).write.mode("append").parquet(str(src))

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        res = funnel_tracker(
            stream.groupBy("user"), "user", "event_type", "ts",
            ("signup", "view", "purchase"),
        )
        q = (res.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    # run 1: A signs up and views; B purchases out of order (never advances)
    write_batch("b1", [
        ("A", "signup", "2024-01-01 00:00:00"),
        ("A", "view", "2024-01-01 00:10:00"),
        ("B", "purchase", "2024-01-01 00:00:00"),
        ("B", "view", "2024-01-01 00:01:00"),
    ])
    run_once()
    assert spark.read.parquet(out).where("key is not null").count() == 0

    # run 2 (fresh query, same checkpoint): A purchases -> funnel completes;
    # B signs up (stage 0 only)
    write_batch("b2", [
        ("A", "purchase", "2024-01-01 00:20:00"),
        ("B", "signup", "2024-01-01 00:30:00"),
    ])
    run_once()
    rows = spark.read.parquet(out).where("key is not null").collect()
    assert [(r.key, r.n_stages) for r in rows] == [("A", 3)]
    got = rows[0]
    assert got.started_at < got.completed_at

    # run 3: a re-delivered purchase for A must NOT re-emit (done flag)
    write_batch("b3", [("A", "purchase", "2024-01-01 00:40:00")])
    run_once()
    assert spark.read.parquet(out).where("key is not null").count() == 1


def test_funnel_tracker_window_budget(spark, tmp_path):
    """window_us: later stages only count within the anchor's budget —
    the streaming twin of windowed_funnel_events. User A completes
    inside 1h; user B's purchase lands past the budget (no emission);
    user C's late view is skipped but an in-budget later view still
    advances? No — strictly increasing stage times hold, so C stalls."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        StringType, StructField, StructType, TimestampType,
    )

    from kafka_stream_spark.streaming.stateful import funnel_tracker

    schema = StructType([
        StructField("user", StringType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
    ])
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        # A: whole chain inside the hour
        ("A", "signup", "2024-01-01 00:00:00"),
        ("A", "view", "2024-01-01 00:10:00"),
        ("A", "purchase", "2024-01-01 00:50:00"),
        # B: purchase 2h after the anchor -> budget exceeded
        ("B", "signup", "2024-01-01 00:00:00"),
        ("B", "view", "2024-01-01 00:30:00"),
        ("B", "purchase", "2024-01-01 02:00:00"),
    ]
    spark.createDataFrame(rows, ["user", "event_type", "ts_s"]).select(
        "user", "event_type", F.to_timestamp("ts_s").alias("ts")
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    res = funnel_tracker(
        stream.groupBy("user"), "user", "event_type", "ts",
        ("signup", "view", "purchase"), window_us=3600 * 1_000_000,
    )
    q = (res.writeStream.format("memory").queryName("wfunnel")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    done = {r.key for r in spark.sql("SELECT * FROM wfunnel").collect()}
    assert done == {"A"}
