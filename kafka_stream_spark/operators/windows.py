"""Event-time windowed operators (SURVEY.md §2.5 A1-A5, §2.4 J1-J2, §2.9).

These are the Kafka-Streams/Lenses semantics (tumbling/hopping/session
windows, latest-by-key compaction, stream-stream interval join,
stream-table enrichment) expressed over the batch ``events`` table so the
DuckDB oracle can verify them; the same plans run as Structured Streaming
in ``kafka_stream_spark.streaming`` (same ``window()``/``session_window()``
expressions + ``withWatermark``).

Scale notes:
- ``window()``/``session_window()`` group-bys shuffle once on
  (window, key) with map-side partial aggregation;
- latest-by-key uses ``max_by`` (single shuffle agg), not row_number over a
  sort — at 100 TB a per-key sort is strictly worse;
- the interval join is a range-bounded self-join on user_id: Spark plans a
  shuffled hash join on the equi-key with the range as residual — the join
  explodes only within a key, which is the same cost model Kafka Streams'
  JoinWindows pays.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

# DuckDB-side tumbling bucket via pure epoch-ms integer arithmetic
# (origin-independent; matches Spark's epoch-aligned window()).
_BUCKET10 = "epoch_ms((epoch_ms(ts) // 600000) * 600000)"


@query(
    "tumbling_window_events",
    oracle=f"""
    SELECT {_BUCKET10} AS window_start, event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    description="10-minute tumbling window aggregate (SURVEY.md A2)",
    bench=True,
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
        .orderBy("window_start", "event_type")
    )


@query(
    "hopping_window_events",
    oracle="""
    SELECT epoch_ms((epoch_ms(ts) // 300000) * 300000 - k * 300000) AS window_start,
           count(*) AS n, round(avg(value), 6) AS avg_value
    FROM events, (VALUES (0), (1)) AS hops(k)
    GROUP BY window_start
    ORDER BY window_start
    """,
    description="10-minute window, 5-minute hop (SURVEY.md A3; Kafka Streams advanceBy)",
)
def hopping_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
        .orderBy("window_start")
    )


@query(
    "session_window_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            + INTERVAL 30 MINUTE
                       OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    description="30-minute-gap session windows per user (SURVEY.md A4)",
    bench=True,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "latest_by_key_events",
    oracle="""
    SELECT user_id, event_id, event_type, ts, round(value, 2) AS value
    FROM (
      SELECT user_id, event_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    ORDER BY user_id
    """,
    description="Log-compaction materialization: latest record per key (SURVEY.md A5)",
    bench=True,
)
def latest_by_key_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    # max_by over (ts, event_id): one shuffle, no per-key sort — the
    # compacted-topic view (cleanup.policy=compact, variables.env:6).
    ord_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy("user_id")
        .agg(
            F.max_by("event_id", ord_key).alias("event_id"),
            F.max_by("event_type", ord_key).alias("event_type"),
            F.max_by("ts", ord_key).alias("ts"),
            F.round(F.max_by("value", ord_key), 2).alias("value"),
        )
        .orderBy("user_id")
    )


@query(
    "dedup_events",
    oracle="""
    SELECT user_id, event_type,
           epoch_ms((epoch_ms(ts) // 3600000) * 3600000) AS window_start,
           min(event_id) AS first_event_id, count(*) AS n_dupes
    FROM events
    GROUP BY user_id, event_type, window_start
    ORDER BY user_id, event_type, window_start
    """,
    description="Exact stream dedup: first event per (key, type, hour) (SURVEY.md A6)",
)
def dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    # deterministic dedup: min(event_id) per dedup key — the batch analog of
    # dropDuplicatesWithinWatermark (streaming version in streaming/dedup.py)
    return (
        events.groupBy(
            "user_id", "event_type", F.window("ts", "1 hour").alias("w")
        )
        .agg(F.min("event_id").alias("first_event_id"), F.count(F.lit(1)).alias("n_dupes"))
        .select(
            "user_id", "event_type", F.col("w.start").alias("window_start"),
            "first_event_id", "n_dupes",
        )
        .orderBy("user_id", "event_type", "window_start")
    )


@query(
    "interval_join_events",
    oracle="""
    SELECT a.user_id AS user_id, count(*) AS n_pairs,
           min(b.ts) AS first_purchase_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    GROUP BY a.user_id
    ORDER BY a.user_id
    """,
    description="Stream-stream windowed join: click→purchase within 10 min (SURVEY.md J2)",
    bench=True,
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    return (
        clicks.join(
            purchases,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .groupBy(F.col("a_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.min("b_ts").alias("first_purchase_ts"))
        .orderBy("user_id")
    )


@query(
    "enrich_join_events",
    oracle="""
    SELECT c_mktsegment, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    ORDER BY c_mktsegment, event_type
    """,
    description="Stream-table enrichment join against broadcast dimension (SURVEY.md J1)",
)
def enrich_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events, customer = load(spark, sf_dir, "events", "customer")
    return (
        events.join(F.broadcast(customer), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("c_mktsegment", "event_type")
    )
