"""Skew-mitigation operators (SCALING.md §4: salting escape hatch).

AQE's skew-join handling covers joins; for *aggregations* over pathological
hot keys, salting splits each key into N sub-keys, pre-aggregates, then
merges — two shuffles, but each sized 1/N on the hot key. ``salted_agg``
packages that for the decomposable aggregates (count/sum/min/max).

Registered query proves salted == plain against the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query


def salted_sum_count(
    df: DataFrame, keys: list[str], value_col: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-stage skew-safe sum+count per key.

    Stage 1 groups on (key, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; stage 2 merges the tiny partials.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), salt_buckets)
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value_col).alias("__psum"), F.count(F.lit(1)).alias("__pcnt")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias("sum_value"), F.sum("__pcnt").alias("n")
    )


@query(
    "salted_agg_events",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="Skew-salted two-stage aggregate == plain GROUP BY (hot-key mitigation)",
)
def salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    out = salted_sum_count(events, ["event_type"], "value", salt_buckets=16)
    return out.select(
        "event_type", "n", F.round("sum_value", 2).alias("sum_value")
    ).orderBy("event_type")
