"""Oracle-checked KCQL query: the P1 operator end-to-end (SURVEY.md §2.3)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.plans import kcql
from kafka_stream_spark.registry import query

_STMT = (
    "INSERT INTO enriched_events "
    "SELECT event_id, user_id AS uid, event_type AS etype, value "
    "FROM events "
    "WITHWHERE value > 100.0 AND event_type = 'purchase' "
)


@query(
    "kcql_projection_events",
    oracle="""
    SELECT event_id, user_id AS uid, event_type AS etype, round(value, 2) AS value
    FROM events
    WHERE value > 100.0 AND event_type = 'purchase'
    ORDER BY event_id
    """,
    description="KCQL INSERT INTO … SELECT … AS … WITHWHERE lowered to select/filter (P1)",
)
def kcql_projection_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    target, df = kcql.run(_STMT, {"events": events})
    assert target == "enriched_events"
    return df.withColumn("value", F.round("value", 2)).orderBy("event_id")
