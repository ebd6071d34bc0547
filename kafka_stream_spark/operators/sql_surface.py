"""The streaming-SQL text surface — Lenses analog (SURVEY.md §3.3).

Entry point C: SQL text over registered views, parsed/optimized by
Catalyst. ``browse`` queries are bounded scan+filter+project+limit; these
registered queries prove the text surface end-to-end against the oracle
(same SQL dialect modulo engine functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.catalog import load_tables
from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query


@query(
    "sql_browse_events",
    oracle="""
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM events
    WHERE event_type = 'error' AND value > 150
    ORDER BY event_id
    LIMIT 50
    """,
    description="Lenses-style SQL browse: bounded scan+filter+project+limit via spark.sql (§3.3 shape a)",
)
def sql_browse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events")[0].createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_id, user_id, event_type, round(value, 2) AS value
        FROM events
        WHERE event_type = 'error' AND value > 150
        ORDER BY event_id
        LIMIT 50
        """
    )


@query(
    "sql_processor_agg",
    oracle="""
    SELECT event_type, count(*) AS n, round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="Lenses-style continuous processor body as SQL text (§3.3 shape b)",
)
def sql_processor_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events")[0].createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type, count(*) AS n, round(avg(value), 6) AS avg_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
        """
    )
