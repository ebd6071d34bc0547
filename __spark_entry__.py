"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke (sf0.001).
queries()    — every implemented operator from SURVEY.md §2 / north-star M6,
               one callable per name, built from the engine's registry.
oracle_sql() — DuckDB-equivalent SQL per query (same column aliases; the
               driver hash-compares values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = load_all()
    return specs["q1_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
