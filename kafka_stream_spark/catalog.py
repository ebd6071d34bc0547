"""Dataset catalog: named parquet tables + temp-view registration.

The reference models data as named Kafka topics browsable by SQL (Lenses;
SURVEY.md §3.3). Our batch analog: a catalog of named parquet datasets
registered as Spark temp views so both the DataFrame API and ``spark.sql``
see the same tables.

Scale note: loading is a metadata-only operation — ``spark.read.parquet``
defers I/O; filters/projections push down to the parquet scan, so a catalog
with 100 TB behind it costs nothing until a query runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
EXTRA_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = TPCH_TABLES + EXTRA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    tables: tuple[str, ...] = ALL_TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the named parquet tables under ``sf_dir``; optionally register views.

    Self-configures the session (UTC + nanosAsLong) so it works on a vanilla
    driver-owned SparkSession — ``events`` is TIMESTAMP(NANOS) parquet, which
    Spark cannot read without the legacy conf (see NOTES.md sharp edge #1).
    """
    from kafka_stream_spark.functions.time import enable_nanos_as_long, with_event_ts
    from kafka_stream_spark.session import pin_utc

    pin_utc(spark)
    enable_nanos_as_long(spark)
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name == "events":
            df = with_event_ts(df)
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out


class Catalog:
    """Named-dataset registry (topic-catalog analog, SURVEY.md §2.11)."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self._tables = load_tables(spark, sf_dir)

    def table(self, name: str) -> DataFrame:
        if name not in self._tables:
            raise KeyError(f"unknown dataset: {name!r} (have {sorted(self._tables)})")
        return self._tables[name]

    def names(self) -> list[str]:
        return sorted(self._tables)

    def sql(self, query: str) -> DataFrame:
        """Lenses-analog SQL entry point (reference README.md:41-43)."""
        return self.spark.sql(query)

    def browse(self, name: str, where: str | None = None, limit: int = 100) -> DataFrame:
        """Lenses-style bounded topic browse (SURVEY.md §2.6 W2)."""
        df = self.table(name)
        if where:
            df = df.filter(where)
        return df.limit(limit)
