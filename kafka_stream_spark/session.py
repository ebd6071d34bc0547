"""SparkSession factory tuned for the engine.

Scale stance: these configs are chosen for a 1000-executor cluster reading
~100 TB, then validated on local[N]:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast).
- ``spark.sql.shuffle.partitions`` is a default only — AQE coalesces down;
  on a real cluster you'd raise the initial number (e.g. 2000+) and let AQE
  shrink it per-stage.
- Arrow enabled for the (few) Pandas-UDF paths.
- Session timezone pinned to UTC so event-time bucketing is deterministic
  regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kafka-stream-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def enable_rocksdb_state(spark: SparkSession) -> None:
    """RocksDB state store for large streaming state (SURVEY.md §4: Kafka
    Streams' RocksDB analog). Applies to queries started afterwards."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


def pin_utc(spark: SparkSession) -> SparkSession:
    """Force deterministic UTC time semantics on an externally-provided session.

    The driver hands us its own SparkSession; event-time bucketing
    (``window``, ``unix_timestamp``) is session-timezone-dependent, so every
    query entry point pins UTC before building its plan.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
