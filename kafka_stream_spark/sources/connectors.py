"""Connector-style sources (SURVEY.md §2.1 S4/S5/S7).

These mirror the reference's Connect source connectors as Spark readers:

- ``file_tail_source``: FileStreamSourceConnector analog
  (``logs-to-kafka.sh:13-27``: tail /var/log/broker.log → topic
  logs_broker, one line per record) → ``readStream.format("text")``.
- ``JdbcIncrementalSource``: JdbcSourceConnector in ``mode=incrementing``
  (``kafka-tests.yml:209-257``: incrementing.column.name=id, topic
  prefix+table) → watermark-tracked batch pulls, runnable inside
  ``foreachBatch`` or a trigger loop.
- ``rate_replay``: normcat analog (``sample-data/put.sh:24``,
  ``running-ais.sh:27``: replay a dataset at r msg/s with jitter) →
  Spark ``rate`` source joined to the dataset by row index.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def file_tail_source(spark: SparkSession, path: str, topic_name: str = "logs") -> DataFrame:
    """Tail text files in a directory; one line per record, no key (S4)."""
    return (
        spark.readStream.format("text")
        .load(path)
        .select(
            F.lit(None).cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit(topic_name).alias("topic"),
        )
    )


class JdbcIncrementalSource:
    """Poll a JDBC table for rows above a strictly-increasing watermark (S5).

    Reference semantics (kafka-tests.yml:209-257): each poll emits rows
    with ``incrementing_column > last_seen``; the topic is
    ``topic_prefix + table``. The watermark would live in the stream
    checkpoint in production; here it's instance state the caller can
    persist.
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str,
        incrementing_column: str = "id",
        topic_prefix: str = "",
        properties: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.url = url
        self.table = table
        self.col = incrementing_column
        self.topic = f"{topic_prefix}{table}"
        self.properties = properties or {}
        self.last_seen: int | None = None

    def poll(self) -> DataFrame:
        """One incremental pull; advances the watermark to max(col) seen."""
        pred = f"{self.col} > {self.last_seen}" if self.last_seen is not None else "1=1"
        df = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("query", f"SELECT * FROM {self.table} WHERE {pred}")
            .options(**self.properties)
            .load()
        )
        mx = df.agg(F.max(self.col)).first()[0]
        if mx is not None:
            self.last_seen = mx if self.last_seen is None else max(self.last_seen, mx)
        return df


def rate_replay(
    spark: SparkSession,
    dataset: DataFrame,
    rows_per_second: int,
    loop: bool = True,
) -> DataFrame:
    """Replay a bounded dataset at a fixed rate as a stream (S7, normcat -r/-c).

    The ``rate`` source produces (timestamp, value=tick); each tick maps to
    dataset row ``tick % n`` (loop) or ``tick`` (one-shot). The dataset is
    indexed once and broadcast-joined — no shuffle per micro-batch.
    """
    n = dataset.count()
    indexed = dataset.withColumn(
        "__idx",
        F.row_number().over(Window.orderBy(F.monotonically_increasing_id())) - 1,
    # localCheckpoint truncates lineage: monotonically_increasing_id isn't
    # allowed inside a streaming plan, so the index must be materialized
    ).localCheckpoint(eager=True)
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .withColumn("__idx", (F.col("value") % n if loop else F.col("value")).cast("long"))
        .withColumnRenamed("timestamp", "replay_ts")
        .drop("value")
    )
    return ticks.join(F.broadcast(indexed), "__idx").drop("__idx")
