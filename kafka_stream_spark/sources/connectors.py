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


class DbapiIncrementalSource:
    """``JdbcIncrementalSource`` over a Python DB-API connection (S5).

    The container ships no JDBC driver jars, but the reference's own test
    (kafka-tests.yml:209-257) runs the JdbcSourceConnector against sqlite —
    stdlib ``sqlite3`` reproduces that exact behavior: poll rows with
    ``incrementing_column > last_seen``, route to ``topic_prefix + table``.

    Scale note: Connect's JDBC source in incrementing mode is a SINGLE
    polling task (maxTasks is capped by the table count), so a driver-side
    fetch is semantically faithful and the right shape for low-rate change
    capture. For bulk backfill of a large table, use ``spark.read.jdbc``
    with ``partitionColumn/lowerBound/upperBound/numPartitions`` instead —
    that is a different operator (parallel snapshot), not this one.
    """

    def __init__(
        self,
        spark: SparkSession,
        connect,  # Callable[[], DB-API connection]
        table: str,
        incrementing_column: str = "id",
        topic_prefix: str = "",
        batch_size: int = 10_000,
        schema=None,  # StructType; inferred from the first non-empty poll if None
    ):
        self.spark = spark
        self.connect = connect
        self.table = table
        self.col = incrementing_column
        self.topic = f"{topic_prefix}{table}"
        self.batch_size = batch_size
        self.schema = schema
        self.last_seen = None

    def poll(self) -> DataFrame:
        """One incremental pull; advances the watermark to max(col) seen."""
        con = self.connect()
        try:
            cur = con.cursor()
            if self.last_seen is None:
                cur.execute(
                    f"SELECT * FROM {self.table} ORDER BY {self.col} LIMIT ?",
                    (self.batch_size,),
                )
            else:
                cur.execute(
                    f"SELECT * FROM {self.table} WHERE {self.col} > ? "
                    f"ORDER BY {self.col} LIMIT ?",
                    (self.last_seen, self.batch_size),
                )
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
        finally:
            con.close()
        idx = cols.index(self.col)
        if rows:
            mx = max(r[idx] for r in rows)
            self.last_seen = mx if self.last_seen is None else max(self.last_seen, mx)
            df = self.spark.createDataFrame(rows, self.schema or cols)
            self.schema = df.schema
            return df
        if self.schema is None:
            raise ValueError(
                f"first poll of {self.table!r} returned no rows and no schema "
                "was declared — pass schema= to allow empty initial polls"
            )
        return self.spark.createDataFrame([], self.schema)


def socket_source(
    spark: SparkSession, host: str, port: int, topic_name: str = "socket"
) -> DataFrame:
    """TCP line source (S12 Stream Reactor network-connector shape — the
    MQTT/CoAP/JMS family reduced to its transport: a line-delimited stream
    from a network endpoint). Spark's built-in socket source; records get
    the same (key, value, topic) envelope the file/JDBC connectors emit.

    Scale note: the socket source is single-receiver (dev/test transport,
    like the reference's console producers); production network ingestion
    goes through Kafka (KafkaTopic.read_stream), where partitions fan out.
    """
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .select(
            F.lit(None).cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit(topic_name).alias("topic"),
        )
    )
