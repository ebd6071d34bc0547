"""Topic abstraction: keyed, partitioned record streams (SURVEY.md §1.1).

Two interchangeable backends expose the same record model
``(key, value, topic, partition, offset, timestamp)`` — the Kafka source's
column contract, adopted per SURVEY.md §1.4:

- ``KafkaTopic``: thin wrapper over Spark's Kafka source/sink (S1/S2/K1).
  Requires the spark-sql-kafka package on the classpath; constructing the
  reader is cheap, so availability is only checked at run time.
- ``FileTopic``: a parquet-directory-backed topic for broker-less
  environments (M3: "a file-backed 'topic' keeps semantics testable").
  Appends assign monotonically increasing offsets per partition; partition
  assignment hashes the key exactly like Kafka's default partitioner
  concept (hash(key) % n), here via ``pmod(xxhash64(key), n)``.

Both support batch reads and streaming reads, and the compacted-table view
(``cleanup.policy=compact`` analog): latest record per key by max offset.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

TOPIC_COLUMNS = ("key", "value", "topic", "partition", "offset", "timestamp")


def latest_by_key(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Compacted-topic materialization: arg-max by (partition, offset) per key.

    One shuffle on the key (max_by aggregate) — the A5 operator. For the
    reference's semantics see ``sample-data/variables.env:6``
    (cleanup.policy=compact on telecom_italia_grid).
    """
    keys = key_cols or ["key"]
    ord_key = F.struct(F.col("offset"))
    others = [c for c in df.columns if c not in keys]
    return df.groupBy(*keys).agg(
        *[F.max_by(c, ord_key).alias(c) for c in others]
    )


class KafkaTopic:
    """Kafka-backed topic (SURVEY.md S1/S2/K1). Needs spark-sql-kafka jars."""

    def __init__(self, spark: SparkSession, bootstrap_servers: str, topic: str):
        self.spark = spark
        self.servers = bootstrap_servers
        self.topic = topic

    def read(self, starting_offsets: str = "earliest") -> DataFrame:
        """Batch scan from beginning (kafka-console-consumer --from-beginning)."""
        return (
            self.spark.read.format("kafka")
            .option("kafka.bootstrap.servers", self.servers)
            .option("subscribe", self.topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )

    def read_stream(self, starting_offsets: str = "earliest",
                    max_offsets_per_trigger: int | None = None) -> DataFrame:
        """Continuous subscribe; checkpoint dir ≈ consumer group (T6)."""
        r = (
            self.spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.servers)
            .option("subscribe", self.topic)
            .option("startingOffsets", starting_offsets)
        )
        if max_offsets_per_trigger:  # backpressure (T7, normcat -r analog)
            r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        return r.load()

    def writer(self, df: DataFrame):
        """Keyed write: broker hash-partitions by the ``key`` column (K1)."""
        return (
            df.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", self.servers)
            .option("topic", self.topic)
        )

    def write(self, df: DataFrame) -> None:
        """Batch produce (put.sh's bulk-load analog): df must carry binary
        ``key``/``value`` columns; the broker hash-partitions by key."""
        (
            df.write.format("kafka")
            .option("kafka.bootstrap.servers", self.servers)
            .option("topic", self.topic)
            .save()
        )


class FileTopic:
    """Parquet-dir topic with Kafka record semantics, for broker-less runs.

    Layout: ``<root>/<name>/`` parquet files with TOPIC_COLUMNS. Offsets are
    per-partition monotonic; appends compute the next offset from current
    per-partition maxima (driver-side metadata read, cheap).
    """

    #: per-topic compression (variables.env:10 analog) → parquet codecs
    CODECS = {"uncompressed": "uncompressed", "lz4": "lz4", "gzip": "gzip",
              "snappy": "snappy", "zstd": "zstd"}

    def __init__(self, spark: SparkSession, root: str, name: str, partitions: int = 4,
                 compression: str = "snappy"):
        self.spark = spark
        self.name = name
        self.partitions = partitions
        self.compression = self.CODECS[compression]
        self.path = os.path.join(root, name)

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def append(self, records: DataFrame, key_col: str = "key", value_col: str = "value") -> None:
        """Append keyed records, assigning partition + offset.

        Partition = pmod(xxhash64(key), n) (Kafka default-partitioner
        analog); null keys round-robin via spark_partition_id.
        """
        n = self.partitions
        base = records.select(
            F.col(key_col).cast("binary").alias("key"),
            F.col(value_col).cast("binary").alias("value"),
            F.lit(self.name).alias("topic"),
            F.when(
                F.col(key_col).isNotNull(), F.pmod(F.xxhash64(F.col(key_col)), n)
            )
            .otherwise(F.pmod(F.spark_partition_id(), n))
            .cast("int")
            .alias("partition"),
            F.current_timestamp().alias("timestamp"),
        )
        if self.exists():
            maxima = (
                self.spark.read.parquet(self.path)
                .groupBy("partition")
                .agg(F.max("offset").alias("base_offset"))
            )
        else:
            maxima = None
        w = F.row_number().over(
            Window.partitionBy("partition").orderBy(F.monotonically_increasing_id())
        )
        with_off = base.withColumn("rn", w)
        if maxima is not None:
            with_off = with_off.join(F.broadcast(maxima), "partition", "left").withColumn(
                "offset", F.coalesce(F.col("base_offset"), F.lit(-1)) + F.col("rn")
            ).drop("base_offset")
        else:
            with_off = with_off.withColumn("offset", F.col("rn") - 1)
        out = with_off.select(*TOPIC_COLUMNS)
        out.write.mode("append").option("compression", self.compression).parquet(self.path)

    def read(self) -> DataFrame:
        """Batch scan (S1)."""
        return self.spark.read.parquet(self.path).select(*TOPIC_COLUMNS)

    def read_stream(self, schema=None) -> DataFrame:
        """Streaming scan over the growing directory (S2 analog)."""
        from pyspark.sql.types import (
            BinaryType, IntegerType, LongType, StringType, StructField,
            StructType, TimestampType,
        )

        sch = schema or StructType(
            [
                StructField("key", BinaryType()),
                StructField("value", BinaryType()),
                StructField("topic", StringType()),
                StructField("partition", IntegerType()),
                StructField("offset", LongType()),
                StructField("timestamp", TimestampType()),
            ]
        )
        return self.spark.readStream.schema(sch).parquet(self.path)

    def compacted(self, tombstones: bool = True) -> DataFrame:
        """The cleanup.policy=compact view: latest value per key (A5/J1).

        ``tombstones=True`` applies Kafka's delete semantics: a record with
        a null value marks its key deleted, so keys whose LATEST record is
        a tombstone drop out of the view (broker log-compaction behavior;
        the compact policy ships on telecom_italia_grid,
        ``sample-data/variables.env:6``). The filter runs after the arg-max
        aggregate — still one shuffle.
        """
        view = latest_by_key(self.read(), ["key"])
        if tombstones:
            view = view.filter(F.col("value").isNotNull())
        return view

    def delete(self) -> None:
        """Topic delete (kafka-tests.yml:33-34; delete.topic.enable analog)."""
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)


def list_topics(root: str) -> list[str]:
    """Topic listing (kafka-tests.yml:30-32 analog)."""
    if not os.path.isdir(root):
        return []
    return sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )


def reset_application(checkpoint_dir: str) -> None:
    """Streams-app reset: wipe a query's checkpoint so the next start
    replays from the beginning (binaries/kafka-streams-application-reset
    analog; consumer-group delete kafka-tests.yml:61-63)."""
    import shutil

    shutil.rmtree(checkpoint_dir, ignore_errors=True)
