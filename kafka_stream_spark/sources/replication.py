"""Topic replication & export (SURVEY.md §2.1 S10/S11).

- ``mirror``: topic → topic replication (kafka-mirror-maker analog,
  ``binaries/kafka-mirror-maker``): streaming read of the source topic,
  append to the destination preserving key/value; offsets are re-assigned
  by the destination (exactly what MirrorMaker does — offsets are not
  preserved across clusters).
- ``export_parquet``: scheduled topic → files dump (camus analog,
  ``binaries/camus-run``): ``trigger(availableNow=True)`` drains whatever
  is in the topic and lands it as parquet partitioned by topic partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from kafka_stream_spark.sources.topics import FileTopic


def mirror(src: FileTopic, dst: FileTopic, checkpoint: str) -> StreamingQuery:
    """Continuously replicate src → dst (S10). Each micro-batch appends the
    new records through the destination's keyed-append path."""

    def copy_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dst.append(
            batch_df.select(
                F.col("key").cast("string").alias("key"),
                F.col("value").cast("string").alias("value"),
            )
        )

    return (
        src.read_stream()
        .writeStream.foreachBatch(copy_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def export_parquet(src: FileTopic, out_path: str, checkpoint: str) -> StreamingQuery:
    """Drain the topic to parquet files partitioned by topic partition (S11)."""
    return (
        src.read_stream()
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("partition")
        .trigger(availableNow=True)
        .start()
    )


def export_ocf(src: FileTopic, out_dir: str, checkpoint: str) -> StreamingQuery:
    """Drain the topic to wire-true Avro Object Container Files — the
    format Camus actually wrote (S11). Each micro-batch lands under
    ``<out_dir>/batch-<id>/partition-<p>.avro``; a replayed batch id
    overwrites its own directory, so the sink is idempotent under
    checkpoint recovery (T5)."""
    import os

    from kafka_stream_spark.functions.avro_ocf import (
        TOPIC_EXPORT_SCHEMA, export_topic_ocf)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        export_topic_ocf(
            batch_df, TOPIC_EXPORT_SCHEMA,
            os.path.join(out_dir, f"batch-{batch_id}"),
        )

    return (
        src.read_stream()
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def export_segments(src: FileTopic, out_dir: str, checkpoint: str) -> StreamingQuery:
    """Drain the topic to wire-true Kafka log segments (magic-v2 record
    batches, CRC-32C) — the broker's own on-disk format, so downstream
    tooling that reads a data dir (kafka-dump-log, tiered-storage
    readers) consumes the drain unchanged. Batch-id-keyed directories
    keep the sink idempotent under checkpoint recovery (T5), same as
    :func:`export_ocf`."""
    import os

    from kafka_stream_spark.sources.kafka_segment import export_topic_segments

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        export_topic_segments(
            batch_df, os.path.join(out_dir, f"batch-{batch_id}")
        )

    return (
        src.read_stream()
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
