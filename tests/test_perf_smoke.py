"""Perf smoke mirroring the reference's producer floor
(integration-tests/kafka-tests.yml:14-18: 500,000 × 1,000-byte records in
≤ 90 s ⇒ ≥ 5,556 rec/s). Scaled to 100k records to keep the suite fast —
the asserted RATE floor is the same.

Also covers the topic admin lifecycle (create → list → act → delete,
kafka-tests.yml:8-34) and app reset (checkpoint wipe → replay).
"""

import time

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_stream_spark.sources.topics import FileTopic, list_topics, reset_application

FLOOR_RECS_PER_SEC = 5556
N_RECORDS = 100_000


def test_producer_throughput_floor(spark, tmp_path):
    t = FileTopic(spark, str(tmp_path), "perf_smoke", partitions=1)
    # 1000-byte values, like the reference's random payload
    records = spark.range(N_RECORDS).select(
        F.col("id").cast("string").alias("key"),
        F.rpad(F.col("id").cast("string"), 1000, "x").alias("value"),
    )
    t0 = time.time()
    t.append(records)
    elapsed = time.time() - t0
    rate = N_RECORDS / elapsed
    assert rate >= FLOOR_RECS_PER_SEC, f"{rate:.0f} rec/s below reference floor"
    assert t.read().count() == N_RECORDS


def test_topic_lifecycle(spark, tmp_path):
    root = str(tmp_path)
    a = FileTopic(spark, root, "coyote_a", partitions=2)
    b = FileTopic(spark, root, "coyote_b", partitions=1)
    a.append(spark.createDataFrame([("k", "v")], ["key", "value"]))
    b.append(spark.createDataFrame([("k", "v")], ["key", "value"]))
    assert list_topics(root) == ["coyote_a", "coyote_b"]
    a.delete()
    assert list_topics(root) == ["coyote_b"]
    assert not a.exists()


def test_application_reset_replays(spark, tmp_path):
    schema = StructType([StructField("k", StringType()), StructField("v", LongType())])
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.createDataFrame([("a", 1)], schema).write.parquet(src)

    def drain(dst):
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.format("parquet").option("path", dst)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(60)

    drain(out)
    assert spark.read.parquet(out).count() == 1
    # reset ⇒ the same query replays everything into a fresh sink
    reset_application(ckpt)
    out2 = str(tmp_path / "out2")
    drain(out2)
    assert spark.read.parquet(out2).count() == 1  # replayed from offset 0


def test_bloom_gate_throughput_floor(spark, tmp_path):
    """The streaming Bloom admission gate must sustain the reference's
    replay floor (≥ 5,000 rec/s, kafka-tests.yml replay shape) — the
    dedup gate cannot be the ingest bottleneck. 50k records through the
    full sharded stateful pipeline, wall-clocked end to end."""
    from kafka_stream_spark.streaming.bloom_gate import streaming_bloom_dedup

    n = 50_000
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("body", StringType())]
    )
    src = str(tmp_path / "src")
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.rpad(F.col("id").cast("string"), 200, "y").alias("body"),
    ).write.parquet(src)
    out = str(tmp_path / "out")
    t0 = time.time()
    q = (
        streaming_bloom_dedup(spark.readStream.schema(schema).parquet(src), "doc_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    elapsed = time.time() - t0
    rate = n / elapsed
    assert rate >= 5000, f"{rate:.0f} rec/s below reference replay floor"
    assert spark.read.parquet(out).count() == n
