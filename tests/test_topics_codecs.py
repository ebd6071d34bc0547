"""Round-trip tests: topic semantics + Confluent framing + JSON codec.

Mirrors the reference's round-trip assertion style (SURVEY.md §5:
produce X, consume, expect X — kafka-tests.yml:52-57) and the binary
fixture ``S2Fma2E=`` ("Kafka") from kafka-tests.yml:95-113.
"""

import json

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from kafka_stream_spark.functions import confluent
from kafka_stream_spark.sources.topics import FileTopic, latest_by_key


def test_confluent_frame_roundtrip(spark):
    df = spark.createDataFrame([("hello",), ("Kafka",)], ["s"]).select(
        F.col("s").cast("binary").alias("body")
    )
    framed = df.select(confluent.frame(1042, F.col("body")).alias("value"), "body")
    out = framed.select(
        confluent.unframe_schema_id(F.col("value")).alias("sid"),
        confluent.unframe_body(F.col("value")).alias("body2"),
        confluent.check_magic(F.col("value")).alias("magic"),
        "body",
    ).collect()
    for r in out:
        assert r.sid == 1042
        assert r.magic is True
        assert bytes(r.body2) == bytes(r.body)


def test_base64_binary_roundtrip(spark):
    # kafka-tests.yml:95-113: base64 'S2Fma2E=' == b"Kafka"
    row = spark.sql("SELECT base64(cast('Kafka' as binary)) b, unbase64('S2Fma2E=') v").first()
    assert row.b == "S2Fma2E="
    assert bytes(row.v) == b"Kafka"


def test_json_value_roundtrip(spark):
    # kafka-tests.yml:67-85: {"foo":"bar"} round trip
    schema = StructType([StructField("foo", StringType())])
    df = spark.createDataFrame([(json.dumps({"foo": "bar"}).encode(),)], ["value"])
    out = df.select(confluent.decode_json_value(F.col("value"), schema).alias("v")).first()
    assert out.v.foo == "bar"


def test_file_topic_append_read_offsets(spark, tmp_path):
    t = FileTopic(spark, str(tmp_path), "t1", partitions=3)
    recs = spark.createDataFrame(
        [(f"k{i % 5}", f"v{i}") for i in range(20)], ["key", "value"]
    )
    t.append(recs)
    df = t.read()
    assert df.count() == 20
    # per-partition offsets are dense 0..n-1
    per_part = df.groupBy("partition").agg(
        F.min("offset").alias("lo"), F.max("offset").alias("hi"), F.count("*").alias("n")
    ).collect()
    for r in per_part:
        assert r.lo == 0 and r.hi == r.n - 1
    # same key always lands in the same partition (Kafka partitioner contract)
    kp = df.select(F.col("key").cast("string").alias("k"), "partition").distinct()
    assert kp.groupBy("k").count().filter("count > 1").count() == 0


def test_file_topic_second_append_continues_offsets(spark, tmp_path):
    t = FileTopic(spark, str(tmp_path), "t2", partitions=2)
    batch = spark.createDataFrame([("a", "1"), ("b", "2")], ["key", "value"])
    t.append(batch)
    t.append(batch)
    df = t.read()
    assert df.count() == 4
    # offsets within each partition are unique and dense
    for r in df.groupBy("partition").agg(
        F.countDistinct("offset").alias("d"), F.count("*").alias("n"),
        F.max("offset").alias("hi"),
    ).collect():
        assert r.d == r.n and r.hi == r.n - 1


def test_compacted_view_keeps_latest(spark, tmp_path):
    # compaction fixture per FIXTURES.md §6: duplicate keys at increasing
    # offsets → latest-by-key keeps the max-offset row
    t = FileTopic(spark, str(tmp_path), "grid", partitions=1)
    t.append(spark.createDataFrame([("sq1", "old"), ("sq2", "keep")], ["key", "value"]))
    t.append(spark.createDataFrame([("sq1", "new")], ["key", "value"]))
    comp = t.compacted()
    got = {
        bytes(r.key).decode(): bytes(r.value).decode() for r in comp.collect()
    }
    assert got == {"sq1": "new", "sq2": "keep"}


def test_compacted_view_honors_tombstones(spark, tmp_path):
    # Kafka log compaction: latest record with null value deletes the key
    t = FileTopic(spark, str(tmp_path), "grid_t", partitions=1)
    t.append(spark.createDataFrame([("sq1", "v1"), ("sq2", "v2")], ["key", "value"]))
    t.append(
        spark.createDataFrame(
            [("sq1", None), ("sq3", "v3")], "key string, value string"
        )
    )
    got = {
        bytes(r.key).decode(): bytes(r.value).decode()
        for r in t.compacted().collect()
    }
    assert got == {"sq2": "v2", "sq3": "v3"}  # sq1 deleted
    # tombstones=False keeps the raw latest-by-key view (tombstone visible)
    raw = {bytes(r.key).decode(): r.value for r in t.compacted(tombstones=False).collect()}
    assert raw["sq1"] is None and set(raw) == {"sq1", "sq2", "sq3"}
    # a re-append after the tombstone resurrects the key
    t.append(spark.createDataFrame([("sq1", "v1b")], ["key", "value"]))
    got2 = {
        bytes(r.key).decode(): bytes(r.value).decode()
        for r in t.compacted().collect()
    }
    assert got2["sq1"] == "v1b"


def test_latest_by_key_generic(spark):
    df = spark.createDataFrame(
        [("a", 0, "x"), ("a", 5, "y"), ("b", 1, "z")], ["key", "offset", "value"]
    )
    out = {r.key: r.value for r in latest_by_key(df, ["key"]).collect()}
    assert out == {"a": "y", "b": "z"}
