"""Real-broker integration (env-gated): produce→broker→consume round
trips through Spark's Kafka source/sink, mirroring the reference's core
loop (sample-data/put.sh:23-32, kafka-tests.yml:44-57).

No broker or spark-sql-kafka jar exists in the build sandbox, so these
tests SKIP unless ``KAFKA_BOOTSTRAP`` is set (e.g.
``KAFKA_BOOTSTRAP=localhost:9092``; the spark-sql-kafka package must be
on the session classpath). With a broker they exercise:

- keyed binary produce/consume with metadata columns (S1/K1),
- the Confluent-framed Avro path over all six reference schemas,
  engine-encoded and engine-decoded through real broker bytes (S3),
- schemaless-JSON values (backblaze_smart shape, put.sh:46-55),
- compacted-table materialization (latest_by_key) on broker offsets.

FileTopic parity suites cover the same semantics broker-lessly; this
file is the standing hook for environments that do ship a broker.
"""

from __future__ import annotations

import json
import os
import uuid

import pyspark.sql.functions as F
import pytest

from kafka_stream_spark import fixtures
from kafka_stream_spark.functions import avro_codec, confluent
from kafka_stream_spark.functions.avro_schema import to_avro_json
from kafka_stream_spark.sources.topics import KafkaTopic, latest_by_key

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set KAFKA_BOOTSTRAP=<host:port> (with spark-sql-kafka on the "
    "classpath) to run real-broker integration",
)


def _topic(name: str) -> str:
    return f"coyote-{name}-{uuid.uuid4().hex[:8]}"  # kafka-tests.yml %UNIQUE%


def test_keyed_binary_roundtrip_with_metadata(spark):
    t = KafkaTopic(spark, BOOTSTRAP, _topic("bin"))
    src = spark.createDataFrame(
        [(f"k{i % 3}", f"v{i}") for i in range(20)], ["k", "v"]
    ).select(
        F.col("k").cast("binary").alias("key"),
        F.col("v").cast("binary").alias("value"),
    )
    t.write(src)
    got = t.read().select(
        F.col("key").cast("string").alias("k"),
        F.col("value").cast("string").alias("v"),
        "partition",
        "offset",
    )
    rows = got.collect()
    assert sorted(r.v for r in rows) == sorted(f"v{i}" for i in range(20))
    # same key → same partition (the broker's hash partitioner)
    kp = got.select("k", "partition").distinct()
    assert kp.groupBy("k").count().filter("count > 1").count() == 0


SCHEMA_DATASETS = {
    # the six reference schemas (SURVEY.md §1.3), keyed like put.sh
    "sea_vessel_position_reports": (
        fixtures.AIS_KEY, fixtures.AIS_VALUE,
        lambda spark: fixtures.generate_ais(spark, 25),
        lambda spark: fixtures.generate_ais(spark, 25).select("MMSI"),
    ),
    "telecom_italia_data": (
        fixtures.TELECOM_KEY, fixtures.TELECOM_VALUE,
        lambda spark: fixtures.generate_telecom(spark, 25),
        lambda spark: fixtures.generate_telecom(spark, 25).select("SquareId"),
    ),
    "telecom_italia_grid": (
        fixtures.TELECOM_KEY, fixtures.GRID_VALUE,
        lambda spark: fixtures.generate_grid(spark, 25),
        lambda spark: fixtures.generate_grid(spark, 25).select("SquareId"),
    ),
    "reddit_posts": (
        fixtures.REDDIT_KEY, fixtures.REDDIT_VALUE, None, None,
    ),
    "nyc_yellow_taxi_trip_data": (
        None, fixtures.TAXI_VALUE, None, None,
    ),
    "backblaze_smart": (
        fixtures.SMART_KEY, fixtures.SMART_VALUE, None, None,
    ),
}


def _sample_rows(spark, name, value_schema):
    """Deterministic small frames for the datasets without generators."""
    if name == "reddit_posts":
        data = [
            {f.name: None for f in value_schema.fields} | {
                "id": f"t3_{i}", "subreddit": "kafka", "created_utc": 1435000000 + i,
                "body": f"コメント {i} ⚽", "score": i, "gilded": 0,
            }
            for i in range(10)
        ]
    elif name == "nyc_yellow_taxi_trip_data":
        data = [
            {f.name: None for f in value_schema.fields} | {
                "VendorID": 1 + i % 2,
                "tpep_pickup_datetime": f"2016-01-01 00:0{i}:00",
                "tpep_dropoff_datetime": f"2016-01-01 00:1{i}:00",
                "passenger_count": 1, "trip_distance": 1.5 + i,
                "fare_amount": 5.0 + i, "total_amount": 6.3 + i,
            }
            for i in range(10)
        ]
    else:  # backblaze_smart
        data = [
            {f.name: None for f in value_schema.fields} | {
                "serial_number": f"Z30{i}", "model": "ST4000DM000",
                "capacity_bytes": 4000787030016, "failure": 0,
            }
            for i in range(10)
        ]
    rows = [tuple(d.get(f.name) for f in value_schema.fields) for d in data]
    return spark.createDataFrame(rows, value_schema)


@pytest.mark.parametrize("name", sorted(SCHEMA_DATASETS))
def test_confluent_framed_avro_roundtrip_through_broker(spark, name):
    key_schema, value_schema, gen, _keygen = SCHEMA_DATASETS[name]
    src = gen(spark) if gen else _sample_rows(spark, name, value_schema)
    avro = json.loads(to_avro_json(value_schema, name=name))
    framed = avro_codec.encode_df(src, avro, schema_id=7)
    t = KafkaTopic(spark, BOOTSTRAP, _topic(name))
    t.write(framed.select(F.col("value")))
    raw = t.read()
    sid = raw.select(confluent.unframe_schema_id("value").alias("s")).distinct()
    assert [r.s for r in sid.collect()] == [7]
    back = avro_codec.decode_df(raw, avro, value_schema)
    assert sorted(map(tuple, back.select(*src.columns).collect())) == sorted(
        map(tuple, src.collect())
    )


def test_schemaless_json_and_compaction(spark):
    # put.sh:46-55 shape: JSON values keyed by serial_number; the compact
    # view keeps the max-offset record per key (variables.env:6 analog)
    t = KafkaTopic(spark, BOOTSTRAP, _topic("smart"))
    rows = [
        ("Z300", json.dumps({"serial_number": "Z300", "failure": v}))
        for v in (0, 0, 1)
    ] + [("Z301", json.dumps({"serial_number": "Z301", "failure": 0}))]
    src = spark.createDataFrame(rows, ["k", "v"]).select(
        F.col("k").cast("binary").alias("key"),
        F.col("v").cast("binary").alias("value"),
    )
    t.write(src)
    latest = latest_by_key(t.read())
    got = {
        bytes(r.key).decode(): json.loads(bytes(r.value).decode())["failure"]
        for r in latest.collect()
    }
    assert got == {"Z300": 1, "Z301": 0}
