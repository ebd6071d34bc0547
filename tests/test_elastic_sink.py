"""Elasticsearch sink shape tests (SURVEY.md §2.2 K3): bulk-NDJSON
rendering, streaming delivery through the pluggable transport, and the
reference's "lat,lon" geo-point prep (classAPositionReportSchema.json:42-46)."""

import glob
import json

import pyspark.sql.functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from kafka_stream_spark.streaming.elastic import (
    bulk_actions,
    elastic_sink,
    file_bulk_transport,
    with_es_location,
)

SCHEMA = StructType(
    [
        StructField("mmsi", LongType()),
        StructField("speed", DoubleType()),
        StructField("status", StringType()),
    ]
)


def test_bulk_actions_shape(spark):
    df = spark.createDataFrame([(244660180, 0.1, "sailing")], SCHEMA)
    lines = bulk_actions(df, "ais", "mmsi").collect()[0]["_action"].split("\n")
    action, doc = json.loads(lines[0]), json.loads(lines[1])
    assert action == {"index": {"_id": "244660180", "_index": "ais"}}
    assert doc == {"mmsi": 244660180, "speed": 0.1, "status": "sailing"}


def test_elastic_sink_streams_bulk_payloads(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, float(i), "s") for i in range(50)], SCHEMA
    ).write.parquet(src)
    out = str(tmp_path / "bulk_out")
    q = (
        elastic_sink(
            spark.readStream.schema(SCHEMA).parquet(src),
            index="ais",
            transport=file_bulk_transport(out),
            id_col="mmsi",
            max_docs_per_call=16,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)

    ids = set()
    for path in glob.glob(f"{out}/bulk-*.ndjson"):
        lines = open(path, encoding="utf-8").read().strip().split("\n")
        assert len(lines) % 2 == 0  # action/doc pairs
        for i in range(0, len(lines), 2):
            a, d = json.loads(lines[i]), json.loads(lines[i + 1])
            assert a["index"]["_index"] == "ais"
            ids.add(int(a["index"]["_id"]))
            assert d["mmsi"] == int(a["index"]["_id"])
        assert len(lines) // 2 <= 16  # max_docs_per_call honored
    assert ids == set(range(50))  # every record delivered exactly once


def test_with_es_location(spark):
    df = spark.createDataFrame([(52.5, 4.9)], ["lat", "lon"])
    row = with_es_location(df, "lat", "lon").collect()[0]
    assert row.location == "52.5,4.9"
