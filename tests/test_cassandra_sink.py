"""Cassandra sink shape tests: JVM-side CQL literal rendering (escaping,
types, TTL), single-partition UNLOGGED BATCH grouping, and streaming
delivery through the pluggable transport."""

import glob
import re

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_stream_spark.streaming.cassandra import (
    batch_statements,
    cassandra_sink,
    file_cql_transport,
    render_inserts,
)

SCHEMA = StructType(
    [
        StructField("sensor_id", LongType()),
        StructField("reading", DoubleType()),
        StructField("note", StringType()),
    ]
)


def test_render_inserts_literals_and_escaping(spark):
    df = spark.createDataFrame([(7, 1.5, "it's fine")], SCHEMA)
    row = render_inserts(df, "iot", "readings", ["sensor_id"]).collect()[0]
    assert row.partition_key == "7"
    assert row.cql == (
        "INSERT INTO iot.readings (sensor_id, reading, note) "
        "VALUES (7, 1.5, 'it''s fine');"
    )


def test_render_inserts_ttl_and_timestamp(spark):
    df = spark.createDataFrame([(1, 2.0, "x")], SCHEMA)
    row = render_inserts(df, "ks", "t", ["sensor_id"], ttl=3600).collect()[0]
    assert row.cql.endswith(") USING TTL 3600;")
    import datetime
    tdf = spark.createDataFrame(
        [(1, datetime.datetime(2026, 3, 1, 12, 30, 0))], "k long, ts timestamp"
    )
    row = render_inserts(tdf, "ks", "t", ["k"]).collect()[0]
    assert "'2026-03-01T12:30:00.000+0000'" in row.cql


def test_render_timestamp_instant_survives_session_tz(spark):
    # the rendered literal must name the INSTANT (UTC + explicit zone),
    # not the session wall-clock — the Mongo $date bug class
    import datetime

    tdf = spark.createDataFrame(
        [(1, datetime.datetime(2026, 3, 1, 12, 30, 0,
                               tzinfo=datetime.timezone.utc))],
        "k long, ts timestamp",
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        row = render_inserts(tdf, "ks", "t", ["k"]).collect()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert "'2026-03-01T12:30:00.000+0000'" in row.cql


def test_render_inserts_rejects_unknown_pk(spark):
    df = spark.createDataFrame([(1, 2.0, "x")], SCHEMA)
    try:
        render_inserts(df, "ks", "t", ["nope"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "nope" in str(e)


def test_batch_statements_grouping():
    stmts = [f"INSERT {i};" for i in range(5)]
    batches = batch_statements(stmts, max_batch=2)
    assert len(batches) == 3
    assert batches[0].startswith("BEGIN UNLOGGED BATCH\n")
    assert batches[0].endswith("\nAPPLY BATCH;")
    # a lone trailing statement is sent bare, not wrapped
    assert batches[2] == "INSERT 4;"


def test_cassandra_sink_streams_single_partition_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # 40 rows over 4 sensors -> 10 statements per Cassandra partition
    spark.createDataFrame(
        [(i % 4, float(i), f"n{i}") for i in range(40)], SCHEMA
    ).write.parquet(src)
    out = str(tmp_path / "cql_out")
    q = (
        cassandra_sink(
            spark.readStream.schema(SCHEMA).parquet(src),
            keyspace="iot",
            table="readings",
            pk_cols=["sensor_id"],
            transport=file_cql_transport(out),
            checkpoint=str(tmp_path / "ckpt"),
            max_batch=4,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)

    seen = set()
    for path in glob.glob(f"{out}/batch-*.cql"):
        body = open(path, encoding="utf-8").read()
        inserts = re.findall(r"INSERT INTO iot\.readings [^;]+;", body)
        assert 1 <= len(inserts) <= 4  # max_batch honored
        # single-partition batches: every statement shares one sensor_id
        pks = {re.search(r"VALUES \((\d+),", s).group(1) for s in inserts}
        assert len(pks) == 1, body
        for s in inserts:
            seen.add(re.search(r"VALUES \(\d+, (\d+\.\d+),", s).group(1))
    assert seen == {f"{float(i)}" for i in range(40)}  # exactly-once delivery
