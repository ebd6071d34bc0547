"""Instant-preservation audit for every sink that renders timestamps
into a wire/statement format: under a non-UTC session the rendered
value must still name the same instant (the Mongo $date bug class,
VERDICT r2 ADVICE)."""

import datetime

import pytest
import pyspark.sql.functions as F


@pytest.fixture()
def tz_session(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


INSTANT = datetime.datetime(2026, 3, 1, 12, 30, 0,
                            tzinfo=datetime.timezone.utc)


def _frame(spark):
    return spark.createDataFrame([(1, INSTANT)], "k long, ts timestamp")


def test_kudu_upsert_renders_utc_naive(tz_session):
    from kafka_stream_spark.streaming.kudu import render_row_ops

    row = render_row_ops(_frame(tz_session), "db.t", ["k"],
                         upsert=True).collect()[0]
    assert "'2026-03-01 12:30:00.000'" in row.sql
    assert "+0000" not in row.sql  # Impala literals take no zone suffix


def test_voltdb_exec_renders_utc_naive(tz_session):
    from kafka_stream_spark.streaming.voltdb import render_proc_calls

    row = render_proc_calls(_frame(tz_session), "t", ["k"],
                            upsert=True).collect()[0]
    assert "'2026-03-01 12:30:00.000'" in row.exec_stmt


def test_influx_line_protocol_is_epoch_ns(tz_session):
    from kafka_stream_spark.streaming.influx import line_protocol

    df = _frame(tz_session).withColumn("v", F.lit(1.5))
    row = line_protocol(df, measurement="m", tag_cols=["k"],
                        field_cols=["v"], ts_col="ts").collect()[0]
    # epoch is TZ-free: 2026-03-01T12:30:00Z in nanoseconds
    assert row.line.endswith(str(int(INSTANT.timestamp() * 1_000_000_000)))


def test_to_json_sinks_carry_zone_offset(tz_session):
    # documentdb/rethink/hazelcast/elastic all serialize via to_json,
    # which renders timestamps with an explicit offset — assert the
    # mechanism itself is instant-preserving under the non-UTC session
    out = _frame(tz_session).select(
        F.to_json(F.struct("ts")).alias("j")).collect()[0].j
    assert "2026-03-01T07:30:00.000-05:00" in out
