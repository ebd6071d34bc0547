"""Lenses processor parity: SQL text driving a *streaming* query (§3.3
shape b — continuous INSERT INTO target SELECT ... GROUP BY ...)."""

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def test_sql_text_over_streaming_view(spark, tmp_path):
    rows = [
        ("2024-01-01 00:01:00", 1, "click", 1.0),
        ("2024-01-01 00:02:00", 1, "click", 2.0),
        ("2024-01-01 00:03:00", 2, "view", 3.0),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "user_id", "event_type", "value"]).select(
        F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value"
    )
    path = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(path)

    stream = spark.readStream.schema(SCHEMA).parquet(path)
    stream.createOrReplaceTempView("events_stream")
    # the processor body is pure SQL text — Catalyst plans it as streaming
    processor = spark.sql(
        """
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS sv
        FROM events_stream
        GROUP BY event_type
        """
    )
    assert processor.isStreaming
    q = (
        processor.writeStream.format("memory").queryName("proc_out")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {r.event_type: (r.n, r.sv) for r in spark.sql("SELECT * FROM proc_out").collect()}
    assert got == {"click": (2, 3.0), "view": (1, 3.0)}


def test_permissive_avro_decode(spark):
    """PERMISSIVE mode: corrupt records null out + land in _corrupt_record."""
    import json

    from kafka_stream_spark import fixtures
    from kafka_stream_spark.functions import avro_codec
    from kafka_stream_spark.functions.avro_schema import to_avro_json

    sch = json.loads(to_avro_json(fixtures.TELECOM_KEY, "K"))
    src = spark.createDataFrame([(7,), (8,)], fixtures.TELECOM_KEY)
    framed = avro_codec.encode_df(src, sch, schema_id=1)
    # corrupt one record: truncate its body
    corrupted = framed.withColumn(
        "value",
        F.when(F.col("SquareId") == 8, F.expr("substring(value, 1, 5)")).otherwise(
            F.col("value")
        ),
    )
    out = avro_codec.decode_df(corrupted, sch, fixtures.TELECOM_KEY, mode="PERMISSIVE")
    rows = out.collect()
    ok = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert [r.SquareId for r in ok] == [7]
    assert len(bad) == 1 and bad[0].SquareId is None
