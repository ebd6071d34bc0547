"""Streaming DQ gate: constraint routing, violation tagging, audit counts."""

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_stream_spark.streaming.dq_gate import apply_dq_gate, violation_counts

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("amount", DoubleType()),
        StructField("status", StringType()),
    ]
)

ROWS = [
    (1, 10.0, "ok"),
    (2, -5.0, "ok"),          # negative amount
    (3, 10.0, "bogus"),       # bad status
    (4, -1.0, "bogus"),       # both
    (5, None, "ok"),          # null amount
]


def _constraints():
    return [
        ("amount_nonnegative", F.col("amount") >= 0),
        ("status_known", F.col("status").isin("ok", "pending")),
        ("amount_present", F.col("amount").isNotNull()),
    ]


def test_gate_routes_batch(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    valid, quar = apply_dq_gate(df, _constraints())
    assert {r.id for r in valid.collect()} == {1}
    got = {r.id: sorted(r.violations) for r in quar.collect()}
    assert got == {
        2: ["amount_nonnegative"],
        3: ["status_known"],
        4: ["amount_nonnegative", "status_known"],
        # SQL CHECK semantics: NULL >= 0 is UNKNOWN, not a violation —
        # nullability is its own constraint (amount_present)
        5: ["amount_present"],
    }
    counts = {r.constraint: r.n_violations for r in violation_counts(quar).collect()}
    assert counts == {
        "amount_nonnegative": 2,
        "status_known": 2,
        "amount_present": 1,
    }


def test_gate_routes_streaming(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    valid, quar = apply_dq_gate(stream, _constraints())
    q1 = (
        valid.writeStream.format("memory").queryName("dq_valid")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2 = (
        quar.writeStream.format("memory").queryName("dq_quar")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q1.awaitTermination(60)
    q2.awaitTermination(60)
    assert {r.id for r in spark.sql("SELECT * FROM dq_valid").collect()} == {1}
    quar_rows = spark.sql("SELECT * FROM dq_quar").collect()
    assert {r.id for r in quar_rows} == {2, 3, 4, 5}
    assert all(len(r.violations) > 0 for r in quar_rows)
