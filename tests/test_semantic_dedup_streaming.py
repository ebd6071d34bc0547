"""Streaming semantic dedup: sign-preserving perturbations drop, distinct
directions pass; signatures match the batch LSH geometry."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_stream_spark.operators.similarity import _b_signs
from kafka_stream_spark.streaming.semantic_dedup import (
    _band_signatures,
    streaming_semantic_dedup,
)

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

_RNG = np.random.RandomState(7)
BASE = _RNG.randn(64)
# tiny perturbation: no hyperplane dot product changes sign -> near-dup
NEAR = BASE + 1e-6 * _RNG.randn(64)
OTHER = -BASE  # every sign flips -> every band value changes


def _sigs(v):
    return _band_signatures(pd.Series([list(v)])).iloc[0]


def test_signatures_deterministic_and_geometry_aware():
    assert _sigs(BASE) == _sigs(BASE)
    assert _sigs(BASE) == _sigs(NEAR)  # all 4 bands collide
    assert not set(_sigs(BASE)) & set(_sigs(OTHER))  # none collide
    # parity with the batch formula: round(dot, 9) > 0 per plane
    planes = np.array(_b_signs(), dtype=np.float64)
    bits = (np.round(planes @ BASE, 9) > 0).astype(int)
    band0 = int(sum(b << i for i, b in enumerate(bits[:6])))
    assert _sigs(BASE)[0] == f"0:{band0}"


def test_streaming_semantic_dedup_drops_near_dupes(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", [float(x) for x in BASE]),
        (2, "2024-01-01 00:01:00", [float(x) for x in BASE]),   # exact → drop
        (3, "2024-01-01 00:02:00", [float(x) for x in NEAR]),   # near → drop
        (4, "2024-01-01 00:03:00", [float(x) for x in OTHER]),  # distinct → keep
    ]
    df = spark.createDataFrame(rows, ["vec_id", "ts_s", "embedding"]).select(
        "vec_id",
        F.to_timestamp("ts_s").alias("ts"),
        F.col("embedding").cast("array<float>"),
    )
    path = str(tmp_path / "vecs")
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(SCHEMA).parquet(path)
    out = streaming_semantic_dedup(stream, "embedding", "vec_id", "ts")
    q = (
        out.writeStream.format("memory").queryName("semdedup_s")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    kept = {r.vec_id for r in spark.sql("SELECT * FROM semdedup_s").collect()}
    assert kept == {1, 4}
