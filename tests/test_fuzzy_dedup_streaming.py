"""Streaming fuzzy dedup: exact and near duplicates drop, distinct docs pass."""

import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_stream_spark.streaming.fuzzy_dedup import (
    _minhash_bands,
    streaming_fuzzy_dedup,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("text", StringType()),
    ]
)

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the river bank tonight"
OTHER = "completely different words about spark structured streaming state stores and shuffles"


def test_band_signature_properties():
    assert _minhash_bands(BASE) == _minhash_bands(BASE)  # deterministic
    shared = set(_minhash_bands(BASE)) & set(_minhash_bands(NEAR))
    assert shared  # near-dup texts collide on at least one band
    assert not set(_minhash_bands(BASE)) & set(_minhash_bands(OTHER))


def test_streaming_fuzzy_dedup_drops_dupes(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", BASE),
        (2, "2024-01-01 00:01:00", BASE),   # exact dup → drop
        (3, "2024-01-01 00:02:00", NEAR),   # near dup → drop (band collision)
        (4, "2024-01-01 00:03:00", OTHER),  # distinct → keep
    ]
    df = spark.createDataFrame(rows, ["doc_id", "ts_s", "text"]).select(
        "doc_id", F.to_timestamp("ts_s").alias("ts"), "text"
    )
    path = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(SCHEMA).parquet(path)
    out = streaming_fuzzy_dedup(stream, "text", "doc_id", "ts")
    q = (
        out.writeStream.format("memory").queryName("fuzzy")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    kept = {r.doc_id for r in spark.sql("SELECT * FROM fuzzy").collect()}
    assert kept == {1, 4}
