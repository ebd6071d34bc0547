"""End-to-end streaming curation: quality gate + fingerprint dedup within
watermark + per-batch decontamination + parquet sink."""

import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_stream_spark.streaming.curation import (
    benchmark_grams,
    contaminated_ids,
    streaming_curation,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("text", StringType()),
    ]
)

GOOD = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
       "lam mu nu xi omicron pi rho sigma tau upsilon"
GOOD2 = "one two three four five six seven eight nine ten " \
        "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
SHORT = "too short"
REPETITIVE = " ".join(["spam"] * 25)
BENCH_TEXT = "held out benchmark document with very specific evaluation phrasing " \
             "that training data must never contain verbatim at all ever once"


def _bench(spark):
    docs = spark.createDataFrame(
        [(900, BENCH_TEXT, "src0")], ["doc_id", "text", "source"]
    )
    return benchmark_grams(docs, "src0")


def test_contaminated_ids_flags_verbatim_copy(spark):
    batch = spark.createDataFrame(
        [(1, GOOD), (2, BENCH_TEXT)], ["doc_id", "text"]
    )
    bad = {r.doc_id for r in contaminated_ids(batch, _bench(spark)).collect()}
    assert bad == {2}


def test_streaming_curation_end_to_end(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", GOOD),        # keep
        (2, "2024-01-01 00:01:00", GOOD),        # exact dup → dedup drops
        (3, "2024-01-01 00:02:00", SHORT),       # quality gate drops
        (4, "2024-01-01 00:03:00", REPETITIVE),  # diversity gate drops
        (5, "2024-01-01 00:04:00", BENCH_TEXT),  # contamination drops
        (6, "2024-01-01 00:05:00", GOOD2),       # keep
    ]
    df = spark.createDataFrame(rows, ["doc_id", "ts_s", "text"]).select(
        "doc_id", F.to_timestamp("ts_s").alias("ts"), "text"
    )
    src = str(tmp_path / "in")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out_dir = str(tmp_path / "out")
    q = streaming_curation(
        stream,
        _bench(spark),
        out_dir,
        str(tmp_path / "ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    kept = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert kept == {1, 6}
    # audit columns survive the pipeline
    cols = set(spark.read.parquet(out_dir).columns)
    assert {"doc_id", "ts", "text", "n_tokens", "distinct_ratio", "fp"} <= cols


def test_classifier_gate_matches_batch_scorer(spark, tmp_path):
    """The streaming classifier gate must score EXACTLY like the batch
    quality_classifier_score query (they share the expression)."""
    import pyspark.sql.functions as F

    from kafka_stream_spark.operators._common import load
    from kafka_stream_spark.registry import load_all
    from kafka_stream_spark.streaming.curation import classifier_gate

    sf = "/root/testdata/sf0.001"
    batch = load_all()["quality_classifier_score"].build(spark, sf)
    expected = {r.doc_id: r.score_u for r in batch.collect()}

    (documents,) = load(spark, sf, "documents")
    src = str(tmp_path / "docs")
    documents.select("doc_id", "text").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        classifier_gate(stream, min_score=-10**9)
        .select("doc_id", "quality_score_u")
        .writeStream.format("memory").queryName("clf_gate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r.quality_score_u
           for r in spark.sql("SELECT * FROM clf_gate").collect()}
    assert got == expected
    # and a real threshold actually filters
    assert sum(1 for v in got.values() if v > 0) < len(got)
