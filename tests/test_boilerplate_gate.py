"""Streaming boilerplate gate: batch-trained template set applied as a
map-only streaming transformation, bit-identical to the batch operator.
"""

import pyspark.sql.functions as F

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.dedup import (
    boilerplate_chunk_set,
    strip_boilerplate_chunks,
)
from kafka_stream_spark.streaming.boilerplate_gate import boilerplate_gate


def test_gate_matches_batch_operator(spark, sf_dir, tmp_path):
    (documents,) = load(spark, sf_dir, "documents")
    boiler = [r.chunk_text for r in boilerplate_chunk_set(documents).collect()]
    assert boiler, "corpus should carry boilerplate chunks"

    src = str(tmp_path / "src")
    documents.write.parquet(src)
    stream = spark.readStream.schema(documents.schema).parquet(src)
    q = (
        boilerplate_gate(stream, boiler)
        .writeStream.format("memory")
        .queryName("bp_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        r.doc_id: (r.n_total, r.n_removed, r.new_text)
        for r in spark.sql("SELECT * FROM bp_gate").collect()
    }
    batch = {
        r.doc_id: (r.n_total, r.n_removed, r.new_text)
        for r in strip_boilerplate_chunks(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_gate_is_stateless_map(spark, sf_dir):
    # batch application works on the same frame (no streaming machinery
    # required) and the plan carries no exchange at all
    (documents,) = load(spark, sf_dir, "documents")
    boiler = [r.chunk_text for r in boilerplate_chunk_set(documents).collect()]
    out = boilerplate_gate(documents, boiler)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    row = out.filter(F.col("n_removed") > 0).first()
    assert row is not None and row.n_total > row.n_removed