"""Streaming IVF index lifecycle: maintain in micro-batches against the
frozen coarse quantizer, search with partition pruning, agree with the
direct (single-shot) search on the same data.
"""

import glob

import pyspark.sql.functions as F

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.similarity import _to_double, kmeans_codebook
from kafka_stream_spark.streaming.ann_index import (
    assign_lists,
    ivf_index_maintainer,
    search_ivf_index,
)


def _vectors(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))


def test_streamed_index_matches_direct_search(spark, sf_dir, tmp_path):
    v = _vectors(spark, sf_dir).cache()
    cent = kmeans_codebook(v)

    # stream the corpus in micro-batches into the partitioned index
    src = str(tmp_path / "src")
    v.repartition(4).write.parquet(src)
    stream = spark.readStream.schema(v.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    idx = str(tmp_path / "index")
    q = (
        ivf_index_maintainer(stream, cent, idx, str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # the index is cid-partitioned on disk and complete
    assert glob.glob(f"{idx}/cid=*"), "index must be partitioned by cid"
    indexed = spark.read.parquet(idx)
    assert indexed.count() == v.count()

    queries = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    got = search_ivf_index(spark, idx, queries, cent).collect()

    # direct single-shot search over the same assignment must agree
    assigned = assign_lists(v, cent)
    direct = _direct_search(spark, assigned, queries, cent)
    assert [(r.query_id, r.vec_id, r.cosine) for r in got] == direct

    # searching again after a REPLAYED batch (duplicate appends) is stable
    assign_lists(v.limit(50), cent).write.mode("append").partitionBy(
        "cid"
    ).parquet(idx)
    again = search_ivf_index(spark, idx, queries, cent).collect()
    assert [(r.query_id, r.vec_id, r.cosine) for r in again] == direct


def _direct_search(spark, assigned, queries, cent):
    from pyspark.sql import Window
    from kafka_stream_spark.operators.similarity import _SQDIST, _cosine_expr

    probe = (
        queries.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "qe", "cid",
            F.round(F.expr(_SQDIST.format(a="qe", b="c")), 6).alias("d2"),
        )
        .withColumn(
            "brank",
            F.row_number().over(Window.partitionBy("query_id").orderBy("d2", "cid")),
        )
        .filter(F.col("brank") <= 3)
        .select("query_id", "qe", "cid")
    )
    scored = (
        assigned.join(F.broadcast(probe), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return [
        (r.query_id, r.vec_id, r.cosine)
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
        .collect()
    ]


def test_search_prunes_unprobed_partitions(spark, sf_dir, tmp_path):
    v = _vectors(spark, sf_dir)
    cent = kmeans_codebook(v)
    idx = str(tmp_path / "index")
    assign_lists(v, cent).write.partitionBy("cid").parquet(idx)
    queries = v.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    out = search_ivf_index(spark, idx, queries, cent, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the cid filter must reach the scan as a partition filter
    assert "PartitionFilters: [cid" in plan.replace("\n", " ") or "cid IN" in plan
    assert out.count() > 0