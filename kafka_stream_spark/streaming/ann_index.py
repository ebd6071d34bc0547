"""Streaming IVF index maintenance + partition-pruned search.

The production ANN lifecycle at corpus scale is train-once /
index-continuously / search-many: a coarse quantizer is trained offline
(``similarity.kmeans_codebook`` — the same artifacts the oracles
freeze), arriving embeddings are assigned to their inverted list as
they stream in, and the index is stored PARTITIONED BY list id so a
query's probe touches nprobe/k of the files via partition pruning —
the datalake rendition of FAISS's inverted lists.

- ``ivf_index_maintainer``: foreachBatch writer — assign each new
  vector to its nearest frozen centroid (broadcast k×dim, 6dp-rounded
  L2² argmin with cid tie-break, identical arithmetic to the batch
  queries) and append to a ``cid``-partitioned parquet index. Append
  mode; replays only duplicate rows, which search dedups by vec_id.
- ``search_ivf_index``: batch search over the maintained index — rank
  lists per query by centroid distance, read ONLY the probed
  partitions (the ``cid IN (…)`` filter prunes at the source; the test
  asserts it in the plan), exact cosine, top-k.

No new algorithm here: this is the deployment shape of
``ann_ivf_kmeans_topk`` split into its maintain/search halves.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators.similarity import _SQDIST, _cosine_expr

_D2 = _SQDIST.format(a="e", b="c")


def assign_lists(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, e) → (vec_id, cid, e): nearest-centroid assignment with
    the batch queries' exact arithmetic (round-6 L2², cid tie-break)."""
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .select("vec_id", "e", "cid", F.round(F.expr(_D2), 6).alias("d2"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id").orderBy("d2", "cid")),
        )
        .filter(F.col("rn") == 1)
        .select("cid", "vec_id", "e")
    )


def ivf_index_maintainer(
    stream: DataFrame, centroids: DataFrame, index_path: str, checkpoint: str
):
    """Streaming writer appending cid-partitioned index rows."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            assign_lists(batch_df, centroids)
            .write.mode("append")
            .partitionBy("cid")
            .parquet(index_path)
        )

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )


def search_ivf_index(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 3,
    k: int = 10,
) -> DataFrame:
    """(query_id, qe) → top-k (query_id, vec_id, cosine) touching only
    the probed inverted lists (partition pruning on ``cid``)."""
    probe = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "query_id", "qe", "cid",
            F.round(F.expr(_SQDIST.format(a="qe", b="c")), 6).alias("d2"),
        )
        .withColumn(
            "brank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d2", "cid")
            ),
        )
        .filter(F.col("brank") <= nprobe)
        .select("query_id", "qe", "cid")
    )
    probed_cids = [r.cid for r in probe.select("cid").distinct().collect()]
    index = spark.read.parquet(index_path).filter(F.col("cid").isin(probed_cids))
    # replay-safe: appends may duplicate rows; keep one per vec_id
    index = index.dropDuplicates(["vec_id"])
    scored = (
        index.join(F.broadcast(probe), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )
