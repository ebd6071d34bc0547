"""Margin-based bitext mining over the embeddings table.

The parallel-corpus mining shape from Artetxe & Schwenk 2019
("Margin-based Parallel Corpus Mining with Multilingual Sentence
Embeddings" — public) used by LASER/CCMatrix to pair sentences across
languages: raw cosine is miscalibrated across hubness regions, so each
candidate pair (x, y) is scored by its cosine RATIO to the mean cosine
of each side's k nearest neighbours:

    margin(x, y) = cos(x, y) / ((avg_kNN(x, Y) + avg_kNN(y, X)) / 2)

and x keeps its best-margin y when the margin clears a threshold.

Here label 0 plays the source-language pool and label 1 the target
pool (the synthetic embeddings table has no language column; labels
are its cluster structure, which is exactly the hubness structure the
margin exists to correct).

Scale shape: the pair stage is the exact all-pairs BASELINE, same
contract as `embedding_near_dup` — at 100 TB the candidate pairs and
each side's kNN statistics come from the ANN family (`ann_ivf_topk`'s
bucket-pruned search), which replaces only the candidate generator;
the margin normalization, both windowed kNN sums, and the best-match
selection are unchanged. Determinism: cosines round to 6dp then
convert to exact integer micro-units, so both kNN sums are integer
arithmetic and the final margin is one double division of identical
integers in both engines.

Reference anchor: the reference curates multilingual text feeds
(reddit bodies, ``sample-data/reddit.value.json:75-78``) — pairing
them across languages is a corpus-level operator its Lenses/Connect
layer has no answer for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.similarity import _cosine_expr, _to_double
from kafka_stream_spark.registry import query

_K = 4  # neighbours per side in the margin denominator
_THRESHOLD = 1.05


@query(
    "bitext_margin_mining",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    x AS (SELECT vec_id AS src_id, e AS xe FROM v WHERE label = 0),
    y AS (SELECT vec_id AS tgt_id, e AS ye FROM v WHERE label = 1),
    p AS (
      SELECT src_id, tgt_id,
             CAST(round(round(list_inner_product(xe, ye)
                   / (sqrt(list_inner_product(xe, xe))
                      * sqrt(list_inner_product(ye, ye))), 6)
                   * 1000000, 0) AS BIGINT) AS cos_u
      FROM x CROSS JOIN y
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY cos_u DESC, tgt_id) AS rx,
             row_number() OVER (PARTITION BY tgt_id
                                ORDER BY cos_u DESC, src_id) AS ry
      FROM p
    ),
    s AS (
      SELECT *,
             sum(CASE WHEN rx <= {_K} THEN cos_u ELSE 0 END)
               OVER (PARTITION BY src_id) AS sx,
             sum(CASE WHEN ry <= {_K} THEN cos_u ELSE 0 END)
               OVER (PARTITION BY tgt_id) AS sy
      FROM r
    ),
    m AS (
      SELECT src_id, tgt_id, cos_u,
             round(cos_u * {2 * _K}.0 / (sx + sy), 6) AS margin
      FROM s WHERE cos_u > 0 AND sx + sy > 0
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY src_id
                                   ORDER BY margin DESC, tgt_id) AS rn
      FROM m
    )
    SELECT CAST(src_id AS BIGINT) AS src_id,
           CAST(tgt_id AS BIGINT) AS tgt_id,
           round(cos_u / 1000000.0, 6) AS cosine,
           margin
    FROM best WHERE rn = 1 AND margin >= {_THRESHOLD}
    ORDER BY src_id
    """,
    description=(
        "Artetxe-Schwenk margin-based bitext mining between the label-0 "
        "and label-1 embedding pools: ratio margin over both sides' "
        "top-4 neighbour means (integer micro-unit kNN sums), "
        "best-match-per-source above a 1.05 margin"
    ),
    bench=True,
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three shuffles of the PAIR matrix, never more: one per windowed
    kNN direction (partition by src / by tgt) and one for the final
    per-src best-match rank — each a standard hash partitioning AQE can
    coalesce. The corpus itself is scanned once per pool; the pair
    stage is the exact baseline whose candidate generator swaps to the
    IVF/LSH family at scale (see module docstring).
    """
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "label", F.expr(_to_double("embedding")).alias("e"))
    x = v.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("src_id"), F.col("e").alias("xe")
    )
    y = v.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("e").alias("ye")
    )
    cos_u = (
        F.round(F.round(F.expr(_cosine_expr("xe", "ye")), 6) * 1_000_000, 0)
        .cast("bigint")
        .alias("cos_u")
    )
    p = x.crossJoin(F.broadcast(y)).select("src_id", "tgt_id", cos_u)
    wx = Window.partitionBy("src_id").orderBy(F.desc("cos_u"), F.asc("tgt_id"))
    wy = Window.partitionBy("tgt_id").orderBy(F.desc("cos_u"), F.asc("src_id"))
    r = p.withColumn("rx", F.row_number().over(wx)).withColumn(
        "ry", F.row_number().over(wy)
    )
    top = lambda rank_col: F.when(F.col(rank_col) <= _K, F.col("cos_u")).otherwise(
        F.lit(0)
    )
    s = r.withColumn(
        "sx", F.sum(top("rx")).over(Window.partitionBy("src_id"))
    ).withColumn("sy", F.sum(top("ry")).over(Window.partitionBy("tgt_id")))
    m = s.filter((F.col("cos_u") > 0) & (F.col("sx") + F.col("sy") > 0)).select(
        "src_id",
        "tgt_id",
        "cos_u",
        F.round(
            F.col("cos_u") * float(2 * _K) / (F.col("sx") + F.col("sy")), 6
        ).alias("margin"),
    )
    wbest = Window.partitionBy("src_id").orderBy(F.desc("margin"), F.asc("tgt_id"))
    return (
        m.withColumn("rn", F.row_number().over(wbest))
        .filter((F.col("rn") == 1) & (F.col("margin") >= _THRESHOLD))
        .select(
            F.col("src_id").cast("bigint").alias("src_id"),
            F.col("tgt_id").cast("bigint").alias("tgt_id"),
            F.round(F.col("cos_u") / 1_000_000.0, 6).alias("cosine"),
            "margin",
        )
        .orderBy("src_id")
    )
