"""SemDeDup-style semantic deduplication over the embedding corpus.

Semantic dedup (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023 — public arXiv paper)
removes documents that are *semantically* redundant even when their text
differs: embed, cluster, and prune near-identical vectors **within each
cluster** so the pairwise work is O(Σ cluster_size²), never corpus².

Reference framing: the reference stack (FireMonkey69/kafka-stream) exposes
its data through streaming SQL (README.md:41-43); this operator extends
that query surface with the curation op an LLM-data pipeline needs.

Spark-first design, 100 TB shape:

- The coarse quantizer is the per-label centroid table (k × 64 doubles),
  the same geometry ``ann_ivf_topk`` uses — tiny, **broadcast**; the
  corpus is never shuffled for assignment (map-only cross join against
  the broadcast centroids + one per-vector window).
- Within-cluster pairing shuffles on ``cid`` only; each task's work is
  bounded by its cluster's size². At 100 TB you grow k with the corpus
  (SemDeDup's own scale story: k ≈ N / target_cluster_size), keeping the
  per-task quadratic term constant; skewed clusters are handled by AQE
  skew-join splitting on the self-join.
- The keep rule is **lowest-vec_id wins**: vector b is dropped iff some
  a < b in the same cluster has round(cos(a, b), 6) ≥ τ. Unlike greedy
  scan-order pruning this is order-independent (a set predicate), so the
  result is deterministic under any partitioning — and expressible in
  one SQL statement, which is what makes the DuckDB oracle exact.

Determinism across engines: assignment ranks clusters by cosine rounded
to 6dp (tie-break cid), the dup threshold compares a 6dp-rounded cosine —
the same round-before-compare recipe every oracle-green ANN query here
uses, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.similarity import _cosine_expr, _to_double
from kafka_stream_spark.registry import query

#: within-cluster cosine at or above this is a semantic duplicate
_TAU = 0.30

_DUCK_COS = (
    "list_inner_product({a}, {b}) / (sqrt(list_inner_product({a}, {a}))"
    " * sqrt(list_inner_product({b}, {b})))"
)

_SEMDEDUP_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
expl AS (
  SELECT label, i, e[i] AS x
  FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings)
  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
),
cent AS (  -- per-label centroid: the broadcastable coarse quantizer
  SELECT label AS cid, array_agg(cx ORDER BY i) AS c
  FROM (SELECT label, i, avg(x) AS cx FROM expl GROUP BY label, i)
  GROUP BY label
),
assigned AS (  -- nearest centroid by rounded cosine, tie-break cid
  SELECT vec_id, e, cid, ccos FROM (
    SELECT vec_id, e, cid,
           round({_DUCK_COS.format(a='e', b='c')}, 6) AS ccos,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             round({_DUCK_COS.format(a='e', b='c')}, 6) DESC, cid) AS rn
    FROM v CROSS JOIN cent) WHERE rn = 1
),
dropped AS (  -- b loses to any lower-id near-duplicate in its cluster
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round({_DUCK_COS.format(a='a.e', b='b.e')}, 6) >= {_TAU}
)
SELECT CAST(s.vec_id AS BIGINT) AS vec_id,
       CAST(s.cid AS INTEGER) AS cid,
       s.ccos AS centroid_cosine
FROM assigned s ANTI JOIN dropped d ON s.vec_id = d.vec_id
ORDER BY s.vec_id
"""


@query(
    "semdedup_embeddings",
    oracle=_SEMDEDUP_ORACLE,
    description=(
        "SemDeDup semantic dedup: broadcast-centroid cluster assignment, "
        "within-cluster cosine pruning (lowest-id wins), pairwise work "
        "bounded by cluster size — never corpus-quadratic"
    ),
    bench=True,
)
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "label", F.expr(_to_double("embedding")).alias("e"))

    # coarse quantizer: per-label mean vector (k x 64 doubles -> broadcast)
    cent = (
        v.select("label", F.posexplode("e").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))), lambda s: s["cx"]
            ).alias("c")
        )
        .select(F.col("label").alias("cid"), "c")
    )

    # map-only geometric assignment: corpus stays put, centroids broadcast
    assigned = (
        v.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "e", "cid",
            F.round(F.expr(_cosine_expr("e", "c")), 6).alias("ccos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "e", "cid", "ccos")
    )

    # within-cluster near-dup edges; self-join on a renamed copy (sharp
    # edge #9: complex un-materialized self-joins can die in the optimizer)
    a = assigned.select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"), F.col("cid").alias("cid_a")
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"), F.col("cid").alias("cid_b")
    )
    dropped = (
        a.join(b, (F.col("cid_a") == F.col("cid_b")) & (F.col("vec_a") < F.col("vec_b")))
        .filter(F.round(F.expr(_cosine_expr("ea", "eb")), 6) >= _TAU)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )

    return (
        assigned.join(dropped, "vec_id", "left_anti")
        .select("vec_id", "cid", F.col("ccos").alias("centroid_cosine"))
        .orderBy("vec_id")
    )
