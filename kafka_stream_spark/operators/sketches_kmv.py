"""KMV (k-minimum-values / theta-sketch) distinct sketches with SET
OPERATIONS — the capability the HLL family doesn't have.

``approx_distinct_hll`` (analytics_ext) answers "how many distinct users
per type"; a KMV sketch additionally answers "how many distinct users do
two streams SHARE" without ever materializing either set: keep the k
smallest (md5-uniform) hashes per stream, merge two sketches by taking
the k smallest of the union, and estimate

    union      ≈ (k-1) / theta          (theta = k-th min, normalized)
    jaccard    ≈ |A_k ∩ B_k ∩ U_k| / k  (matching minima in the union sketch)
    intersect  ≈ jaccard × union

(the Beyer et al. 2007 / Dasgupta et al. theta-sketch construction).
Everything up to the two final divisions is exact integer math on md5
prefixes, so the sketch — including its errors — is bit-identical across
engines and the whole estimate chain is oracle-checkable.

At 100 TB the sketch build is the same partial-agg argument as HLL: a
per-type top-k-min collapses each task to ≤ k rows before the wire
(Spark's groupBy + min-k via window here; a streaming twin would carry
the k-row state per key in applyInPandasWithState). The
``exact_intersection`` audit column is the expensive self-join the
sketch replaces at scale — it would be dropped in production.

Reference anchor: per-key streams that share an identity space
(``sample-data/variables.env:3-10``; cc_data/cc_payments share card ids,
``extras/99-supervisord-running-sample-data.conf:43-56``) — "how many
entities appear in both topics" is a Lenses-dashboard staple.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_KMV_K = 32
_TWO32 = 4294967296.0  # hash domain: first 8 md5 hex chars = 32 bits

# Spark-side md5 prefix → bigint (DuckDB twin in the oracle below).
_HV = (
    "cast(conv(substr(md5(cast(concat('kmv:', cast(user_id as string)) "
    "as binary)), 1, 8), 16, 10) as bigint)"
)


@query(
    "kmv_type_overlap",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT event_type,
             (('0x' || substr(md5('kmv:' || user_id::VARCHAR), 1, 8))::BIGINT)
               AS hv
      FROM events
    ),
    sk AS (
      SELECT event_type, hv
      FROM (SELECT event_type, hv,
                   row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
            FROM du)
      WHERE rn <= {_KMV_K}
    ),
    est AS (
      SELECT event_type,
             round(CASE WHEN count(*) < {_KMV_K} THEN count(*) * 1.0
                        ELSE ({_KMV_K} - 1) * {_TWO32} / max(hv) END,
                   2) AS est_distinct
      FROM sk GROUP BY event_type
    ),
    u AS (
      SELECT p.type_a, p.type_b, s.hv,
             max(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
      FROM (SELECT a.event_type AS type_a, b.event_type AS type_b
            FROM (SELECT DISTINCT event_type FROM sk) a
            JOIN (SELECT DISTINCT event_type FROM sk) b
              ON a.event_type < b.event_type) p
      JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY p.type_a, p.type_b, s.hv
    ),
    uk AS (
      SELECT type_a, type_b, hv, in_a, in_b
      FROM (SELECT *, row_number() OVER (PARTITION BY type_a, type_b
                                         ORDER BY hv) AS rn
            FROM u)
      WHERE rn <= {_KMV_K}
    ),
    pair AS (
      SELECT type_a, type_b,
             round(CASE WHEN count(*) < {_KMV_K} THEN count(*) * 1.0
                        ELSE ({_KMV_K} - 1) * {_TWO32} / max(hv) END,
                   2) AS est_union,
             round(sum(in_a * in_b) * 1.0 / count(*), 6) AS est_jaccard
      FROM uk GROUP BY type_a, type_b
    ),
    exact AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
             count(*) AS exact_intersection
      FROM (SELECT DISTINCT event_type, user_id FROM events) x
      JOIN (SELECT DISTINCT event_type, user_id FROM events) y
        ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY x.event_type, y.event_type
    )
    SELECT p.type_a, p.type_b,
           ea.est_distinct AS est_a, eb.est_distinct AS est_b,
           p.est_union, p.est_jaccard,
           round(p.est_jaccard * p.est_union, 2) AS est_intersection,
           coalesce(e.exact_intersection, 0) AS exact_intersection
    FROM pair p
    JOIN est ea ON ea.event_type = p.type_a
    JOIN est eb ON eb.event_type = p.type_b
    LEFT JOIN exact e ON e.type_a = p.type_a AND e.type_b = p.type_b
    ORDER BY p.type_a, p.type_b
    """,
    description=(
        "KMV/theta-sketch per event type: distinct estimates plus "
        "pairwise union / jaccard / intersection estimates from merged "
        "k-min sketches, with the exact intersection as audit column"
    ),
)
def kmv_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch overlap of the five event-type user sets. The only
    corpus-wide work is the distinct (type, hash) projection; sketches
    are ≤ k rows per type, so every pairwise step after that is
    driver-scale data flowing through ordinary DataFrame ops (the plan
    keeps it distributed — no collect)."""
    (events,) = load(spark, sf_dir, "events")
    du = events.select("event_type", F.expr(_HV).alias("hv")).distinct()
    sk = (
        du.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("event_type").orderBy("hv")),
        )
        .where(F.col("rn") <= _KMV_K)
        .select("event_type", "hv")
        .cache()  # tiny (types × k); reused by est + both pair sides
    )
    # a sketch with fewer than k minima IS its set — report it exactly
    est = sk.groupBy("event_type").agg(
        F.round(
            F.when(
                F.count(F.lit(1)) < _KMV_K, F.count(F.lit(1)).cast("double")
            ).otherwise(F.lit((_KMV_K - 1) * _TWO32) / F.max("hv")),
            2,
        ).alias("est_distinct")
    )
    types = sk.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .crossJoin(types.select(F.col("event_type").alias("type_b")))
        .where(F.col("type_a") < F.col("type_b"))
    )
    a_rows = pairs.join(
        sk.select(F.col("event_type").alias("type_a"), "hv"), "type_a"
    ).select("type_a", "type_b", "hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    b_rows = pairs.join(
        sk.select(F.col("event_type").alias("type_b"), "hv"), "type_b"
    ).select("type_a", "type_b", "hv", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    u = (
        a_rows.unionByName(b_rows)
        .groupBy("type_a", "type_b", "hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    uk = u.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("type_a", "type_b").orderBy("hv")),
    ).where(F.col("rn") <= _KMV_K)
    pair = uk.groupBy("type_a", "type_b").agg(
        F.round(
            F.when(
                F.count(F.lit(1)) < _KMV_K, F.count(F.lit(1)).cast("double")
            ).otherwise(F.lit((_KMV_K - 1) * _TWO32) / F.max("hv")),
            2,
        ).alias("est_union"),
        F.round(
            F.sum(F.col("in_a") * F.col("in_b")) / F.count(F.lit(1)), 6
        ).alias("est_jaccard"),
    )
    dtu = events.select("event_type", "user_id").distinct()
    exact = (
        dtu.alias("x")
        .join(
            dtu.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    return (
        pair.join(est.withColumnRenamed("event_type", "type_a"), "type_a")
        .withColumnRenamed("est_distinct", "est_a")
        .join(est.withColumnRenamed("event_type", "type_b"), "type_b")
        .withColumnRenamed("est_distinct", "est_b")
        .join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            "est_union",
            "est_jaccard",
            F.round(F.col("est_jaccard") * F.col("est_union"), 2).alias(
                "est_intersection"
            ),
            F.coalesce("exact_intersection", F.lit(0)).alias("exact_intersection"),
        )
        .orderBy("type_a", "type_b")
    )
