"""Count-min sketch heavy hitters (the frequency twin of the KMV/HLL
distinct sketches in ``sketches_kmv``).

A CMS is d hash rows x w counters; point-estimate(key) = min over rows
of the counter the key hashes to. Collisions only ever ADD, so the
estimate is an upper bound whose error is bounded by N/w per row — the
classic Cormode-Muthukrishnan guarantee (public paper, 2005). Hashes
are md5-derived so Spark and DuckDB build bit-identical counter tables
and the whole query is exactly oracle-checkable.

Scale: the counter build is one groupBy over (row, bucket) — partial
(map-side) aggregation collapses every partition to <= d x w rows
before the exchange, so shuffle volume is d x w x |partitions|
REGARDLESS of corpus size (the whole point of sketching 100 TB).
Estimation joins the d x w counter table (1 KB-scale, broadcast) back
to whatever keys need answering; here the audit answers ALL distinct
keys to exhibit the overestimation spectrum, production answers ad-hoc
point queries without ever re-scanning the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_CMS_D = 4    # hash rows
_CMS_W = 256  # counters per row
_CMS_TOPK = 20


def _bucket_spark(key_expr: str, j_col: str) -> str:
    """md5-derived bucket, bit-identical to the DuckDB expression."""
    return (
        f"cast(conv(substr(md5(cast(concat('cms', cast({j_col} as string), ':', "
        f"cast({key_expr} as string)) as binary)), 1, 15), 16, 10) as bigint) "
        f"% {_CMS_W}"
    )


_BUCKET_DUCK = (
    "('0x' || substr(md5('cms' || j::VARCHAR || ':' || user_id::VARCHAR), 1, 15))"
    f"::BIGINT % {_CMS_W}"
)


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH hashed AS (
      SELECT user_id, j, {_BUCKET_DUCK} AS bucket
      FROM events
      CROSS JOIN (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j) gj
    ),
    counters AS (
      SELECT j, bucket, count(*) AS n FROM hashed GROUP BY j, bucket
    ),
    truth AS (
      SELECT user_id, count(*) AS true_n FROM events GROUP BY user_id
    ),
    key_buckets AS (
      SELECT t.user_id, t.true_n, gj.j, {_BUCKET_DUCK} AS bucket
      FROM truth t
      CROSS JOIN (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j) gj
    ),
    est AS (
      SELECT k.user_id, k.true_n, min(c.n) AS est_n
      FROM key_buckets k JOIN counters c ON c.j = k.j AND c.bucket = k.bucket
      GROUP BY k.user_id, k.true_n
    )
    SELECT user_id, true_n, est_n, est_n - true_n AS overestimate
    FROM est
    ORDER BY true_n DESC, user_id
    LIMIT {_CMS_TOPK}
    """,
    description=(
        f"Count-min sketch ({_CMS_D}x{_CMS_W}) heavy hitters over event "
        "users: md5-derived hash rows, point estimates as min-of-counters, "
        "audited against exact counts (estimate is provably >= truth)"
    ),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit form: estimate every key and surface the top-k with
    their overestimation. The counter build is the only corpus-wide op
    and its shuffle is d x w per partition (map-side combined); truth is
    the one extra groupBy this audit needs (production skips it)."""
    (events,) = load(spark, sf_dir, "events")
    d_range = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j")
    hashed = events.select("user_id").select("user_id", d_range).select(
        "user_id", "j", F.expr(_bucket_spark("user_id", "j")).alias("bucket")
    )
    counters = hashed.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("n"))
    truth = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    key_buckets = truth.select("user_id", "true_n", d_range).select(
        "user_id", "true_n", "j", F.expr(_bucket_spark("user_id", "j")).alias("bucket")
    )
    est = (
        key_buckets.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("n").alias("est_n"))
    )
    return (
        est.select(
            "user_id",
            "true_n",
            "est_n",
            (F.col("est_n") - F.col("true_n")).alias("overestimate"),
        )
        .orderBy(F.desc("true_n"), "user_id")
        .limit(_CMS_TOPK)
    )
