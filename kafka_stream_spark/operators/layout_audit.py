"""Z-order layout pruning audit — measuring WHY the write path clusters.

`sources/layout.py` implements the write path (range clustering and
Z-order/Morton clustering, the Delta/Iceberg OPTIMIZE ZORDER technique,
all public); this query measures the property those writes buy: how
many file-sized buckets a 2-D box predicate can SKIP from min/max
statistics alone, under a linear single-key layout versus a Z-order
layout of the same data.

Both layouts are simulated with deterministic integer math so the
whole audit is oracle-checkable: each dimension min-max-normalizes to
an 8-bit rank (the write path uses approx-quantile ranks — sampling
that an oracle cannot reproduce; min-max is the deterministic stand-in
with the same bit-interleave), ranks interleave into a 16-bit Morton
code, rows rank into 64 equal buckets per layout, and a mid-range box
predicate (~10% per dimension) touches a bucket iff its [min,max]
envelope intersects the box on BOTH dimensions — exactly the parquet
row-group pruning rule.

Two predicates make the property visible: a custkey-range predicate
(the linear layout's own sort key — both layouts prune it) and an
order-date-range predicate (the secondary dimension — the linear
layout cannot skip a single bucket, every bucket spans all dates,
while the Z-order layout skips most). That asymmetry IS the reason
OPTIMIZE ZORDER exists.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_BITS = 8  # per-dimension rank bits; z-code = 2 * _BITS wide
_NB = 64  # simulated file buckets per layout


def _z_spark(xq: str, yq: str) -> str:
    terms = []
    for b in range(_BITS):
        terms.append(
            f"shiftleft(cast((shiftright({xq}, {b}) & 1) as bigint), {2 * b})"
        )
        terms.append(
            f"shiftleft(cast((shiftright({yq}, {b}) & 1) as bigint), {2 * b + 1})"
        )
    return " | ".join(terms)


def _z_duck(xq: str, yq: str) -> str:
    terms = []
    for b in range(_BITS):
        terms.append(f"((({xq} >> {b}) & 1)::BIGINT << {2 * b})")
        terms.append(f"((({yq} >> {b}) & 1)::BIGINT << {2 * b + 1})")
    return " | ".join(terms)


@query(
    "zorder_pruning_audit",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             date_diff('day', (SELECT min(CAST(o_orderdate AS DATE)) FROM orders),
                       CAST(o_orderdate AS DATE)) AS dayidx
      FROM orders
    ),
    ext AS (
      SELECT min(o_custkey) AS minc, max(o_custkey) AS maxc,
             min(dayidx) AS mind, max(dayidx) AS maxd,
             count(*) AS n
      FROM base
    ),
    ranked AS (
      SELECT b.o_orderkey, b.o_custkey, b.dayidx, e.n,
             ((b.o_custkey - e.minc) * {1 << _BITS})
               // (e.maxc - e.minc + 1) AS xq,
             ((b.dayidx - e.mind) * {1 << _BITS})
               // (e.maxd - e.mind + 1) AS yq,
             e.minc + (e.maxc - e.minc) * 40 // 100 AS lo_ck,
             e.minc + (e.maxc - e.minc) * 50 // 100 AS hi_ck,
             e.mind + (e.maxd - e.mind) * 45 // 100 AS lo_d,
             e.mind + (e.maxd - e.mind) * 55 // 100 AS hi_d
      FROM base b CROSS JOIN ext e
    ),
    coded AS (SELECT *, {_z_duck("xq", "yq")} AS z FROM ranked),
    buckets AS (
      SELECT *,
             ((row_number() OVER (ORDER BY o_custkey, o_orderkey) - 1) * {_NB})
               // n AS b_lin,
             ((row_number() OVER (ORDER BY z, o_orderkey) - 1) * {_NB})
               // n AS b_z
      FROM coded
    ),
    stats AS (
      SELECT 'linear' AS layout, b_lin AS bucket,
             min(o_custkey) AS ck_min, max(o_custkey) AS ck_max,
             min(dayidx) AS d_min, max(dayidx) AS d_max,
             any_value(lo_ck) AS lo_ck, any_value(hi_ck) AS hi_ck,
             any_value(lo_d) AS lo_d, any_value(hi_d) AS hi_d
      FROM buckets GROUP BY b_lin
      UNION ALL
      SELECT 'zorder', b_z,
             min(o_custkey), max(o_custkey), min(dayidx), max(dayidx),
             any_value(lo_ck), any_value(hi_ck), any_value(lo_d), any_value(hi_d)
      FROM buckets GROUP BY b_z
    )
    SELECT layout, 'custkey_range' AS predicate,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN ck_max >= lo_ck AND ck_min <= hi_ck
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_touched,
           round(1.0 - sum(CASE WHEN ck_max >= lo_ck AND ck_min <= hi_ck
                           THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS skip_ratio
    FROM stats GROUP BY layout
    UNION ALL
    SELECT layout, 'date_range',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN d_max >= lo_d AND d_min <= hi_d
                     THEN 1 ELSE 0 END) AS BIGINT),
           round(1.0 - sum(CASE WHEN d_max >= lo_d AND d_min <= hi_d
                           THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
    FROM stats GROUP BY layout
    ORDER BY layout, predicate
    """,
    description=(
        "Min/max pruning audit under linear vs Z-order (Morton) "
        "simulated file layouts, for a sort-key range predicate AND a "
        "secondary-dimension date predicate: a bucket is touched iff "
        "its [min,max] envelope intersects the range — the parquet "
        "row-group rule, fully integer-deterministic; the date row "
        "shows why Z-order exists (linear skips nothing)"
    ),
)
def zorder_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit twin of `sources/layout.zorder_layout` (which range-
    writes real files): it quantifies how many buckets each layout lets
    a box query skip. The global row_number ranks simulate the layout
    write's range partitioner — an audit-only global sort; the
    production write uses repartitionByRange (sampled boundaries, no
    global sort), and this query's job is to measure the OUTCOME of
    that clustering, deterministically enough for a cross-engine
    oracle.
    """
    (orders,) = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "datediff(cast(o_orderdate as date),"
            " min(cast(o_orderdate as date)) over ())"
        ).alias("dayidx"),
    )
    ext = base.agg(
        F.min("o_custkey").alias("minc"),
        F.max("o_custkey").alias("maxc"),
        F.min("dayidx").alias("mind"),
        F.max("dayidx").alias("maxd"),
        F.count(F.lit(1)).alias("n"),
    )
    scale = 1 << _BITS
    ranked = base.crossJoin(F.broadcast(ext)).select(
        "o_orderkey",
        "o_custkey",
        "dayidx",
        "n",
        F.expr(f"((o_custkey - minc) * {scale}) div (maxc - minc + 1)").alias("xq"),
        F.expr(f"((dayidx - mind) * {scale}) div (maxd - mind + 1)").alias("yq"),
        F.expr("minc + (maxc - minc) * 40 div 100").alias("lo_ck"),
        F.expr("minc + (maxc - minc) * 50 div 100").alias("hi_ck"),
        F.expr("mind + (maxd - mind) * 45 div 100").alias("lo_d"),
        F.expr("mind + (maxd - mind) * 55 div 100").alias("hi_d"),
    )
    coded = ranked.withColumn("z", F.expr(_z_spark("xq", "yq")))
    buckets = coded.select(
        "*",
        F.expr(
            f"((row_number() over (order by o_custkey, o_orderkey) - 1) * {_NB})"
            " div n"
        ).alias("b_lin"),
        F.expr(
            f"((row_number() over (order by z, o_orderkey) - 1) * {_NB}) div n"
        ).alias("b_z"),
    )

    def leg(name: str, bcol: str) -> DataFrame:
        return (
            buckets.groupBy(F.col(bcol).alias("bucket"))
            .agg(
                F.min("o_custkey").alias("ck_min"),
                F.max("o_custkey").alias("ck_max"),
                F.min("dayidx").alias("d_min"),
                F.max("dayidx").alias("d_max"),
                F.first("lo_ck").alias("lo_ck"),
                F.first("hi_ck").alias("hi_ck"),
                F.first("lo_d").alias("lo_d"),
                F.first("hi_d").alias("hi_d"),
            )
            .withColumn("layout", F.lit(name))
        )

    stats = leg("linear", "b_lin").unionByName(leg("zorder", "b_z"))
    t_ck = F.when(
        (F.col("ck_max") >= F.col("lo_ck")) & (F.col("ck_min") <= F.col("hi_ck")), 1
    ).otherwise(0)
    t_d = F.when(
        (F.col("d_max") >= F.col("lo_d")) & (F.col("d_min") <= F.col("hi_d")), 1
    ).otherwise(0)

    def pred_leg(pred_name: str, flag) -> DataFrame:
        return (
            stats.groupBy("layout")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
                F.sum(flag).cast("bigint").alias("n_touched"),
                F.round(1.0 - F.sum(flag) * 1.0 / F.count(F.lit(1)), 6).alias(
                    "skip_ratio"
                ),
            )
            .withColumn("predicate", F.lit(pred_name))
        )

    return (
        pred_leg("custkey_range", t_ck)
        .unionByName(pred_leg("date_range", t_d))
        .select("layout", "predicate", "n_buckets", "n_touched", "skip_ratio")
        .orderBy("layout", "predicate")
    )
