"""Batch relational core (SURVEY.md §7 M2).

The reference exposes these semantics through Lenses SQL / Kafka Streams
(filter/project: SURVEY.md §2.3 P3-P4; joins §2.4; aggregations §2.5;
sort/limit §2.6; set ops §2.7). Here they are Catalyst-native DataFrame
plans — predicate pushdown, column pruning and join selection come free.

Scale notes applied throughout:
- dimension tables (region/nation/part/customer-as-dim) are broadcast —
  no shuffle of the fact side on a 1000-executor cluster;
- aggregates are expressed as groupBy().agg() so Spark plans partial
  (map-side) aggregation before the shuffle;
- float aggregates are rounded in BOTH engines (sum→2dp, avg→6dp) because
  double addition order differs between engines/partitions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

# --------------------------------------------------------------------------
# q1_pricing_summary — flagship: scan-heavy grouped aggregate (TPC-H Q1 shape)
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="Scan+filter+grouped aggregate over lineitem (Lenses SQL GROUP BY analog, SURVEY.md A1)",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q3_shipping_priority — 3-way join + grouped agg + top-k
# --------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE)                         AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="Fact-fact-dim join + agg + deterministic top-k (SURVEY.md J1/A1/W2)",
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = load(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1997-06-01 00:00:00").cast("timestamp_ntz")
    return (
        # no broadcast hint on customer: at 100 TB it's a big table — AQE
        # picks broadcast at small SFs and shuffled-hash/SMJ at scale
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem.filter(F.col("l_shipdate") > cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5_local_supplier — 6-way join through region/nation
# --------------------------------------------------------------------------


@query(
    "q5_local_supplier",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    description="Multi-way join with broadcast dims (SURVEY.md J1/J4)",
    bench=True,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, customer, supplier, orders, lineitem = load(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    dim = (
        F.broadcast(region.filter(F.col("r_name") == "ASIA"))
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    # broadcast only the bounded dims (region x nation <= 25 rows at any
    # SF); customer/supplier grow with the data — AQE sizes those joins
    return (
        lineitem.join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(dim), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# brand_agg_broadcast — KCQL-style enrichment projection + agg (broadcast dim)
# --------------------------------------------------------------------------


@query(
    "brand_agg_broadcast",
    oracle="""
    SELECT p_brand,
           round(sum(l_quantity), 2)      AS total_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           count(*)                       AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    description="Fact⋈broadcast-dim enrichment + agg (GlobalKTable join, SURVEY.md J4)",
    bench=True,
)
def brand_agg_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, lineitem = load(spark, sf_dir, "part", "lineitem")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# anti_join / semi_join — customers without / with orders
# --------------------------------------------------------------------------


@query(
    "anti_join_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    description="Left-anti join (SURVEY.md §2.4 'free in Spark')",
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "semi_join_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    description="Left-semi join",
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load(spark, sf_dir, "customer", "orders")
    return (
        customer.join(
            orders.filter(F.col("o_totalprice") > 200000),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# window_rank_orders — analytic functions (SURVEY.md §2.6 W3)
# --------------------------------------------------------------------------


@query(
    "window_rank_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, rnk, round(o_totalprice, 2) AS totalprice,
           round(prev_price, 2) AS prev_price
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
             lag(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS prev_price
      FROM orders
    )
    WHERE rnk <= 3
    ORDER BY o_custkey, rnk
    """,
    description="row_number + lag analytic window functions",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rnk"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("o_custkey", "rnk")
    )


# --------------------------------------------------------------------------
# setop_repeat_buyers — INTERSECT (SURVEY.md §2.7 U2)
# --------------------------------------------------------------------------


@query(
    "setop_repeat_buyers",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ORDER BY o_custkey
    """,
    description="Set intersection of yearly buyer cohorts",
)
def setop_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")

    def year(lo: str, hi: str) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz"))
        ).select("o_custkey")

    a = year("1996-01-01 00:00:00", "1997-01-01 00:00:00")
    b = year("1997-01-01 00:00:00", "1998-01-01 00:00:00")
    return a.intersect(b).orderBy("o_custkey")


# --------------------------------------------------------------------------
# order_priority_count — simple agg + HAVING
# --------------------------------------------------------------------------


@query(
    "order_priority_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    HAVING count(*) > 5
    ORDER BY o_orderpriority
    """,
    description="Filter + grouped count + HAVING",
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 5)
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# topk_orders — order-by + limit with deterministic tie-break (browse, W2)
# --------------------------------------------------------------------------


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    description="Global top-k (TakeOrderedAndProject — no full sort at scale)",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    # sort on the raw double (identical bits in both engines), round only on output
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )
