"""Additional TPC-H-shaped queries (Q7/Q8/Q10 adapted to the testdata
star schema — no partsupp/commitdate/shipmode columns exist, so the
shapes keep the join/agg structure with the available columns).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query


@query(
    "q7_nation_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation sn ON s_nationkey = sn.n_nationkey
                  JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    description="Bilateral trade volume by year (TPC-H Q7 shape: double nation dim join)",
    bench=True,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, customer, supplier, orders, lineitem = load(
        spark, sf_dir, "nation", "customer", "supplier", "orders", "lineitem"
    )
    pair = ("NATION_1", "NATION_2")
    sn = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn.filter(F.col("supp_nation").isin(*pair))),
              F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(cn.filter(F.col("cust_nation").isin(*pair))),
              F.col("c_nationkey") == F.col("cnk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    WITH volumes AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                    JOIN part     ON l_partkey = p_partkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE p_type = 'ECONOMY'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM volumes
    GROUP BY o_year
    ORDER BY o_year
    """,
    description="Market share of one nation for a part type (TPC-H Q8 shape)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, part, supplier, orders, lineitem = load(
        spark, sf_dir, "nation", "part", "supplier", "orders", "lineitem"
    )
    vol = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name, c_mktsegment
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="Top customers by returned revenue (TPC-H Q10 shape)",
    bench=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, customer, orders, lineitem = load(
        spark, sf_dir, "nation", "customer", "orders", "lineitem"
    )
    lo = F.lit("1996-07-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name", "c_mktsegment")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
      AND o_orderdate < DATE '1995-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description=(
        "TPC-H Q4 shape (correlated EXISTS -> left-semi join). Adapted: "
        "l_commitdate/l_receiptdate don't exist in testdata, so 'late' = "
        "shipped >60 days after order date (reference shape preserved: "
        "date-windowed orders, semi join on lineitem, priority histogram)"
    ),
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst rewrites the correlated EXISTS to a LeftSemi join on
    l_orderkey — the fact table is touched once, the semi join keeps no
    lineitem payload columns, and the date filter pushes into both scans.
    Cites TPC-H Q4 via SURVEY.md §2.4 (semi joins are Spark freebies).
    """
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    dated = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-07-01"))
    )
    late = lineitem.select("l_orderkey", "l_shipdate")
    semi = dated.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= DATE '1995-01-01'
      AND l_shipdate < DATE '1996-01-01'
    GROUP BY ship_class
    ORDER BY ship_class
    """,
    description=(
        "TPC-H Q12 shape (join + conditional priority counts). Adapted: "
        "l_shipmode/l_commitdate/l_receiptdate don't exist, so the "
        "categorical is l_returnflag and 'late' = shipped >30 days after "
        "order date; the CASE-split aggregation shape is Q12's"
    ),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One join (lineitem filter pushed to scan; date range prunes), then
    a 3-group CASE aggregation — partial aggs collapse to 3 rows per
    partition before the exchange."""
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    shipped = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    joined = shipped.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30)
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    ),
    multi AS (  -- orders with lineitems from more than one supplier
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING count(DISTINCT l_suppkey) > 1
    ),
    lone_late AS (  -- late supplier, on a multi-supplier order, where NO OTHER supplier was late
      SELECT DISTINCT a.l_orderkey, a.l_suppkey
      FROM late a JOIN multi USING (l_orderkey)
      WHERE NOT EXISTS (
        SELECT 1 FROM late b
        WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey
      )
    )
    SELECT s_name, count(*) AS numwait
    FROM lone_late JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    description=(
        "TPC-H Q21 shape (the semi+anti correlated pair: suppliers solely "
        "responsible for a late multi-supplier order). Adapted: no "
        "l_commitdate/l_receiptdate, so 'late' = shipped >60 days after "
        "order date; the EXISTS/NOT-EXISTS double-correlation plan is Q21's"
    ),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anti-join side (NOT EXISTS other-late-supplier) lowers to a
    LeftAnti on (orderkey, suppkey≠) — both correlations resolve as joins
    on l_orderkey, so AQE shares the exchange; the distinct-supplier
    HAVING is a partial-aggregated count-distinct per order."""
    orders, lineitem, supplier = load(spark, sf_dir, "orders", "lineitem", "supplier")
    late = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
    )
    multi = (
        lineitem.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    a = late.join(multi, "l_orderkey")
    b = late.select(
        F.col("l_orderkey").alias("b_orderkey"), F.col("l_suppkey").alias("b_suppkey")
    )
    lone = (
        a.join(
            b,
            (F.col("l_orderkey") == F.col("b_orderkey"))
            & (F.col("l_suppkey") != F.col("b_suppkey")),
            "left_anti",
        )
        .distinct()
    )
    return (
        lone.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "supplier_ship_lag",
    oracle="""
    WITH lag AS (
      SELECT l.l_suppkey,
             datediff('day', o.o_orderdate, l.l_shipdate) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    agg AS (
      SELECT l_suppkey, count(*) AS n_items,
             round(avg(lag_days), 4) AS avg_lag_days,
             max(lag_days) AS max_lag_days,
             CAST(sum(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_late
      FROM lag GROUP BY l_suppkey
    )
    SELECT s.s_name, a.n_items, a.avg_lag_days, a.max_lag_days, a.n_late,
           round(a.n_late * 1.0 / a.n_items, 6) AS late_rate
    FROM agg a JOIN supplier s ON s.s_suppkey = a.l_suppkey
    ORDER BY late_rate DESC, s.s_name LIMIT 25
    """,
    description=(
        "Supplier fulfillment scorecard: order-to-ship lag in whole days "
        "(integer date math), >90-day late rates, worst-25 suppliers"
    ),
)
def supplier_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain lead-time analytics. Day-level datediff on DATE
    columns is exact integer arithmetic in both engines (the sub-second
    duration hazard doesn't exist at date grain). The fact join is the
    lineitem⋈orders equi-join AQE plans; the supplier dim broadcasts
    onto the |suppliers|-row aggregate; the worst-k is a TakeOrdered
    merge. round-before-rank applies to the late_rate ordering.
    """
    (lineitem, orders, supplier) = load(
        spark, sf_dir, "lineitem", "orders", "supplier"
    )
    lag = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        lineitem["l_orderkey"] == orders["o_orderkey"],
    ).select(
        "l_suppkey",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lag_days"),
    )
    agg = lag.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg("lag_days"), 4).alias("avg_lag_days"),
        F.max("lag_days").alias("max_lag_days"),
        F.sum(F.when(F.col("lag_days") > 90, 1).otherwise(0)).alias("n_late"),
    )
    return (
        agg.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            agg["l_suppkey"] == F.col("s_suppkey"),
        )
        .select(
            "s_name",
            "n_items",
            "avg_lag_days",
            "max_lag_days",
            "n_late",
            F.round(F.col("n_late") / F.col("n_items"), 6).alias("late_rate"),
        )
        .orderBy(F.desc("late_rate"), "s_name")
        .limit(25)
    )
