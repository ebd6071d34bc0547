"""TPC-H partsupp queries (Q2/Q11/Q16/Q20 shapes) over a synthesized
partsupp table.

The testdata has no partsupp parquet, so partsupp is DERIVED
deterministically from ``part`` x the supplier count, following the
TPC-H spec's generation rule (4 suppliers per part via a rotating
offset; availqty in [1, 9999]; supplycost in [1.00, 1000.00]) adapted
to this testdata's 0-based keys and tiny supplier counts:

  ps_suppkey    = (p + p div S + i * (S div 4)) mod S      for i in 0..3
  ps_availqty   = 1   + md5_60bit('aq:' p ':' i) mod 9999
  ps_cost_cents = 100 + md5_60bit('sc:' p ':' i) mod 99901

The suppkey offsets i * (S div 4) are distinct mod S for every S >= 4
(3 * (S div 4) < S), so each part always gets 4 DISTINCT suppliers —
the spec's own formula degenerates at the tiny S of the small test
scale factors. Supply cost lives in integer cents so min-cost equality
(Q2) and value sums (Q11) are exact integer arithmetic in both engines.

Both engines build partsupp from the same expressions — Spark in
``partsupp_df``, DuckDB via the ``_PS_CTE`` fragment — so the oracle
check is as real as for an on-disk table: the query shapes, joins, and
aggregates are what is being verified.

Scale: partsupp generation is a map-only explode of the part table (4
rows per part) against a 1-row broadcast supplier count — no shuffle,
no driver loop; at 100 TB it materializes exactly like any projected
dimension and would normally be written once and bucketed by
ps_partkey.

Reference framing: these stand in for the Lenses SQL surface's join/
subquery coverage (/root/reference/README.md:41-43) like the other
TPC-H shapes in tpch_more/tpch_deep.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_PS_CTE = """
    ps AS (
      SELECT p_partkey AS ps_partkey,
             CAST((p_partkey + p_partkey // s + i * (s // 4)) % s AS BIGINT)
               AS ps_suppkey,
             CAST(1 + ('0x' || substr(md5('aq:' || p_partkey::VARCHAR || ':'
                                           || i::VARCHAR), 1, 15))::BIGINT
                      % 9999 AS BIGINT) AS ps_availqty,
             CAST(100 + ('0x' || substr(md5('sc:' || p_partkey::VARCHAR || ':'
                                            || i::VARCHAR), 1, 15))::BIGINT
                        % 99901 AS BIGINT) AS ps_cost_cents
      FROM part
      CROSS JOIN (SELECT count(*) AS s FROM supplier) sup_cnt
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) gen_i
    )
"""


def _h60(tag: str) -> F.Column:
    """60-bit positive int from md5 over 'tag:partkey:i' — matches the
    DuckDB ('0x' || substr(md5(...), 1, 15))::BIGINT expression."""
    return F.expr(
        f"cast(conv(substr(md5(cast(concat('{tag}:', cast(p_partkey as string),"
        f" ':', cast(i as string)) as binary)), 1, 15), 16, 10) as bigint)"
    )


def partsupp_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized partsupp: (ps_partkey, ps_suppkey, ps_availqty,
    ps_cost_cents), 4 rows per part, deterministic across engines."""
    part, supplier = load(spark, sf_dir, "part", "supplier")
    s_cnt = supplier.agg(F.count(F.lit(1)).alias("s"))
    base = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(s_cnt))
        .select(
            "p_partkey", "s", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
        )
    )
    suppkey = (
        F.col("p_partkey") + F.expr("p_partkey div s") + F.col("i") * F.expr("s div 4")
    ) % F.col("s")
    return base.select(
        F.col("p_partkey").alias("ps_partkey"),
        suppkey.cast("bigint").alias("ps_suppkey"),
        (F.lit(1) + _h60("aq") % 9999).alias("ps_availqty"),
        (F.lit(100) + _h60("sc") % 99901).alias("ps_cost_cents"),
    )


def _region_suppliers(spark: SparkSession, sf_dir: str, r_name: str) -> DataFrame:
    supplier, nation, region = load(spark, sf_dir, "supplier", "nation", "region")
    return (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == r_name)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PS_CTE},
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    costs AS (
      SELECT ps_partkey, ps_suppkey, ps_cost_cents
      FROM ps JOIN eu ON ps_suppkey = s_suppkey
    ),
    mins AS (
      SELECT ps_partkey, min(ps_cost_cents) AS min_cents
      FROM costs GROUP BY ps_partkey
    )
    SELECT round(e.s_acctbal, 2) AS s_acctbal, e.s_name, e.n_name,
           p.p_partkey, p.p_type,
           round(c.ps_cost_cents / 100.0, 2) AS supplycost
    FROM part p
    JOIN costs c ON c.ps_partkey = p.p_partkey
    JOIN mins m ON m.ps_partkey = p.p_partkey
               AND c.ps_cost_cents = m.min_cents
    JOIN eu e ON e.s_suppkey = c.ps_suppkey
    WHERE p.p_size < 15 AND p.p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    description=(
        "TPC-H Q2 shape: minimum-cost supplier per part within a region "
        "(correlated-min subquery as a grouped-min join), filtered part "
        "dim, top-100 by account balance. Adapted: p_size/p_type filters "
        "replace the %BRASS predicate; no mfgr/address/phone columns"
    ),
    bench=True,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated `= (SELECT min ...)` subquery expressed as a
    grouped-min self-join, the canonical Spark rewrite. The region
    supplier dim and the size/type-filtered part dim broadcast; the
    min-cost equality joins on integer CENTS so no float-equality
    hazard exists. The top-100 is a TakeOrderedAndProject."""
    (part,) = load(spark, sf_dir, "part")
    eu = _region_suppliers(spark, sf_dir, "EUROPE")
    ps = partsupp_df(spark, sf_dir)
    costs = ps.join(eu, ps["ps_suppkey"] == eu["s_suppkey"]).select(
        "ps_partkey", "ps_suppkey", "ps_cost_cents"
    )
    mins = (
        costs.groupBy("ps_partkey")
        .agg(F.min("ps_cost_cents").alias("min_cents"))
        .withColumnRenamed("ps_partkey", "m_partkey")
    )
    fpart = part.filter((F.col("p_size") < 15) & (F.col("p_type") == "LARGE"))
    return (
        F.broadcast(fpart)
        .join(costs, costs["ps_partkey"] == fpart["p_partkey"])
        .join(
            mins,
            (F.col("m_partkey") == F.col("p_partkey"))
            & (F.col("ps_cost_cents") == F.col("min_cents")),
        )
        .join(eu, eu["s_suppkey"] == costs["ps_suppkey"])
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round(F.col("ps_cost_cents") / 100.0, 2).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH {_PS_CTE},
    asia AS (
      SELECT s_suppkey
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ),
    vals AS (
      SELECT ps_partkey,
             CAST(sum(ps_cost_cents * ps_availqty) AS BIGINT) AS value_u
      FROM ps JOIN asia ON ps_suppkey = s_suppkey
      GROUP BY ps_partkey
    ),
    total AS (SELECT CAST(sum(value_u) AS BIGINT) AS total_u,
                     count(*) AS np FROM vals)
    SELECT ps_partkey, round(value_u / 100.0, 2) AS value
    FROM vals CROSS JOIN total
    WHERE value_u * np > 2 * total_u
    ORDER BY value DESC, ps_partkey
    """,
    description=(
        "TPC-H Q11 shape: per-part inventory value within a supplier "
        "group, kept where the part's value exceeds 2x the per-part mean — the "
        "spec's SF-scaled fraction made scale-free so the result is "
        "non-degenerate at every SF. Adapted: the "
        "supplier group is a region, not a single nation, so the group "
        "is non-empty at every scale factor"
    ),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's HAVING-vs-global-scalar shape: one grouped integer sum per
    part, one 1-row total broadcast back, and an exact integer threshold
    compare (value_u * np > 2 * total_u — no float division anywhere in
    the predicate). Both aggregates run on the same ps join, which Spark
    computes once per branch over the 4-rows-per-part generated dim."""
    asia = _region_suppliers(spark, sf_dir, "ASIA").select("s_suppkey")
    ps = partsupp_df(spark, sf_dir)
    vals = (
        ps.join(asia, ps["ps_suppkey"] == asia["s_suppkey"])
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_cost_cents") * F.col("ps_availqty")).alias("value_u")
        )
    )
    total = vals.agg(
        F.sum("value_u").alias("total_u"), F.count(F.lit(1)).alias("np")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value_u") * F.col("np") > 2 * F.col("total_u"))
        .select("ps_partkey", F.round(F.col("value_u") / 100.0, 2).alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#2'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    description=(
        "TPC-H Q16 shape: distinct supplier counts per (brand, type, "
        "size) with brand/type/size exclusions and a supplier blacklist "
        "anti-join. Adapted: no s_comment exists, so the 'Customer "
        "Complaints' blacklist becomes negative account balance"
    ),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16's NOT IN subquery as a left-anti join against the (tiny,
    broadcast) blacklisted supplier set; part filters push into the
    generated dim before the join; count(DISTINCT) groups on the part
    attribute triple."""
    part, supplier = load(spark, sf_dir, "part", "supplier")
    ps = partsupp_df(spark, sf_dir)
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    fpart = part.filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    return (
        ps.join(
            F.broadcast(bad), ps["ps_suppkey"] == bad["s_suppkey"], "left_anti"
        )
        .join(F.broadcast(fpart), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_excess_stock_suppliers",
    oracle=f"""
    WITH {_PS_CTE},
    qty AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps
      JOIN qty ON qty.l_partkey = ps.ps_partkey
              AND qty.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND CAST(ps.ps_availqty * 2 AS DOUBLE) > qty.q
    )
    SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM excess e
    JOIN supplier s ON s.s_suppkey = e.ps_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AMERICA'
    ORDER BY s.s_name
    """,
    description=(
        "TPC-H Q20 shape: suppliers in a region holding excess stock "
        "(availqty > half the year's shipped quantity) of name-filtered "
        "parts — nested IN subqueries as semi-joins. Adapted: region "
        "instead of single nation; 'small%' part names instead of "
        "'forest%'; no s_address column"
    ),
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested IN chain flattened to joins: the year's shipped
    quantity per (part, supplier) aggregates the fact table once
    (filter pushed to the scan); the name-filtered part set semi-joins
    the generated dim; the excess predicate compares 2x availqty
    against the (exact — integral doubles) quantity sum. Supplier/
    nation/region resolve over the distinct excess supplier ids."""
    part, lineitem, supplier, nation, region = load(
        spark, sf_dir, "part", "lineitem", "supplier", "nation", "region"
    )
    qty = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    small = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    ps = partsupp_df(spark, sf_dir)
    excess = (
        ps.join(F.broadcast(small), ps["ps_partkey"] == small["p_partkey"], "left_semi")
        .join(
            qty,
            (qty["l_partkey"] == ps["ps_partkey"])
            & (qty["l_suppkey"] == ps["ps_suppkey"]),
        )
        .filter((F.col("ps_availqty") * 2).cast("double") > F.col("q"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        excess.join(supplier, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )
