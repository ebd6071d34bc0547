"""Invariants for the synthesized partsupp dim and its TPC-H queries."""

import pyspark.sql.functions as F

from kafka_stream_spark.operators.tpch_partsupp import (
    partsupp_df,
    q2_min_cost_supplier,
    q11_important_stock,
    q16_supplier_part_counts,
    q20_excess_stock_suppliers,
)
from kafka_stream_spark.operators._common import load


def test_partsupp_shape_and_ranges(spark, sf_dir):
    """Spec conformance: 4 distinct suppliers per part, (part, supp) PK
    unique, availqty in [1, 9999], cost cents in [100, 100000], every
    suppkey a real supplier."""
    ps = partsupp_df(spark, sf_dir).cache()
    part, supplier = load(spark, sf_dir, "part", "supplier")
    n_parts = part.count()
    assert ps.count() == 4 * n_parts
    per_part = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("d"), F.count(F.lit(1)).alias("n")
    )
    assert per_part.filter((F.col("d") != 4) | (F.col("n") != 4)).count() == 0
    stats = ps.agg(
        F.min("ps_availqty").alias("aq_lo"),
        F.max("ps_availqty").alias("aq_hi"),
        F.min("ps_cost_cents").alias("c_lo"),
        F.max("ps_cost_cents").alias("c_hi"),
    ).first()
    assert 1 <= stats.aq_lo and stats.aq_hi <= 9999
    assert 100 <= stats.c_lo and stats.c_hi <= 100000
    orphan = ps.join(
        supplier, ps["ps_suppkey"] == supplier["s_suppkey"], "left_anti"
    )
    assert orphan.count() == 0


def test_partsupp_deterministic(spark, sf_dir):
    """Two independent builds produce identical rows (the property the
    cross-engine oracle depends on)."""
    a = sorted(map(tuple, partsupp_df(spark, sf_dir).collect()))
    b = sorted(map(tuple, partsupp_df(spark, sf_dir).collect()))
    assert a == b


def test_partsupp_queries_nonempty(spark, sf_dir):
    """Each of the four query shapes exercises real data at test SF."""
    assert q2_min_cost_supplier(spark, sf_dir).count() > 0
    assert q11_important_stock(spark, sf_dir).count() > 0
    assert q16_supplier_part_counts(spark, sf_dir).count() > 0
    assert q20_excess_stock_suppliers(spark, sf_dir).count() > 0


def test_q2_cost_is_group_min(spark, sf_dir):
    """Every returned supplycost equals the part's min cost among the
    region's suppliers (the correlated-subquery semantics)."""
    rows = q2_min_cost_supplier(spark, sf_dir).collect()
    assert rows
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.supplycost)
    for costs in by_part.values():
        assert len(costs) == 1  # one min cost per part (ties share it)
