"""Scale-path evidence tests: bucketed co-located joins (no shuffle) and
the sketch family (approximate aggregates) with tolerance checks.

Bucketing is the batch analog of Kafka's keyed partitioning: both sides
pre-partitioned on the join key → the join needs no Exchange (SCALING.md
"co-locate joins via bucketing").
"""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # bucketed tables need the session catalog (saveAsTable)
    return str(tmp_path_factory.mktemp("wh"))


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path_factory):
    from kafka_stream_spark.operators._common import load

    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a crashed prior run can leave the managed location behind
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("b_orders"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("b_lineitem"))
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    joined = bo.join(bl, F.col("o_orderkey") == F.col("l_orderkey")).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    # tables are tiny at test SF → AQE would broadcast; force the
    # shuffle-family join to observe bucket co-location
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 8 out of 8" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # co-located: no Exchange anywhere between the scans and the join
        join_and_below = plan[plan.index("Join"):]
        assert "Exchange" not in join_and_below, f"join inputs were shuffled:\n{plan[:2000]}"
        # and the result matches the unbucketed join
        plain = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey")).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_approx_count_distinct_tolerance(spark, sf_dir):
    from kafka_stream_spark.operators._common import load

    (orders,) = load(spark, sf_dir, "orders")
    exact = orders.select(F.countDistinct("o_custkey").alias("d")).first().d
    approx = orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("d")
    ).first().d
    assert abs(approx - exact) / exact < 0.15  # HLL within advertised bounds


def test_percentile_approx_tolerance(spark, sf_dir):
    from kafka_stream_spark.operators._common import load

    (orders,) = load(spark, sf_dir, "orders")
    exact = orders.select(F.expr("percentile(o_totalprice, 0.5)").alias("m")).first().m
    approx = orders.select(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("m")
    ).first().m
    assert abs(approx - exact) / exact < 0.01


def test_hll_sketch_mergeable(spark, sf_dir):
    """Sketches must merge across partitions/time — the streaming-friendly
    cardinality path (hll_sketch_agg + hll_union_agg, Spark 3.5+)."""
    from kafka_stream_spark.operators._common import load

    (events,) = load(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.countDistinct("user_id").alias("exact"),
    )
    merged = per_type.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    ).first().est
    exact_total = events.select(F.countDistinct("user_id")).first()[0]
    assert abs(merged - exact_total) / exact_total < 0.1


def test_cms_never_underestimates(spark, sf_dir):
    """Count-min guarantee: estimate >= true count for every key; with
    150 keys in 256 buckets x 4 rows, the min-over-rows keeps the
    median overcount small."""
    from kafka_stream_spark.operators.analytics_ext import heavy_hitters_cms

    rows = heavy_hitters_cms(spark, sf_dir).collect()
    assert rows
    assert all(r.overcount >= 0 for r in rows)
    exact_sorted = sorted(rows, key=lambda r: (-r.true_count, r.user_id))
    # the heavy end survives sketching: top-5 by estimate contains the
    # true top-1
    top_est = {r.user_id for r in rows[:5]}
    assert exact_sorted[0].user_id in top_est
