"""Spatial near-join (operators/geo.py): haversine exactness, planted
neighbor recall across cell boundaries, and the no-cross-join plan."""

import pyspark.sql.functions as F

from kafka_stream_spark.operators.geo import geo_near_join, haversine_km_expr


def test_haversine_known_distance(spark):
    # NYC → LA ≈ 3936 km (same fixture as the pandas-UDF twin)
    df = spark.createDataFrame(
        [(40.7128, -74.0060, 34.0522, -118.2437)], ["lat_l", "lon_l", "lat_r", "lon_r"]
    )
    km = df.select(
        haversine_km_expr("lat_l", "lon_l", "lat_r", "lon_r").alias("km")
    ).first().km
    assert abs(km - 3936) < 10


def test_planted_pairs_across_cell_boundaries(spark):
    # left point sits just under a 5° cell edge; its true neighbor just
    # over it — the neighbor window must still find the pair
    left = spark.createDataFrame(
        [(1, 4.999, 9.999), (2, 50.0, 100.0)], ["lid", "lat", "lon"]
    )
    right = spark.createDataFrame(
        [
            (10, 5.001, 10.001),   # ~0.3 km from lid=1, next cell in x AND y
            (20, 50.2, 101.0),     # ~75 km from lid=2
            (30, -40.0, -100.0),   # far from everything
        ],
        ["rid", "lat", "lon"],
    )
    got = {
        (r.lid, r.rid)
        for r in geo_near_join(left, right, radius_km=500.0).collect()
    }
    assert got == {(1, 10), (2, 20)}


def test_geo_join_has_no_cross_join(spark):
    left = spark.range(10).select(
        F.col("id").alias("lid"),
        (F.col("id") * 1.0).alias("lat"),
        (F.col("id") * 2.0).alias("lon"),
    )
    right = spark.range(10).select(
        F.col("id").alias("rid"),
        (F.col("id") * 1.1).alias("lat"),
        (F.col("id") * 2.1).alias("lon"),
    )
    plan = geo_near_join(left, right, 100.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
