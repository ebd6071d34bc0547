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

def test_antimeridian_pairs_found(spark):
    # true pairs straddling the ±180° dateline must be found (the grid
    # wraps cell_x modulo the longitude cell count — ADVICE r5)
    l = spark.createDataFrame([(1, 0.0, 179.95)], ["lid", "lat", "lon"])
    r = spark.createDataFrame([(2, 0.0, -179.95)], ["rid", "lat", "lon"])
    got = geo_near_join(l, r, 50.0).collect()
    assert [(x.lid, x.rid) for x in got] == [(1, 2)]
    assert abs(got[0].dist_km - 11.119) < 0.01
    # lon exactly +180 ≡ -180 normalizes through the same wrap
    l2 = spark.createDataFrame([(3, 0.0, 180.0)], ["lid", "lat", "lon"])
    assert [(x.lid, x.rid) for x in geo_near_join(l2, r, 50.0).collect()] == [(3, 2)]


def test_latitude_domain_guard_raises(spark):
    # |lat| beyond max_abs_lat would silently miss pairs — it must RAISE
    # at execution instead (VERDICT r5 item 2)
    import pytest

    bad = spark.createDataFrame([(9, 60.0, 0.0)], ["lid", "lat", "lon"])
    ok = spark.createDataFrame([(2, 0.0, 0.0)], ["rid", "lat", "lon"])
    with pytest.raises(Exception, match="exceeds max_abs_lat"):
        geo_near_join(bad, ok, 50.0).collect()


def test_widened_window_matches_brute_force_at_lat70(spark):
    # max_abs_lat=70 auto-widens dx; the result must equal the exact
    # brute-force haversine cross join over md5-placed points
    import hashlib

    def coords(prefix, n, lat_span):
        rows = []
        for i in range(n):
            h = hashlib.md5(f"{prefix}{i}".encode()).hexdigest()
            la = (int(h[:12], 16) % (2 * lat_span * 1000000)) / 1e6 - lat_span
            lo = (int(h[12:24], 16) % 360000000) / 1e6 - 180.0
            rows.append((i, la, lo))
        return rows

    L = spark.createDataFrame(coords("L", 200, 70), ["lid", "lat", "lon"])
    R = spark.createDataFrame(coords("R", 200, 70), ["rid", "lat", "lon"])
    got = {
        (x.lid, x.rid)
        for x in geo_near_join(L, R, 500.0, max_abs_lat=70.0).collect()
    }
    brute = (
        L.withColumnRenamed("lat", "lat_l").withColumnRenamed("lon", "lon_l")
        .crossJoin(R.withColumnRenamed("lat", "lat_r").withColumnRenamed("lon", "lon_r"))
        .withColumn("d", haversine_km_expr("lat_l", "lon_l", "lat_r", "lon_r"))
        .filter(F.col("d") <= 500.0)
    )
    want = {(x.lid, x.rid) for x in brute.collect()}
    assert got == want and len(got) > 50


def test_config_validation_raises(spark):
    import pytest

    L = spark.createDataFrame([(1, 0.0, 0.0)], ["lid", "lat", "lon"])
    R = spark.createDataFrame([(2, 0.0, 0.0)], ["rid", "lat", "lon"])
    with pytest.raises(ValueError, match="divide 360"):
        geo_near_join(L, R, 500.0, grid_deg=7.0)
    with pytest.raises(ValueError, match="latitude-banded"):
        geo_near_join(L, R, 500.0, max_abs_lat=89.5)
