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
    with pytest.raises(ValueError, match="geo_near_join_banded"):
        geo_near_join(L, R, 500.0, max_abs_lat=89.5, strict=True)


def test_infeasible_fixed_grid_auto_dispatches_to_banded(spark):
    # a configuration whose longitude window would wrap past half the
    # globe dispatches to the banded operator by default (strict=True
    # keeps the old ValueError) — same pair set, polar-safe key space
    L = spark.createDataFrame(
        [(1, 89.5, 10.0), (2, 0.0, 0.0)], ["lid", "lat", "lon"]
    )
    R = spark.createDataFrame(
        [(3, 89.7, -170.0), (4, 0.1, 0.1)], ["rid", "lat", "lon"]
    )
    got = {
        (x.lid, x.rid)
        for x in geo_near_join(L, R, 500.0, max_abs_lat=89.9).collect()
    }
    # polar pair (≈60 km apart across the cap) and equator pair both found
    assert got == {(1, 3), (2, 4)}

def test_banded_join_matches_brute_force_globally(spark):
    # full-globe md5-placed points PLUS planted polar / antimeridian
    # clusters: the banded join must return exactly the brute-force
    # pair set, with no duplicates, at multiple radii
    import collections
    import hashlib

    from kafka_stream_spark.operators.geo import geo_near_join_banded

    def coords(prefix, n):
        rows = []
        for i in range(n):
            h = hashlib.md5(f"{prefix}{i}".encode()).hexdigest()
            la = (int(h[:12], 16) % 178000000) / 1e6 - 89.0
            lo = (int(h[12:24], 16) % 360000000) / 1e6 - 180.0
            rows.append((i, la, lo))
        extra = [
            (n, 89.5, 10.0), (n + 1, 89.7, -170.0), (n + 2, 89.9, 120.0),
            (n + 3, -89.5, 55.0), (n + 4, -89.8, -125.0),
            (n + 5, 70.0, 179.9), (n + 6, 70.1, -179.8),
            (n + 7, 0.0, 179.95), (n + 8, 0.05, -179.9),
        ]
        return rows + extra

    L = spark.createDataFrame(coords("L", 150), ["lid", "lat", "lon"])
    R = spark.createDataFrame(coords("R", 150), ["rid", "lat", "lon"])
    brute_all = (
        L.withColumnRenamed("lat", "lat_l").withColumnRenamed("lon", "lon_l")
        .crossJoin(R.withColumnRenamed("lat", "lat_r").withColumnRenamed("lon", "lon_r"))
        .withColumn("d", haversine_km_expr("lat_l", "lon_l", "lat_r", "lon_r"))
    )
    for radius in (200.0, 1500.0):
        allp = [
            (x.lid, x.rid)
            for x in geo_near_join_banded(L, R, radius).collect()
        ]
        want = {
            (x.lid, x.rid)
            for x in brute_all.filter(F.col("d") <= radius).collect()
        }
        assert set(allp) == want
        assert not [k for k, v in collections.Counter(allp).items() if v > 1]
    # polar cluster actually pairs (sanity that the caps collapse)
    polar = {
        (x.lid, x.rid)
        for x in geo_near_join_banded(L, R, 200.0).collect()
        if x.lid >= 150 and x.rid >= 150
    }
    assert (150, 151) in polar or (151, 150) in polar or len(polar) > 0


def test_banded_join_plan_is_equi_join(spark):
    # band table joins broadcast; pair generation stays an equi-join —
    # no cartesian/nested-loop anywhere
    from kafka_stream_spark.operators.geo import geo_near_join_banded

    L = spark.range(50).select(
        F.col("id").alias("lid"),
        (F.col("id") % 178 - 89.0).alias("lat"),
        (F.col("id") % 360 - 180.0).alias("lon"),
    )
    R = spark.range(50).select(
        F.col("id").alias("rid"),
        (F.col("id") % 178 - 89.0).alias("lat"),
        (F.col("id") % 360 - 180.0).alias("lon"),
    )
    plan = (
        geo_near_join_banded(L, R, 500.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the tiny band table broadcasts

def test_null_coordinates_drop_not_raise(spark):
    # a NULL latitude is absent data, not a silently-missed pair: the
    # row drops through the null join key instead of tripping the guard
    L = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, None, 10.0)], "lid int, lat double, lon double"
    )
    R = spark.createDataFrame(
        [(9, 0.1, 0.1)], "rid int, lat double, lon double"
    )
    got = [(x.lid, x.rid) for x in geo_near_join(L, R, 100.0).collect()]
    assert got == [(1, 9)]

def test_banded_join_property_random_radius_and_grid(spark):
    # randomized completeness: for any (radius, grid) in the supported
    # envelope, banded == brute force on md5-placed full-globe points
    import hashlib

    from kafka_stream_spark.operators.geo import geo_near_join_banded

    def pts(prefix, n, salt):
        rows = []
        for i in range(n):
            h = hashlib.md5(f"{salt}:{prefix}{i}".encode()).hexdigest()
            la = (int(h[:12], 16) % 178000000) / 1e6 - 89.0
            lo = (int(h[12:24], 16) % 360000000) / 1e6 - 180.0
            rows.append((i, la, lo))
        return rows

    cases = [(73.0, 3.0), (340.0, 10.0), (977.0, 5.0), (2450.0, 9.0),
             (5200.0, 15.0)]
    for salt, (radius, grid) in enumerate(cases):
        L = spark.createDataFrame(pts("L", 60, salt), ["lid", "lat", "lon"])
        R = spark.createDataFrame(pts("R", 60, salt), ["rid", "lat", "lon"])
        got = {
            (x.lid, x.rid)
            for x in geo_near_join_banded(L, R, radius, grid_deg=grid).collect()
        }
        brute = (
            L.withColumnRenamed("lat", "lat_l").withColumnRenamed("lon", "lon_l")
            .crossJoin(
                R.withColumnRenamed("lat", "lat_r").withColumnRenamed("lon", "lon_r")
            )
            .withColumn("d", haversine_km_expr("lat_l", "lon_l", "lat_r", "lon_r"))
            .filter(F.col("d") <= radius)
        )
        want = {(x.lid, x.rid) for x in brute.collect()}
        assert got == want, (radius, grid, len(got - want), len(want - got))


def test_polar_cap_salting_spreads_join_key(spark):
    # every row within dy_range of a pole lands in a full-wrap (cap)
    # band whose window collapses to few cells — at 100 TB with
    # polar-dense data that (band, cell) key is ONE straggler task.
    # Cap bands are salted: left rows hash across cap_salts sub-keys,
    # right rows replicate over all of them (VERDICT r6 item 2).
    from kafka_stream_spark.operators.geo import (
        _banded_frames,
        geo_near_join_banded,
    )

    polar = [(i, 89.0 + (i % 90) / 100.0, float(i * 4 % 360) - 180.0)
             for i in range(200)]
    L = spark.createDataFrame(polar, ["lid", "lat", "lon"])
    R = spark.createDataFrame(
        [(i + 1000, la, lo) for i, la, lo in polar], ["rid", "lat", "lon"]
    )
    l, rb = _banded_frames(L, R, 300.0, 5.0, "lat", "lon", 8)
    # the top band (89-90°) is a cap: left spreads over >1 salt …
    cap_band = 35  # floor((89+90)/5) with grid 5° → band 35 (85..90°)
    lsalts = {
        r._salt for r in l.filter(F.col("_band") == cap_band)
        .select("_salt").distinct().collect()
    }
    assert len(lsalts) > 1 and lsalts <= set(range(8))
    # … and every cap right row replicates across ALL 8 salts
    rsalts = {
        r._salt for r in rb.filter(F.col("_band") == cap_band)
        .select("_salt").distinct().collect()
    }
    assert rsalts == set(range(8))
    # non-cap bands keep exactly one salt (no overhead off the caps):
    # band 34 (80..85°) is the left rows' non-cap dy-neighbor
    mid = l.filter(F.col("_band") == 34).select("_salt").distinct().collect()
    assert [r._salt for r in mid] == [0]

    # results under salting are still the exact brute-force pair set
    import collections

    brute = (
        L.withColumnRenamed("lat", "lat_l").withColumnRenamed("lon", "lon_l")
        .crossJoin(
            R.withColumnRenamed("lat", "lat_r").withColumnRenamed("lon", "lon_r")
        )
        .withColumn("d", haversine_km_expr("lat_l", "lon_l", "lat_r", "lon_r"))
    )
    want = {(x.lid, x.rid) for x in brute.filter(F.col("d") <= 300.0).collect()}
    got = [
        (x.lid, x.rid)
        for x in geo_near_join_banded(L, R, 300.0, cap_salts=8).collect()
    ]
    assert set(got) == want
    assert not [k for k, v in collections.Counter(got).items() if v > 1]
