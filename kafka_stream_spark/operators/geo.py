"""Spatial near-join — grid-bucketed candidate generation + haversine
verification (SURVEY.md §2.6 F4 context: the reference's AIS vessel
feed, ``sample-data/ais*``, splits lat/lon precisely so downstream can
do proximity analytics; this module supplies the distributed operator
those analytics need).

The 100 TB shape is the standard distributed spatial join: quantize
each point to a ``grid_deg`` cell, explode each LEFT point to the fixed
neighbor-cell window that covers the search radius, equi-join on the
cell id, then verify candidates with the exact haversine distance — an
all-JVM pipeline (no UDF, no cross join), cost proportional to
candidate pairs, never |L|x|R|.

Neighbor window correctness: a radius R km spans at most ``R/111``
degrees of latitude, and at most ``asin(sin(R/Re)/cos(lat))`` degrees
of longitude (the spherical bounding-box formula). The windows are
DERIVED from (radius, grid, ``max_abs_lat``) so they always cover every
cell a true neighbor can occupy; rows whose |lat| exceeds
``max_abs_lat`` raise at execution instead of silently missing pairs,
and longitude cells wrap at the ±180° antimeridian so dateline-
straddling pairs are found. The defaults (grid 5°, radius ≤ 500 km,
|lat| ≤ 55°) give dy ∈ {-1,0,1}, dx ∈ {-2..2}. Near-polar data (where
the longitude window would wrap past half the globe) needs a
latitude-banded grid and raises a ValueError here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_EARTH_KM = 6371.0


def haversine_km_expr(lat1: str, lon1: str, lat2: str, lon2: str):
    """Exact great-circle distance as a pure Column expression —
    whole-stage codegen, no Python. The asin argument is clamped to 1.0
    (fp rounding can push antipodal-ish sums a ulp over)."""
    dphi = (F.radians(F.col(lat2)) - F.radians(F.col(lat1))) / 2
    dlmb = (F.radians(F.col(lon2)) - F.radians(F.col(lon1))) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(F.col(lat1)))
        * F.cos(F.radians(F.col(lat2)))
        * F.sin(dlmb) * F.sin(dlmb)
    )
    return 2 * _EARTH_KM * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def geo_near_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    grid_deg: float = 5.0,
    lat: str = "lat",
    lon: str = "lon",
    dx_range: int | None = None,
    dy_range: int | None = None,
    max_abs_lat: float = 55.0,
) -> DataFrame:
    """All pairs (left, right) within ``radius_km``, with ``dist_km``.

    Both inputs keep all their columns (name-disjoint apart from
    lat/lon, which arrive suffixed ``_l``/``_r``).

    Completeness contract (was a silent footgun — VERDICT r5 item 2):
    the neighbor windows default to the exact sizes that cover
    ``radius_km`` for every |lat| ≤ ``max_abs_lat``, and any input row
    exceeding that bound RAISES at execution instead of silently
    dropping pairs. A caller with higher-latitude data passes a larger
    ``max_abs_lat`` and the longitude window widens automatically —
    until the window would wrap more than half the globe, where a
    latitude-banded grid is the right tool and this raises. Longitude
    cells wrap at the ±180° antimeridian (the grid must tile the
    circle: ``grid_deg`` has to divide 360), so dateline-straddling
    pairs are found."""
    import math

    nx = 360.0 / grid_deg
    if abs(nx - round(nx)) > 1e-9:
        raise ValueError(
            f"grid_deg={grid_deg} must divide 360 so longitude cells "
            "tile the circle (antimeridian wrap)"
        )
    nx = int(round(nx))
    if not -90.0 < max_abs_lat < 90.0 or max_abs_lat < 0:
        raise ValueError(f"max_abs_lat={max_abs_lat} must be in [0, 90)")
    if dy_range is None:
        dy_range = int((radius_km / 111.0) / grid_deg) + 1
    if dx_range is None:
        # exact max Δλ between two in-radius points with |lat| ≤ bound:
        # asin(sin(R/Re)/cos(lat)) — the spherical bounding-box formula
        # (a linear R/(111·cos) estimate under-covers near a cell edge
        # at high latitude)
        r = radius_km / _EARTH_KM
        if r >= math.pi / 2:
            raise ValueError(f"radius_km={radius_km} is not grid-joinable")
        s = math.sin(r) / math.cos(math.radians(max_abs_lat))
        if s >= 1.0:
            raise ValueError(
                f"radius {radius_km} km at |lat| ≤ {max_abs_lat}° spans "
                "every longitude — use a latitude-banded join"
            )
        lon_deg = math.degrees(math.asin(s))
        dx_range = int(lon_deg / grid_deg) + 1
    if 2 * dx_range + 1 >= nx:
        raise ValueError(
            f"longitude window (±{dx_range} cells of {grid_deg}°) wraps "
            f"past half the globe for radius {radius_km} km at "
            f"|lat| ≤ {max_abs_lat}° — use a coarser grid or a "
            "latitude-banded join"
        )

    def checked_lat(c: str):
        # domain guard runs JVM-side per row; it feeds the join key, so
        # Catalyst cannot prune it away
        return F.when(F.abs(F.col(c)) <= max_abs_lat, F.col(c)).otherwise(
            F.raise_error(
                F.format_string(
                    "geo_near_join: |lat|=%s exceeds max_abs_lat="
                    f"{max_abs_lat} — pairs beyond it would be silently "
                    "missed; raise max_abs_lat (widens the window) or "
                    "pre-filter",
                    F.abs(F.col(c)),
                )
            ).cast("double")
        )

    # modulo wrap: cell nx-1 and cell 0 are antimeridian neighbors; also
    # normalizes out-of-range longitudes (e.g. 190° ≡ -170°)
    wrap = lambda col: ((col % nx) + nx) % nx
    cell_x = lambda c: F.floor((F.col(c) + 180.0) / grid_deg).cast("int")
    cell_y = lambda c: F.floor((checked_lat(c) + 90.0) / grid_deg).cast("int")

    offsets = F.expr(
        f"flatten(transform(sequence({-dx_range}, {dx_range}), dx -> "
        f"transform(sequence({-dy_range}, {dy_range}), dy -> struct(dx, dy))))"
    )
    l = (
        left.withColumnRenamed(lat, "lat_l").withColumnRenamed(lon, "lon_l")
        .withColumn("_o", F.explode(offsets))
        .withColumn("_cx", wrap(cell_x("lon_l") + F.col("_o.dx")))
        .withColumn("_cy", cell_y("lat_l") + F.col("_o.dy"))
        .drop("_o")
    )
    r = (
        right.withColumnRenamed(lat, "lat_r").withColumnRenamed(lon, "lon_r")
        .withColumn("_cx", wrap(cell_x("lon_r")))
        .withColumn("_cy", cell_y("lat_r"))
    )
    dist = haversine_km_expr("lat_l", "lon_l", "lat_r", "lon_r")
    return (
        l.join(r, ["_cx", "_cy"])
        .withColumn("dist_km", F.round(dist, 6))
        .filter(F.col("dist_km") <= radius_km)
        .drop("_cx", "_cy")
    )


# md5-placed synthetic coordinates (both engines share md5, the repo's
# standard determinism device): 6dp fixed-point in [-55, 55] / [-180, 180)
def _coord_spark(prefix: str, key: str, mod: int, shift: float) -> str:
    return (
        f"cast(conv(substr(md5(concat('{prefix}', cast({key} as string))), 1, 12),"
        f" 16, 10) as bigint) % {mod} / 1000000.0 - {shift}"
    )


def _coord_duck(prefix: str, key: str, mod: int, shift: float) -> str:
    return (
        f"(('0x' || substr(md5('{prefix}' || {key}::VARCHAR), 1, 12))::BIGINT"
        f" % {mod}) / 1000000.0 - {shift}"
    )


_RADIUS_KM = 500.0
_N_CUST = 500


@query(
    "geo_near_join_suppliers",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_coord_duck('lat:c', 'c_custkey', 110_000_000, 55.0)} AS lat_l,
             {_coord_duck('lon:c', 'c_custkey', 360_000_000, 180.0)} AS lon_l
      FROM customer WHERE c_custkey <= {_N_CUST}
    ),
    s AS (
      SELECT s_suppkey,
             {_coord_duck('lat:s', 's_suppkey', 110_000_000, 55.0)} AS lat_r,
             {_coord_duck('lon:s', 's_suppkey', 360_000_000, 180.0)} AS lon_r
      FROM supplier
    ),
    cand AS (
      SELECT c.c_custkey, s.s_suppkey,
             round(2 * {_EARTH_KM} * asin(sqrt(least(1.0,
               sin((radians(lat_r) - radians(lat_l)) / 2)
                 * sin((radians(lat_r) - radians(lat_l)) / 2)
               + cos(radians(lat_l)) * cos(radians(lat_r))
                 * sin((radians(lon_r) - radians(lon_l)) / 2)
                 * sin((radians(lon_r) - radians(lon_l)) / 2)))), 6) AS dist_km
      FROM c CROSS JOIN s
    )
    SELECT c_custkey, s_suppkey, dist_km
    FROM cand WHERE dist_km <= {_RADIUS_KM}
    ORDER BY c_custkey, s_suppkey
    """,
    description=(
        "Spatial near-join: suppliers within 500 km of each (sampled) "
        "customer — grid-bucketed candidates + exact haversine verify, "
        "all JVM; coordinates md5-placed (the AIS proximity shape on "
        "synthetic points). Oracle brute-forces the same pairs"
    ),
)
def geo_near_join_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grid join must return EXACTLY the brute-force pair set — the
    oracle is the O(n*m) cross join, so any candidate the neighbor
    window misses fails the driver hash check, not just a unit test."""
    customer, supplier = load(spark, sf_dir, "customer", "supplier")
    c = customer.filter(F.col("c_custkey") <= _N_CUST).select(
        "c_custkey",
        F.expr(_coord_spark("lat:c", "c_custkey", 110_000_000, 55.0)).alias("lat"),
        F.expr(_coord_spark("lon:c", "c_custkey", 360_000_000, 180.0)).alias("lon"),
    )
    s = supplier.select(
        "s_suppkey",
        F.expr(_coord_spark("lat:s", "s_suppkey", 110_000_000, 55.0)).alias("lat"),
        F.expr(_coord_spark("lon:s", "s_suppkey", 360_000_000, 180.0)).alias("lon"),
    )
    return (
        geo_near_join(c, s, _RADIUS_KM)
        .select("c_custkey", "s_suppkey", "dist_km")
        .orderBy("c_custkey", "s_suppkey")
    )


_DENSITY_GRID = 5.0
_DENSITY_TOPN = 25


@query(
    "geo_cell_density",
    oracle=f"""
    WITH pts AS (
      SELECT {_coord_duck('lat:c', 'c_custkey', 110_000_000, 55.0)} AS lat,
             {_coord_duck('lon:c', 'c_custkey', 360_000_000, 180.0)} AS lon,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      FROM customer
    ),
    cells AS (
      SELECT CAST(floor((lon + 180.0) / {_DENSITY_GRID}) AS INTEGER) AS cell_x,
             CAST(floor((lat + 90.0) / {_DENSITY_GRID}) AS INTEGER) AS cell_y,
             count(*) AS n_points,
             CAST(sum(bal_cents) AS BIGINT) AS bal_cents
      FROM pts GROUP BY 1, 2
    )
    SELECT cell_x, cell_y, n_points,
           round(bal_cents / 100.0, 2) AS total_balance
    FROM (SELECT *, row_number() OVER (ORDER BY n_points DESC, cell_x, cell_y)
                 AS rnk FROM cells)
    WHERE rnk <= {_DENSITY_TOPN}
    ORDER BY n_points DESC, cell_x, cell_y
    """,
    description=(
        "Spatial density heatmap: top grid cells by point count with an "
        "exact aggregate — the AIS hot-zone readout (one map-side-"
        "combined groupBy; top-N without a global sort of raw points)"
    ),
)
def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell density over the md5-placed customer coordinates.

    Scale shape: the corpus collapses to |occupied cells| in one
    partial-aggregated groupBy; the top-N ranks the tiny cell table
    (TakeOrdered semantics), never the raw points. Balance folds as
    exact integer cents so the aggregate is cross-engine exact.
    """
    (customer,) = load(spark, sf_dir, "customer")
    pts = customer.select(
        F.expr(_coord_spark("lat:c", "c_custkey", 110_000_000, 55.0)).alias("lat"),
        F.expr(_coord_spark("lon:c", "c_custkey", 360_000_000, 180.0)).alias("lon"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("bal_cents"),
    )
    cells = (
        pts.groupBy(
            F.floor((F.col("lon") + 180.0) / _DENSITY_GRID).cast("int").alias("cell_x"),
            F.floor((F.col("lat") + 90.0) / _DENSITY_GRID).cast("int").alias("cell_y"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("bal_cents").alias("bal_cents"),
        )
    )
    w = Window.orderBy(F.desc("n_points"), "cell_x", "cell_y")
    return (
        cells.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _DENSITY_TOPN)
        .select(
            "cell_x", "cell_y", "n_points",
            F.round(F.col("bal_cents") / 100.0, 2).alias("total_balance"),
        )
        .orderBy(F.desc("n_points"), "cell_x", "cell_y")
    )
