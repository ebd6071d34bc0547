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
    strict: bool = False,
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
    until the window would wrap more than half the globe, where the
    fixed grid stops being the right tool: by default the call then
    AUTO-DISPATCHES to :func:`geo_near_join_banded` (same pair set,
    latitude-banded key space); ``strict=True`` keeps the old
    ValueError for callers that pin the fixed-grid plan. The per-row
    ``max_abs_lat`` execution guard is unchanged — only the two
    configuration-time infeasibility cases dispatch. Longitude cells
    wrap at the ±180° antimeridian (the grid must tile the circle:
    ``grid_deg`` has to divide 360), so dateline-straddling pairs are
    found."""
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
            if not strict:
                return geo_near_join_banded(
                    left, right, radius_km, grid_deg=grid_deg,
                    lat=lat, lon=lon,
                )
            raise ValueError(
                f"radius {radius_km} km at |lat| ≤ {max_abs_lat}° spans "
                "every longitude — use geo_near_join_banded"
            )
        lon_deg = math.degrees(math.asin(s))
        dx_range = int(lon_deg / grid_deg) + 1
    if 2 * dx_range + 1 >= nx:
        if not strict:
            return geo_near_join_banded(
                left, right, radius_km, grid_deg=grid_deg, lat=lat, lon=lon
            )
        raise ValueError(
            f"longitude window (±{dx_range} cells of {grid_deg}°) wraps "
            f"past half the globe for radius {radius_km} km at "
            f"|lat| ≤ {max_abs_lat}° — use a coarser grid or "
            "geo_near_join_banded"
        )

    def checked_lat(c: str):
        # domain guard runs JVM-side per row; it feeds the join key, so
        # Catalyst cannot prune it away. Condition is the STRICT exceed
        # test so a NULL latitude falls through to the column (null
        # cell → the equi-join drops the row: absent data, not a
        # silently-missed pair)
        return F.when(
            F.abs(F.col(c)) > max_abs_lat,
            F.raise_error(
                F.format_string(
                    "geo_near_join: |lat|=%s exceeds max_abs_lat="
                    f"{max_abs_lat} — pairs beyond it would be silently "
                    "missed; raise max_abs_lat (widens the window) or "
                    "pre-filter",
                    F.abs(F.col(c)),
                )
            ).cast("double"),
        ).otherwise(F.col(c))

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


def _banded_frames(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    grid_deg: float,
    lat: str,
    lon: str,
    cap_salts: int,
):
    """The banded join's keyed inputs: ``(l, rb)`` ready to equi-join on
    ``["_band", "_cx", "_salt"]``. Split out so tests can assert the
    key-space shape (cap salting, window spans) without re-deriving the
    geometry."""
    import math

    if not 0 < grid_deg <= 90:
        raise ValueError(f"grid_deg={grid_deg} out of range")
    if cap_salts < 1:
        raise ValueError(f"cap_salts={cap_salts} must be >= 1")
    r = radius_km / _EARTH_KM
    if r >= math.pi / 2:
        raise ValueError(f"radius_km={radius_km} is not grid-joinable")
    n_bands = int(math.ceil(180.0 / grid_deg))
    dy_range = int((radius_km / 111.0) / grid_deg) + 1

    # tiny driver-built band table: per band, its lon cell count, the
    # half-width (in cells) of the window that covers the radius there,
    # and the salt fan-out (cap bands only — see geo_near_join_banded)
    rows = []
    for b in range(n_bands):
        lo = b * grid_deg - 90.0
        hi = min(lo + grid_deg, 90.0)
        abs_max = max(abs(lo), abs(hi))
        abs_min = min(abs(lo), abs(hi)) if lo * hi > 0 else 0.0
        nx = max(1, int(360.0 * math.cos(math.radians(abs_min)) / grid_deg))
        s = math.sin(r) / max(math.cos(math.radians(min(abs_max, 90.0))), 1e-12)
        if s >= 1.0:
            span = nx  # polar cap: every longitude is a candidate
            dx_lo = 0
        else:
            width = 360.0 / nx
            dxb = int(math.degrees(math.asin(s)) / width) + 1
            span = min(2 * dxb + 1, nx)
            dx_lo = -dxb if span < nx else 0
        # a full-wrap band collapses to few join keys; salt it so the
        # cap's candidate verify spreads over cap_salts tasks
        nsalt = cap_salts if span == nx else 1
        rows.append((b, nx, dx_lo, span, nsalt))
    spark = left.sparkSession
    bands = spark.createDataFrame(
        rows, "_band int, _nx int, _dx_lo int, _span int, _nsalt int"
    )

    band_of = lambda c: F.least(
        F.floor((F.col(c) + 90.0) / grid_deg).cast("int"), F.lit(n_bands - 1)
    )
    # cell index in a band's own resolution; normalizes any longitude
    cx_in_band = lambda c: (
        (F.floor((F.col(c) + 180.0) * F.col("_nx") / 360.0).cast("int")
         % F.col("_nx")) + F.col("_nx")
    ) % F.col("_nx")

    l = (
        left.withColumnRenamed(lat, "lat_l").withColumnRenamed(lon, "lon_l")
        .withColumn("_dy", F.explode(F.expr(
            f"sequence({-dy_range}, {dy_range})")))
        .withColumn("_band", band_of("lat_l") + F.col("_dy"))
        .filter(F.col("_band").between(0, n_bands - 1))
        .drop("_dy")
        .join(F.broadcast(bands), "_band")
        # contiguous wrapped run of span DISTINCT cells around our own
        .withColumn("_k", F.explode(F.expr("sequence(0, _span - 1)")))
        .withColumn(
            "_cx",
            ((cx_in_band("lon_l") + F.col("_dx_lo") + F.col("_k"))
             % F.col("_nx") + F.col("_nx")) % F.col("_nx"),
        )
        # each left row picks ONE salt (content hash); nsalt is 1
        # outside cap bands, so _salt is 0 there
        .withColumn(
            "_salt",
            F.pmod(F.xxhash64("lat_l", "lon_l"), F.col("_nsalt")).cast("int"),
        )
        .drop("_k", "_dx_lo", "_span", "_nx", "_nsalt")
    )
    rb = (
        right.withColumnRenamed(lat, "lat_r").withColumnRenamed(lon, "lon_r")
        .withColumn("_band", band_of("lat_r"))
        .join(F.broadcast(bands), "_band")
        .withColumn("_cx", cx_in_band("lon_r"))
        # right rows replicate across every salt of their band (k× only
        # inside cap bands), so each left salt still sees the full set
        .withColumn("_salt", F.explode(F.expr("sequence(0, _nsalt - 1)")))
        .withColumn("_salt", F.col("_salt").cast("int"))
        .drop("_dx_lo", "_span", "_nx", "_nsalt")
    )
    return l, rb


def geo_near_join_banded(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    grid_deg: float = 5.0,
    lat: str = "lat",
    lon: str = "lon",
    cap_salts: int = 8,
) -> DataFrame:
    """Globally-complete spatial near-join: latitude-BANDED grid, valid
    for every latitude including the poles (the fixed-window
    :func:`geo_near_join` is tighter per-candidate inside ±55° but
    raises outside its covered domain; this is the operator it points
    callers at).

    Design: latitude is banded into ``grid_deg`` rows; each band gets
    its own longitude cell count ``nx ≈ 360·cos(band)/grid_deg`` so
    cells keep roughly constant PHYSICAL width as the circumference
    shrinks poleward. Per neighbor band, the longitude window is
    derived from the spherical bound asin(sin(R/Re)/cos(band max
    |lat|)); a band whose window would wrap collapses to a single cell
    (the polar cap). Candidate cells per left row are enumerated as a
    contiguous wrapped run of DISTINCT cells, so no pair is produced
    twice. The whole pipeline is JVM expressions: explode to neighbor
    bands, broadcast-join the tiny band table, explode the per-band
    window, equi-join on (band, cell, salt), haversine verify — cost is
    candidate-proportional, never |L|×|R|.

    Polar-cap skew (``cap_salts``): a full-wrap band funnels every row
    within dy_range of a pole onto ONE (band, cell) join key — with
    polar-dense data (icebreaker AIS) that key is a straggler task at
    scale. Cap bands are therefore salted: each left row hashes to one
    of ``cap_salts`` sub-keys and the cap's right rows replicate across
    all of them, spreading the cap verify over ``cap_salts`` tasks for
    a ``cap_salts``× replication of the (small) polar right side. Every
    pair still joins exactly once. Non-cap bands keep a single salt —
    zero overhead on the common path."""
    l, rb = _banded_frames(
        left, right, radius_km, grid_deg, lat, lon, cap_salts
    )
    dist = haversine_km_expr("lat_l", "lon_l", "lat_r", "lon_r")
    return (
        l.join(rb, ["_band", "_cx", "_salt"])
        .withColumn("dist_km", F.round(dist, 6))
        .filter(F.col("dist_km") <= radius_km)
        .drop("_band", "_cx", "_salt")
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


_POLAR_RADIUS_KM = 900.0
_N_CUST_POLAR = 400


@query(
    "geo_near_join_polar",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_coord_duck('plat:c', 'c_custkey', 178_000_000, 89.0)} AS lat_l,
             {_coord_duck('plon:c', 'c_custkey', 360_000_000, 180.0)} AS lon_l
      FROM customer WHERE c_custkey <= {_N_CUST_POLAR}
    ),
    s AS (
      SELECT s_suppkey,
             {_coord_duck('plat:s', 's_suppkey', 178_000_000, 89.0)} AS lat_r,
             {_coord_duck('plon:s', 's_suppkey', 360_000_000, 180.0)} AS lon_r
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
    FROM cand WHERE dist_km <= {_POLAR_RADIUS_KM}
    ORDER BY c_custkey, s_suppkey
    """,
    description=(
        "Globally-complete spatial near-join over full-range latitudes "
        "(±89°): latitude-banded grid with per-band longitude cell "
        "counts and windows, polar caps collapse to one cell — the "
        "fixed-window grid cannot cover this domain. Oracle brute-"
        "forces all pairs, so any band-window miss fails the hash"
    ),
)
def geo_near_join_polar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives :func:`geo_near_join_banded` over md5-placed coordinates
    spanning the whole globe (|lat| ≤ 89°, poles included). The exact
    cross-join oracle makes the driver hash a completeness proof for
    the banded windows, antimeridian wrap, and polar-cap collapse."""
    customer, supplier = load(spark, sf_dir, "customer", "supplier")
    c = customer.filter(F.col("c_custkey") <= _N_CUST_POLAR).select(
        "c_custkey",
        F.expr(_coord_spark("plat:c", "c_custkey", 178_000_000, 89.0)).alias("lat"),
        F.expr(_coord_spark("plon:c", "c_custkey", 360_000_000, 180.0)).alias("lon"),
    )
    s = supplier.select(
        "s_suppkey",
        F.expr(_coord_spark("plat:s", "s_suppkey", 178_000_000, 89.0)).alias("lat"),
        F.expr(_coord_spark("plon:s", "s_suppkey", 360_000_000, 180.0)).alias("lon"),
    )
    return (
        geo_near_join_banded(c, s, _POLAR_RADIUS_KM)
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
