"""OLAP extensions: grouping-sets cubes and scalable range joins.

SURVEY.md §2.5 notes grouping sets / cube / rollup are "free via Catalyst
if we expose SQL" — `cube_revenue` exposes them as a first-class query
(rollup already ships as `rollup_order_status`). SURVEY.md §2.4 notes
theta/range joins are absent from the reference surface; `range_join_tiers`
adds the scale-safe formulation anyway because tier/range enrichment is a
standard streaming-SQL ask (price bands, latency buckets, geo tiles) and
the naive plan — a broadcast nested loop over `lo <= v AND v < hi` — is
exactly the shape that dies at 100 TB when the range table grows.

The bin-decomposition trick: pick a fixed bin width W; replicate each
range row into every W-aligned bin it overlaps; map each fact row to its
single bin; equi-join on the bin and re-check the exact bounds as a
residual. The join becomes a hash join on an integer key — broadcastable
when the (replicated) range side is small, shuffled-hash/SMJ when it
isn't — and never a nested loop. Replication factor is (range span / W),
so W tunes memory-vs-selectivity like any histogram bucket width.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query


@query(
    "cube_revenue",
    oracle="""
    SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
           coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, returnflag, linestatus
    """,
    description=(
        "CUBE over (returnflag, linestatus): all four grouping sets with "
        "grouping_id disambiguation (bit order parity with DuckDB GROUPING)"
    ),
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst expands the cube into an Expand node feeding ONE partial-
    aggregated shuffle — the 4 grouping sets cost one exchange of
    4×groups partial rows, not 4 scans. Grouped-out members are labeled
    'ALL' so a NULL data value can never collide with a subtotal row
    (gid disambiguates regardless)."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .select(
            "gid",
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "revenue",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


# Non-uniform value tiers (lo inclusive, hi exclusive) over events.value
# (observed domain ~0.01–490). The catch-all upper bound is finite so the
# bin replication stays bounded.
_TIERS = [
    ("t1_micro", 0.0, 10.0),
    ("t2_small", 10.0, 50.0),
    ("t3_medium", 50.0, 100.0),
    ("t4_large", 100.0, 200.0),
    ("t5_huge", 200.0, 500.0),
]
_BIN_W = 10.0

_TIERS_VALUES = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _TIERS)


@query(
    "range_join_tiers",
    oracle=f"""
    SELECT t.tier, count(*) AS n_events,
           round(sum(e.value), 2) AS sum_value,
           round(avg(e.value), 6) AS avg_value
    FROM events e
    JOIN (VALUES {_TIERS_VALUES}) t(tier, lo, hi)
      ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    ORDER BY t.tier
    """,
    description=(
        "Range (band) join of events.value against non-uniform tiers via "
        "bin decomposition — equi-join on a W-aligned bin key with the "
        "exact bounds as residual, never a nested loop"
    ),
)
def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tier side explodes into its overlapped W-wide bins (replication
    = span/W rows per tier); each event computes its single bin with one
    integer floor-div. The join is then a plain hash equi-join on `bin`
    with `lo <= v < hi` as residual — BroadcastHashJoin here, and still a
    hash join (not a BroadcastNestedLoop) when the range table outgrows
    broadcast range. Plan-asserted in tests/test_olap_ext.py."""
    (events,) = load(spark, sf_dir, "events")
    tiers = spark.createDataFrame(_TIERS, "tier string, lo double, hi double")
    # bins overlapped by [lo, hi): floor(lo/W) .. floor(hi/W) minus an
    # open-boundary correction when hi lands exactly on a bin edge
    binned_tiers = tiers.select(
        "tier",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BIN_W).cast("long"),
                F.floor(F.col("hi") / _BIN_W).cast("long")
                - F.when(F.col("hi") % _BIN_W == 0, 1).otherwise(0),
            )
        ).alias("bin"),
    )
    facts = events.select(
        "value", F.floor(F.col("value") / _BIN_W).cast("long").alias("bin")
    )
    return (
        facts.join(
            F.broadcast(binned_tiers),
            (facts.bin == binned_tiers.bin)
            & (F.col("value") >= F.col("lo"))
            & (F.col("value") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("tier")
    )


_H_W = 25.0  # histogram bin width over events.value (domain ~0–490)


@query(
    "histogram_values",
    oracle=f"""
    WITH b AS (
      SELECT CAST(floor(value / {_H_W}) AS BIGINT) AS bin FROM events
    ),
    n AS (SELECT count(*) AS total FROM b)
    SELECT bin, CAST(bin * {_H_W} AS DOUBLE) AS lo, count(*) AS n_events,
           round(count(*) * 1.0 / any_value(n.total), 6) AS share
    FROM b CROSS JOIN n
    GROUP BY bin
    ORDER BY bin
    """,
    description=(
        "Fixed-width value histogram (width_bucket shape): bin counts "
        "plus corpus share per bin"
    ),
)
def histogram_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One map-side-combinable groupBy on the bin key (≤ domain/W groups
    at any scale) plus a broadcast 1-row total — the distribution-profiling
    primitive every quality dashboard runs; never a sort, never a
    per-value shuffle."""
    (events,) = load(spark, sf_dir, "events")
    b = events.select(
        F.floor(F.col("value") / _H_W).cast("long").alias("bin")
    )
    total = b.agg(F.count(F.lit(1)).alias("total"))
    return (
        b.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .select(
            "bin",
            (F.col("bin") * _H_W).alias("lo"),
            "n_events",
            F.round(F.col("n_events") / F.col("total"), 6).alias("share"),
        )
        .orderBy("bin")
    )


@query(
    "equidepth_histogram_value",
    oracle="""
    WITH t AS (
      SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS bucket
      FROM events
    )
    SELECT bucket, count(*) AS n,
           round(min(value), 4) AS lo, round(max(value), 4) AS hi,
           round(avg(value), 6) AS mean
    FROM t GROUP BY bucket ORDER BY bucket
    """,
    description=(
        "Equi-depth (decile) histogram over events.value via ntile: "
        "per-bucket count, bounds, and mean — the ANALYZE-style column "
        "statistic"
    ),
)
def equidepth_histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth buckets are rank statistics, so unlike the fixed-width
    histogram (value_histogram_events) they need a total order: one
    global sort exchange, which is exactly what ANALYZE pays. The
    (value, event_id) tie-break keeps ntile deterministic across
    engines. At 100 TB you'd swap ntile for approx_percentile bounds
    (sketch-merged, no global sort) and accept approximate edges.
    """
    from pyspark.sql import Window as W

    (events,) = load(spark, sf_dir, "events")
    t = events.select(
        "value",
        F.ntile(10).over(W.orderBy("value", "event_id")).alias("bucket"),
    )
    return (
        t.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
            F.round(F.avg("value"), 6).alias("mean"),
        )
        .orderBy("bucket")
    )


_BASKET_MIN_SUPPORT = 2
_BASKET_TOPK = 50


@query(
    "part_cooccurrence_lift",
    oracle=f"""
    WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM p),
    freq AS (SELECT l_partkey, count(*) AS n_part FROM p GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_both
      FROM p a JOIN p b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b
      HAVING count(*) >= {_BASKET_MIN_SUPPORT}
    ),
    scored AS (
      SELECT part_a, part_b, n_both,
             round(n_both * 1.0 * o.n / (fa.n_part * fb.n_part), 6) AS lift
      FROM pairs
      JOIN freq fa ON fa.l_partkey = part_a
      JOIN freq fb ON fb.l_partkey = part_b
      CROSS JOIN n_orders o
    )
    SELECT part_a, part_b, n_both, lift
    FROM scored
    ORDER BY lift DESC, part_a, part_b
    LIMIT {_BASKET_TOPK}
    """,
    description=(
        "Market-basket co-occurrence: part pairs sharing orders, scored "
        "by lift (observed / expected-under-independence), min support "
        f"{_BASKET_MIN_SUPPORT}, top {_BASKET_TOPK}"
    ),
    bench=True,
)
def part_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over the fact table. The pair join is keyed on
    the order — its cost is Σ(items-per-order²), bounded by basket
    width (~7), never |parts|². Part frequencies (|parts| rows) and the
    order count (1 row) broadcast back onto the pair aggregate; lift is
    one division of exact integers, rounded before the rank so the
    top-k is engine-stable. The min-support HAVING prunes the long tail
    before any scoring work. At 100 TB this is the A-Priori first pass;
    higher-order itemsets iterate the same join shape on the survivors.
    """
    (lineitem,) = load(spark, sf_dir, "lineitem")
    p = lineitem.select("l_orderkey", "l_partkey").distinct()
    n_orders = p.agg(F.countDistinct("l_orderkey").alias("n"))
    freq = p.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = p.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = p.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= _BASKET_MIN_SUPPORT)
    )
    scored = (
        pairs.join(
            F.broadcast(freq.select(F.col("l_partkey").alias("part_a"),
                                    F.col("n_part").alias("na"))),
            "part_a",
        )
        .join(
            F.broadcast(freq.select(F.col("l_partkey").alias("part_b"),
                                    F.col("n_part").alias("nb"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(F.col("n_both") * F.col("n") / (F.col("na") * F.col("nb")), 6)
            .alias("lift"),
        )
    )
    return (
        scored.orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(_BASKET_TOPK)
    )
