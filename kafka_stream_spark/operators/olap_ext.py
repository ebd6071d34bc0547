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


_ED_BINS = 128  # fixed-width pre-bins feeding the decile-boundary sketch


@query(
    "equidepth_histogram_value",
    bench=True,
    oracle=f"""
    WITH ext AS (
      SELECT min(value) AS lo, max(value) AS hi, count(*) AS n FROM events
    ),
    binned AS (
      SELECT least(CAST(floor((value - lo) / ((hi - lo) / {_ED_BINS})) AS BIGINT),
                   {_ED_BINS - 1}) AS bin
      FROM events CROSS JOIN ext
    ),
    hist AS (SELECT bin, count(*) AS c FROM binned GROUP BY bin),
    cum AS (
      SELECT bin, c,
             sum(c) OVER (ORDER BY bin) AS cum_c,
             sum(c) OVER (ORDER BY bin) - c AS cum_before
      FROM hist
    ),
    ks AS (SELECT unnest(generate_series(1, 9)) AS k),
    targets AS (SELECT k, CAST(ceil(k * n / 10.0) AS BIGINT) AS target, lo, hi
                FROM ks CROSS JOIN ext),
    covering AS (
      SELECT t.k, t.target, t.lo, t.hi, min(c.bin) AS bin
      FROM targets t JOIN cum c ON c.cum_c >= t.target
      GROUP BY t.k, t.target, t.lo, t.hi
    ),
    bnd AS (
      SELECT v.k,
             round(v.lo + (v.bin + (v.target - c.cum_before) * 1.0 / c.c)
                   * ((v.hi - v.lo) / {_ED_BINS}), 6) AS b
      FROM covering v JOIN cum c ON c.bin = v.bin
    ),
    barr AS (SELECT list(b ORDER BY b) AS bs FROM bnd),
    assigned AS (
      SELECT CAST(1 + len(list_filter(bs, x -> value > x)) AS INTEGER) AS bucket,
             value
      FROM events CROSS JOIN barr
    )
    SELECT bucket, count(*) AS n,
           round(min(value), 4) AS lo, round(max(value), 4) AS hi,
           round(avg(value), 6) AS mean
    FROM assigned GROUP BY bucket ORDER BY bucket
    """,
    description=(
        "Equi-depth (decile) histogram over events.value — boundaries "
        "from the mergeable fixed-bin histogram sketch (no global sort; "
        "the ANALYZE-at-scale plan), rows assigned map-side against the "
        "9 broadcast boundaries; exact=True keeps the ntile baseline"
    ),
)
def equidepth_histogram_value(
    spark: SparkSession, sf_dir: str, exact: bool = False
) -> DataFrame:
    """Round-3 default: the only rank machinery runs over the ≤128-row
    histogram (partial aggregation collapses each partition to ≤128
    rows before any exchange; the cumulative window sorts 128 rows, not
    the corpus). Decile boundary VALUES come from in-bin linear
    interpolation — the same arithmetic as histogram_quantile_sketch,
    6dp-rounded so both engines assign identically — then one map-only
    pass buckets every row against the broadcast boundaries. No global
    sort of events anywhere (plan-asserted: no ntile, no Sort [value).

    ``exact=True`` restores the ntile global-sort baseline ("what
    ANALYZE pays" when exact deciles are demanded); a pytest
    cross-checks sketch bucket populations against it (±2% of n/10 at
    sf0.001)."""
    from pyspark.sql import Window as W

    (events,) = load(spark, sf_dir, "events")
    if exact:
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
    # The boundary machinery operates on a BOUNDED sketch — one extrema
    # row plus a <= 128-row histogram — so it runs driver-side (r7,
    # guide §1.2: the r6 plan spent five broadcast/join/window jobs on a
    # 128-row table; this is the same bounded-collect class as the
    # centroid lists in similarity.py, identical at any corpus size).
    # Arithmetic is replicated exactly: same IEEE-double ops in the same
    # order, and the rounding matches Spark's round(double, 6) exactly —
    # Spark routes a double through BigDecimal.valueOf(d), i.e. HALF_UP
    # on Double.toString's SHORTEST round-tripping decimal repr, NOT on
    # the exact binary expansion; Python's repr(float) is the same
    # shortest-repr algorithm, so Decimal(repr(raw)) reproduces it
    # (Decimal(raw) would take the exact binary double and can round a
    # 7th-digit tie differently — ADVICE r7).
    import math
    from decimal import ROUND_HALF_UP, Decimal

    blo, bhi, n = events.agg(
        F.min("value"), F.max("value"), F.count(F.lit(1))
    ).collect()[0]
    if not n:
        # empty input: no boundaries to derive — skip the driver-side
        # arithmetic (blo/bhi are NULL) and let the groupBy over zero
        # rows yield the same empty result the all-Spark plan returned
        bucket = F.lit(1).cast("int")
    else:
        width = (bhi - blo) / _ED_BINS
        hist_rows = (
            events.select(
                F.least(
                    F.floor((F.col("value") - F.lit(blo)) / F.lit(width)).cast("bigint"),
                    F.lit(_ED_BINS - 1),
                ).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        hist = sorted((r["bin"], r["c"]) for r in hist_rows)
        cum = []
        running = 0
        for b, c in hist:
            cum.append((b, c, running + c, running))  # (bin, c, cum_c, cum_before)
            running += c
        bs = []
        for k in range(1, 10):
            target = math.ceil(k * n / 10.0)
            b, c, _cc, cum_before = next(t for t in cum if t[2] >= target)
            raw = blo + (b + (target - cum_before) * 1.0 / c) * ((bhi - blo) / _ED_BINS)
            bs.append(
                float(Decimal(repr(raw)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))
            )
        bs_sql = ", ".join(f"CAST({v!r} AS DOUBLE)" for v in sorted(bs))
        bucket = (
            F.lit(1) + F.size(F.expr(f"filter(array({bs_sql}), x -> value > x)"))
        ).cast("int")
    assigned = events.select(bucket.alias("bucket"), "value")
    return (
        assigned.groupBy("bucket")
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
    width (~7), never |parts|². Part frequencies (|parts| rows, sized by
    AQE — not hint-forced, the dim is unbounded in |parts|) and the
    order count (1 row, explicit broadcast) join back onto the pair
    aggregate; lift is
    one division of exact integers, rounded before the rank so the
    top-k is engine-stable. The min-support HAVING prunes the long tail
    before any scoring work. At 100 TB this is the A-Priori first pass;
    higher-order itemsets iterate the same join shape on the survivors.
    """
    (lineitem,) = load(spark, sf_dir, "lineitem")
    # ONE pass over the fact table builds the per-order basket (bounded
    # width: TPC-H orders carry <= 7 parts — cap any real feed the same
    # way); the barrier makes the three consumers below (order count,
    # part frequencies, pair counts) re-read |orders| basket rows instead
    # of each re-scanning + re-aggregating the fact table (no
    # ReusedExchange across the branches otherwise). Pairs explode
    # basket-locally with part_a < part_b by construction (sorted set) —
    # half the pair mass the a-join-b formulation shuffled, and two
    # fewer wide exchanges.
    # repartition the RAW (orderkey, partkey) pairs before the basket
    # aggregation: the parquet scan arrives in ~4 row-group tasks, so a
    # scan-side partial collect_set serializes the hash-map CPU onto 4
    # cores and ships the same bytes anyway (partial collect_set barely
    # collapses — orders rarely repeat a part). One keyed exchange of
    # narrow rows + a partition-local agg spreads the work across every
    # core at identical shuffle volume (guide §2.5 input-parallelism;
    # r7 A/B 1.91 -> 1.59 s at sf0.1).
    ncpu = int(spark.conf.get("spark.sql.shuffle.partitions"))
    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .repartition(ncpu, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .localCheckpoint()
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n"))
    freq = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_part"))
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts)), y ->"
                    " struct(x as part_a, y as part_b))))"
                )
            ).alias("e")
        )
        .select("e.part_a", "e.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= _BASKET_MIN_SUPPORT)
    )
    # No broadcast hint on freq: it scales with |parts| (unbounded at
    # 100x part cardinality). AQE sizes the join at runtime and still
    # picks a broadcast when the dim actually fits.
    scored = (
        pairs.join(
            freq.select(F.col("l_partkey").alias("part_a"),
                        F.col("n_part").alias("na")),
            "part_a",
        )
        .join(
            freq.select(F.col("l_partkey").alias("part_b"),
                        F.col("n_part").alias("nb")),
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


@query(
    "benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                         AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    t AS (SELECT sum(n) AS total FROM c)
    SELECT c.digit, c.n,
           round(c.n * 1.0 / t.total, 6) AS observed,
           round(ln(1.0 + 1.0 / c.digit) / ln(10.0), 6) AS benford,
           round(c.n * 1.0 / t.total
                 - ln(1.0 + 1.0 / c.digit) / ln(10.0), 6) AS deviation
    FROM c CROSS JOIN t
    ORDER BY c.digit
    """,
    description=(
        "Benford first-digit audit over order totals: observed leading-"
        "digit shares vs log10(1 + 1/d) with per-digit deviations — the "
        "fabricated-data screen"
    ),
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic forensic screen as one aggregate: first digits come
    from the integer-cents string (no float formatting ambiguity),
    so the digit extraction is byte-identical across engines; the
    Benford expectation is a constant per digit. One scan, one
    9-row group — the whole query is map-side at any scale.
    """
    (orders,) = load(spark, sf_dir, "orders")
    d = orders.where(F.col("o_totalprice") > 0).select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    benford = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("observed"),
            F.round(benford, 6).alias("benford"),
            F.round(F.col("n") / F.col("total") - benford, 6).alias("deviation"),
        )
        .orderBy("digit")
    )


@query(
    "revenue_concentration",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS rk,
             count(*) OVER () AS n,
             sum(cents) OVER () AS total
      FROM c
    ),
    g AS (  -- Gini = (2*sum(rk*cents) - (n+1)*total) / (n*total), exact ints
      SELECT max(n) AS n, max(total) AS total,
             sum(rk * cents) AS weighted
      FROM r
    ),
    shares AS (
      SELECT sum(CASE WHEN rk > n - CAST(floor(n * 0.01) AS BIGINT)
                      THEN cents ELSE 0 END) AS top1,
             sum(CASE WHEN rk > n - CAST(floor(n * 0.10) AS BIGINT)
                      THEN cents ELSE 0 END) AS top10
      FROM r
    )
    SELECT g.n AS n_customers,
           round(g.total / 100.0, 2) AS total_revenue,
           round((2.0 * g.weighted - (g.n + 1.0) * g.total)
                 / (g.n * 1.0 * g.total), 6) AS gini,
           round(s.top1 * 1.0 / g.total, 6) AS top1pct_share,
           round(s.top10 * 1.0 / g.total, 6) AS top10pct_share
    FROM g CROSS JOIN shares s
    """,
    description=(
        "Revenue concentration: Gini coefficient plus top-1%/top-10% "
        "customer revenue shares — exact integer-cents rank arithmetic"
    ),
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality metrics from one rank pass: Gini's closed form over
    sorted values needs only Σ(rank×value), n, and the total — all
    exact BIGINTs (cents × ranks), with the two float divisions at the
    very end. Ranks tie-break on customer id so the statistic is
    engine-stable even with equal revenues. One shuffle to the per-
    customer aggregate, one sort of |customers| rows.
    """
    from pyspark.sql import Window as W

    (orders,) = load(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents")
    )
    r = c.select(
        "cents",
        F.row_number().over(W.orderBy("cents", "o_custkey")).alias("rk"),
    )
    agg = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("total"),
        F.sum(F.col("rk") * F.col("cents")).alias("weighted"),
    )
    shares = (
        r.crossJoin(F.broadcast(agg.select("n")))
        .agg(
            F.sum(
                F.when(
                    F.col("rk") > F.col("n") - F.floor(F.col("n") * 0.01).cast("bigint"),
                    F.col("cents"),
                ).otherwise(0)
            ).alias("top1"),
            F.sum(
                F.when(
                    F.col("rk") > F.col("n") - F.floor(F.col("n") * 0.10).cast("bigint"),
                    F.col("cents"),
                ).otherwise(0)
            ).alias("top10"),
        )
    )
    return (
        agg.crossJoin(F.broadcast(shares))
        .select(
            F.col("n").alias("n_customers"),
            F.round(F.col("total") / 100.0, 2).alias("total_revenue"),
            F.round(
                (2.0 * F.col("weighted") - (F.col("n") + 1.0) * F.col("total"))
                / (F.col("n") * 1.0 * F.col("total")),
                6,
            ).alias("gini"),
            F.round(F.col("top1") / F.col("total"), 6).alias("top1pct_share"),
            F.round(F.col("top10") / F.col("total"), 6).alias("top10pct_share"),
        )
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_pairs():
    return [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]


@query(
    "numeric_correlation_matrix",
    oracle=f"""
    WITH c AS (
      SELECT {", ".join(
          f"CAST(round({c} * 100, 0) AS DECIMAL(38, 0)) AS {c}" for c in _CORR_COLS
      )}
      FROM lineitem
    ),
    s AS (
      SELECT count(*) AS n,
             {", ".join(f"sum({c}) AS s_{c}" for c in _CORR_COLS)},
             {", ".join(f"sum({c} * {c}) AS ss_{c}" for c in _CORR_COLS)},
             {", ".join(f"sum({a} * {b}) AS sp_{a}_{b}" for a, b in _corr_pairs())}
      FROM c
    )
    {" UNION ALL ".join(
        f'''SELECT '{a}' AS col_a, '{b}' AS col_b,
            round((n * sp_{a}_{b} - s_{a} * s_{b})
                  / (sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))
                     * sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE))), 6)
              AS pearson_r
            FROM s''' for a, b in _corr_pairs()
    )}
    ORDER BY col_a, col_b
    """,
    description=(
        "Pearson correlation matrix over the lineitem numeric columns — "
        "moments accumulated as exact DECIMAL(38) integers (cents), so "
        "the statistic is order-independent across engines"
    ),
)
def numeric_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling correlations in ONE aggregate pass: every moment
    (sums, squares, cross-products) accumulates as exact DECIMAL(38,0)
    over integer cents — float summation order can't perturb anything;
    the only doubles are the final 6 divisions. The aggregate is
    map-side combinable and emits a single row of moments; the matrix
    unpivot is driver-scale. Spark's built-in corr() is the convenience
    path — this formulation exists because corr()'s float accumulation
    is partition-order-dependent, which breaks cross-engine parity.
    """
    (lineitem,) = load(spark, sf_dir, "lineitem")
    c = lineitem.select(
        *[
            F.round(F.col(col) * 100, 0).cast("decimal(38,0)").alias(col)
            for col in _CORR_COLS
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(col).alias(f"s_{col}") for col in _CORR_COLS]
    aggs += [
        F.sum(F.col(col) * F.col(col)).alias(f"ss_{col}") for col in _CORR_COLS
    ]
    aggs += [
        F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}") for a, b in _corr_pairs()
    ]
    s = c.agg(*aggs)
    outs = []
    for a, b in _corr_pairs():
        num = F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        da = (F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast(
            "double"
        )
        db = (F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast(
            "double"
        )
        outs.append(
            s.select(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.round(num / (F.sqrt(da) * F.sqrt(db)), 6).alias("pearson_r"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("col_a", "col_b")


@query(
    "grouping_sets_orders",
    oracle="""
    SELECT GROUPING(o_orderpriority, o_orderstatus, yr) AS gid,
           coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(CAST(yr AS VARCHAR), 'ALL') AS year,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM (SELECT o_orderpriority, o_orderstatus,
                 EXTRACT(year FROM o_orderdate) AS yr, o_totalprice
          FROM orders)
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), (yr), ())
    ORDER BY gid, priority, status, year
    """,
    description=(
        "Arbitrary GROUPING SETS (non-hierarchical: priority / status / "
        "year / grand total) in ONE scan+exchange via Catalyst's Expand"
    ),
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four independent dashboards from one pass: unlike CUBE/ROLLUP the
    sets here are NOT hierarchical, which is precisely the case where
    hand-running four GROUP BYs costs four scans. Catalyst's Expand node
    replicates each row once per set (4x) into a single partial-agg
    shuffle — at 100 TB that is one scan + one exchange of pre-combined
    partials instead of four of each. Money is summed in integer cents
    (order-independent, no fp summation drift across engines)."""
    (orders,) = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderpriority",
        "o_orderstatus",
        F.year("o_orderdate").alias("yr"),
        # round BEFORE the bigint cast: DuckDB's double->int cast rounds
        # while Spark's truncates — the explicit round makes both agree
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    return (
        base.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], ["yr"], []],
            "o_orderpriority", "o_orderstatus", "yr",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
        .select(
            "gid",
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("year"),
            "n_orders",
            "total_cents",
        )
        .orderBy("gid", "priority", "status", "year")
    )


_BOM_QTY_SPARK = (
    "cast(conv(substr(md5(cast(concat('bom:', cast(p_partkey as string))"
    " as binary)), 1, 8), 16, 10) as bigint) % 3 + 1"
)
_BOM_ROUNDS = 10  # covers hierarchies to 4^10 parts (fan-out 4 per level)


@query(
    "bom_explosion_parts",
    oracle="""
    WITH RECURSIVE
    edges AS (
      SELECT p_partkey AS child, (p_partkey - 1) // 4 AS parent,
             (('0x' || substr(md5('bom:' || p_partkey::VARCHAR), 1, 8))::BIGINT
              % 3) + 1 AS qty
      FROM part WHERE p_partkey >= 1
    ),
    up(part, anc, mult, depth) AS (
      SELECT p_partkey, p_partkey, CAST(1 AS BIGINT), 0 FROM part
      UNION ALL
      SELECT u.part, e.parent, u.mult * e.qty, u.depth + 1
      FROM up u JOIN edges e ON e.child = u.anc
    )
    SELECT CAST(part AS BIGINT) AS p_partkey,
           CAST(depth AS INTEGER) AS depth,
           CAST(mult AS BIGINT) AS total_qty_mult
    FROM up WHERE anc = 0 ORDER BY p_partkey
    """,
    description=(
        "Recursive hierarchy traversal (BOM explosion): Spark's "
        "fixed-round iterative ancestor join == DuckDB's WITH RECURSIVE "
        "— the arbitrary-depth query family Spark SQL lacks natively"
    ),
)
def bom_explosion_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts explosion over a synthetic 4-ary BOM tree (child k →
    parent (k-1)//4, md5-derived per-edge quantity — the same
    deterministic-synthesis pattern as ``tpch_partsupp``): each part's
    depth and cumulative quantity multiplier up to the root.

    Spark has no recursive CTE; the distributed equivalent is a
    conditional-advance loop: rows that already reached the root pass
    through untouched (left join misses), everyone else climbs one
    level per round. Ten rounds cover 4^10 parts; each round is one
    |parts|-sized hash join + map — total work O(rounds x |parts|),
    the same envelope a recursive engine pays. localCheckpoint per
    round keeps plans linear (sharp edge #10). Multipliers stay exact
    BIGINT (qty ≤ 3, depth ≤ 10 ⇒ ≤ 3^10)."""
    (part,) = load(spark, sf_dir, "part")
    edges = (
        part.where(F.col("p_partkey") >= 1)
        .select(
            F.col("p_partkey").alias("child"),
            F.expr("(p_partkey - 1) div 4").alias("parent"),
            F.expr(_BOM_QTY_SPARK).alias("qty"),
        )
        .localCheckpoint()
    )
    state = part.select(
        F.col("p_partkey").alias("part"),
        F.col("p_partkey").alias("anc"),
        F.lit(1).cast("bigint").alias("mult"),
        F.lit(0).alias("depth"),
    )
    for _ in range(_BOM_ROUNDS):
        state = (
            state.join(edges, state["anc"] == edges["child"], "left")
            .select(
                "part",
                F.coalesce("parent", "anc").alias("anc"),
                F.when(
                    F.col("parent").isNotNull(), F.col("mult") * F.col("qty")
                )
                .otherwise(F.col("mult"))
                .alias("mult"),
                F.when(F.col("parent").isNotNull(), F.col("depth") + 1)
                .otherwise(F.col("depth"))
                .alias("depth"),
            )
            .localCheckpoint()
        )
    return (
        state.filter(F.col("anc") == 0)
        .select(
            F.col("part").alias("p_partkey"),
            F.col("depth").cast("int").alias("depth"),
            F.col("mult").cast("bigint").alias("total_qty_mult"),
        )
        .orderBy("p_partkey")
    )


@query(
    "abc_classification_parts",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
               AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(cents) OVER () AS total,
             count(*) OVER () AS n_total
      FROM rev
    ),
    classed AS (
      SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
                  WHEN cum * 100 <= total * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents, n_total, total
      FROM ranked
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(count(*) * 1.0 / any_value(n_total), 6) AS share_of_parts,
           round(sum(cents) * 1.0 / any_value(total), 6) AS share_of_revenue
    FROM classed
    GROUP BY abc_class
    ORDER BY abc_class
    """,
    description=(
        "ABC/Pareto inventory classification of parts by revenue: class "
        "A carries the first 80% of cumulative revenue, B the next 15%, "
        "C the tail — exact integer cumulative comparisons (cum*100 vs "
        "total*80), one rank pass"
    ),
)
def abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto cut behind every inventory policy (count the few
    parts that earn most of the revenue). One shuffle to the per-part
    aggregate; one global sort of |parts| rows for the cumulative
    window (at 100 TB: range-partitioned sort, the same shape as
    revenue_concentration's rank pass); class boundaries compare exact
    integers so no float cumulative drift can flip a class.
    """
    from pyspark.sql import Window as W

    (lineitem,) = load(spark, sf_dir, "lineitem")
    rev = lineitem.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
            .cast("bigint")
        ).alias("cents")
    )
    wcum = W.orderBy(F.desc("cents"), F.asc("l_partkey")).rowsBetween(
        W.unboundedPreceding, 0
    )
    wall = W.partitionBy()
    ranked = rev.select(
        "cents",
        F.sum("cents").over(wcum).alias("cum"),
        F.sum("cents").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n_total"),
    )
    abc = (
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.select(abc.alias("abc_class"), "cents", "n_total", "total")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.count(F.lit(1)) * 1.0 / F.first("n_total"), 6).alias(
                "share_of_parts"
            ),
            F.round(F.sum("cents") * 1.0 / F.first("total"), 6).alias(
                "share_of_revenue"
            ),
        )
        .orderBy("abc_class")
    )
