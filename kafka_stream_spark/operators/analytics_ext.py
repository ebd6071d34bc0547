"""Analytics long tail: exact quantiles, pivot, text normalization.

Exact ``percentile`` (interpolated, deterministic from the sorted values)
matches DuckDB's ``quantile_cont`` bit-for-bit, so it's oracle-gated; the
approximate path (``percentile_approx``/``approx_count_distinct``) exists
for the 100 TB case but is engine-specific, so it's covered by tests
against tolerances instead of the hash oracle (sketch outputs differ per
engine by design — see EDBT'23 quantile-sketch survey in PAPERS.md).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "quantiles_orders",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="Exact interpolated quantiles per group (sketch-free baseline)",
)
def quantiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "pivot_event_types",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    description="Pivot: per-user event-type count matrix (explicit value list → no extra pass)",
    bench=True,
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    # explicit values list: Spark skips the distinct-values discovery job
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("user_id")
    )


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           array_to_string(
             list_filter(string_split(lower(text), ' '),
                         x -> x NOT IN ('the', 'a') AND x <> ''),
             ' ') AS normalized,
           len(list_filter(string_split(lower(text), ' '),
                           x -> x NOT IN ('the', 'a') AND x <> '')) AS n_kept
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
    description="Normalization pipeline: lowercase + stopword removal (curation pre-step)",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    kept = F.filter(
        F.split(F.lower("text"), " "),
        lambda x: (~x.isin("the", "a")) & (x != ""),
    )
    return (
        documents.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.array_join(kept, " ").alias("normalized"),
            F.size(kept).alias("n_kept"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# count-min sketch heavy hitters — deterministic md5-hash rows
# ---------------------------------------------------------------------------

_CMS_D = 4    # hash rows
_CMS_W = 256  # buckets per row


def _cms_bucket_spark(d: int) -> str:
    return (
        f"cast(conv(substr(md5(cast(concat('cms{d}:', cast(user_id as string)) "
        f"as binary)), 1, 15), 16, 10) as bigint) % {_CMS_W}"
    )


def _cms_bucket_duck(d: int) -> str:
    return (
        f"(('0x' || substr(md5('cms{d}:' || user_id::VARCHAR), 1, 15))::BIGINT) "
        f"% {_CMS_W}"
    )


@query(
    "heavy_hitters_cms",
    oracle=f"""
    WITH rows_h AS (
      SELECT user_id, d.d,
             CASE d.d {' '.join(f"WHEN {d} THEN {_cms_bucket_duck(d)}" for d in range(_CMS_D))}
             END AS bucket
      FROM events CROSS JOIN (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d) d
    ),
    sketch AS (
      SELECT d, bucket, count(*) AS c FROM rows_h GROUP BY d, bucket
    ),
    probes AS (SELECT DISTINCT user_id FROM events),
    est AS (
      SELECT p.user_id, min(s.c) AS est_count
      FROM probes p
      JOIN rows_h r ON r.user_id = p.user_id
      JOIN sketch s ON s.d = r.d AND s.bucket = r.bucket
      GROUP BY p.user_id
    ),
    exact AS (SELECT user_id, count(*) AS true_count FROM events GROUP BY user_id)
    SELECT e.user_id, e.est_count, x.true_count,
           e.est_count - x.true_count AS overcount
    FROM est e JOIN exact x USING (user_id)
    ORDER BY e.est_count DESC, e.user_id
    LIMIT 20
    """,
    description=(
        "Count-min-sketch heavy hitters: 4 md5 hash rows x 256 buckets, "
        "bucket counts collapse map-side (no key-cardinality shuffle), "
        "estimates = min over rows — deterministic hashes make the whole "
        "sketch oracle-checkable, overcount >= 0 by construction"
    ),
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch path for frequency estimation at 100 TB: the (d,
    bucket) groupBy's input is 4x|events| rows but map-side combine
    collapses each partition to <= d*w = 1024 rows before the wire, so
    the shuffle is O(partitions), independent of key cardinality — the
    property that makes CMS viable where exact per-key counts would
    shuffle the corpus. Estimation joins the (tiny, broadcast) sketch
    back to the probe keys. true_count/overcount audit columns use the
    exact aggregate (fine at probe-set size; the sketch is the part that
    scales).
    """
    from kafka_stream_spark.operators._common import load as _load

    (events,) = _load(spark, sf_dir, "events")
    hashes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.expr(_cms_bucket_spark(d)).alias("bucket"),
                )
                for d in range(_CMS_D)
            ]
        )
    ).alias("h")
    rows_h = events.select("user_id", hashes).select("user_id", "h.d", "h.bucket")
    sketch = rows_h.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))
    probes = rows_h.select("user_id", "d", "bucket").distinct()
    est = (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_count"))
    )
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    return (
        est.join(exact, "user_id")
        .select(
            "user_id", "est_count", "true_count",
            (F.col("est_count") - F.col("true_count")).alias("overcount"),
        )
        .orderBy(F.desc("est_count"), "user_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct — deterministic md5 registers
# ---------------------------------------------------------------------------

_HLL_M = 64  # registers (b = 6 bits); sigma ~ 1.04/sqrt(64) = 13%
# alpha_m * m^2 * 2^55, precomputed ONCE and embedded verbatim in both
# engines so constant folding cannot diverge: the estimate is then a
# single float division by an exact integer.
_HLL_NUM = "1.046802484394006e+20"


@query(
    "approx_distinct_hll",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             (('0x' || substr(md5('hll:' || user_id::VARCHAR), 1, 15))::BIGINT)
               AS hv
      FROM events
    ),
    b AS (SELECT event_type, hv % {_HLL_M} AS bucket, hv // {_HLL_M} AS w FROM h),
    r AS (
      SELECT event_type, bucket,
             max(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS m_j
      FROM b GROUP BY event_type, bucket
    ),
    t AS (
      SELECT event_type, count(*) AS n_present,
             sum(1::BIGINT << (55 - m_j))::BIGINT AS sum_int
      FROM r GROUP BY event_type
    ),
    x AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    ),
    e AS (
      SELECT event_type, n_present, {_HLL_M} - n_present AS v,
             {_HLL_NUM}
               / (sum_int + ({_HLL_M} - n_present) * (1::BIGINT << 55)) AS e_raw
      FROM t
    )
    SELECT e.event_type,
           round(CASE WHEN e_raw <= {2.5 * _HLL_M} AND v > 0
                      THEN {_HLL_M} * ln({_HLL_M}.0 / v) ELSE e_raw END,
                 2) AS hll_estimate,
           x.exact_distinct
    FROM e JOIN x USING (event_type)
    ORDER BY event_type
    """,
    description=(
        "HyperLogLog distinct-user estimate per event type (m=64 md5 "
        "registers, Flajolet small-range correction) next to the exact "
        "count — register math is pure integers so the sketch is "
        "bit-identical across engines"
    ),
)
def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cardinality-sketch path for 100 TB: the register build is a
    groupBy(event_type, bucket) max — map-side combine collapses every
    partition to <= m rows per type before the wire, so the shuffle is
    O(partitions x m), independent of user cardinality (exactly the CMS
    argument, with max-merge instead of sum-merge: registers from
    disjoint micro-batches/partitions merge by element-wise max,
    property-tested). The float path is one division by an exact
    integer plus the ln() correction, both rounded 2dp — no float
    accumulation anywhere (sum of 2^-M terms is done scaled by 2^55 in
    bigint). The exact_distinct audit column is the expensive
    comparison the sketch replaces at scale.
    """
    from kafka_stream_spark.operators._common import load as _load

    (events,) = _load(spark, sf_dir, "events")
    hv = (
        "cast(conv(substr(md5(cast(concat('hll:', cast(user_id as string)) "
        "as binary)), 1, 15), 16, 10) as bigint)"
    )
    b = events.select(
        "event_type",
        F.expr(f"{hv} % {_HLL_M}").alias("bucket"),
        F.expr(f"{hv} div {_HLL_M}").alias("w"),
    )
    r = b.select(
        "event_type",
        "bucket",
        F.expr("CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END").alias("rho"),
    ).groupBy("event_type", "bucket").agg(F.max("rho").alias("m_j"))
    t = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - m_j)")).alias("sum_int"),
    )
    e = t.select(
        "event_type",
        (F.lit(_HLL_M) - F.col("n_present")).alias("v"),
        (
            F.expr(_HLL_NUM)
            / (
                F.col("sum_int")
                + (F.lit(_HLL_M) - F.col("n_present"))
                * F.expr("shiftleft(cast(1 as bigint), 55)")
            )
        ).alias("e_raw"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est = F.when(
        (F.col("e_raw") <= 2.5 * _HLL_M) & (F.col("v") > 0),
        _HLL_M * F.log(F.lit(float(_HLL_M)) / F.col("v")),
    ).otherwise(F.col("e_raw"))
    return (
        e.join(exact, "event_type")
        .select("event_type", F.round(est, 2).alias("hll_estimate"), "exact_distinct")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# dashboard shapes: top-k + OTHER rollup, week-over-week deltas
# ---------------------------------------------------------------------------

_TOPK_OTHER = 3


@query(
    "topk_types_with_other",
    oracle=f"""
    WITH counts AS (
      SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      FROM events GROUP BY event_type
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY n DESC, event_type) AS rk
      FROM counts
    )
    SELECT CASE WHEN rk <= {_TOPK_OTHER} THEN event_type ELSE 'OTHER' END
             AS bucket,
           CAST(sum(n) AS BIGINT) AS n, round(sum(total_value), 2) AS total_value
    FROM ranked
    GROUP BY 1
    ORDER BY n DESC, bucket
    """,
    description=(
        "Top-3 event types by count with the long tail rolled into an "
        "'OTHER' bucket — the dashboard legend shape"
    ),
)
def topk_types_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregate: the corpus-sized groupBy collapses map-side to
    |types| rows, and everything after (rank, OTHER re-bucket, re-agg)
    runs on that tiny intermediate — the second shuffle moves |types|
    rows at any scale. The rank window is a single partition BY DESIGN:
    its input is the aggregated type table, never the corpus."""
    (events,) = load(spark, sf_dir, "events")
    counts = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    w = Window.orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .select(
            F.when(F.col("rk") <= _TOPK_OTHER, F.col("event_type"))
            .otherwise("OTHER")
            .alias("bucket"),
            "n",
            "total_value",
        )
        .groupBy("bucket")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("total_value"), 2).alias("total_value"),
        )
        .orderBy(F.desc("n"), "bucket")
    )


@query(
    "weekly_revenue_wow",
    oracle="""
    WITH weekly AS (
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
             round(sum(o_totalprice), 2) AS revenue,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT week_start, revenue, n_orders,
           lag(revenue) OVER (ORDER BY week_start) AS prev_revenue,
           round(revenue - coalesce(lag(revenue) OVER (ORDER BY week_start), 0), 2)
             AS wow_delta
    FROM weekly
    ORDER BY week_start
    """,
    description=(
        "Weekly revenue with week-over-week deltas via lag over the "
        "aggregated series (Monday-start ISO weeks in both engines)"
    ),
)
def weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lag window is deliberately unpartitioned: its input is the
    weekly aggregate (|weeks| rows at ANY corpus size — a centuries-long
    dataset is a few thousand rows), so the single-partition window is
    the correct plan; the corpus-sized work is the map-side-combinable
    weekly groupBy. Both engines truncate to Monday-start weeks."""
    (orders,) = load(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.to_date(F.date_trunc("week", "o_orderdate")).alias("week_start")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("week_start")
    return (
        weekly.select(
            "week_start",
            "revenue",
            "n_orders",
            F.lag("revenue").over(w).alias("prev_revenue"),
            F.round(
                F.col("revenue") - F.coalesce(F.lag("revenue").over(w), F.lit(0)), 2
            ).alias("wow_delta"),
        )
        .orderBy("week_start")
    )


def hll_hour_registers(events: "DataFrame") -> "DataFrame":
    """(day, hr, bucket, m_j) HLL registers from a (ts, user_id) frame —
    shared by the batch rollup and the streaming register maintainer
    (identical construction, so stream state merges with batch sketches)."""
    hv = (
        "cast(conv(substr(md5(cast(concat('hll:', cast(user_id as string)) "
        "as binary)), 1, 15), 16, 10) as bigint)"
    )
    h = events.select(
        F.to_date("ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hr"),
        F.expr(f"{hv} % {_HLL_M}").alias("bucket"),
        F.expr(f"{hv} div {_HLL_M}").alias("w"),
    )
    return (
        h.select(
            "day",
            "hr",
            "bucket",
            F.expr("CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END").alias(
                "rho"
            ),
        )
        .groupBy("day", "hr", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate_col(n_present, sum_int):
    """Raw-or-corrected HLL estimate from register aggregates (columns)."""
    v = F.lit(_HLL_M) - n_present
    e_raw = F.expr(_HLL_NUM) / (
        sum_int + v * F.expr("shiftleft(cast(1 as bigint), 55)")
    )
    return F.when(
        (e_raw <= 2.5 * _HLL_M) & (v > 0),
        _HLL_M * F.log(F.lit(float(_HLL_M)) / v),
    ).otherwise(e_raw)



@query(
    "hll_window_rollup",
    oracle=f"""
    WITH h AS (
      SELECT CAST(ts AS DATE) AS day, date_trunc('hour', ts) AS hr,
             (('0x' || substr(md5('hll:' || user_id::VARCHAR), 1, 15))::BIGINT)
               AS hv
      FROM events
    ),
    b AS (SELECT day, hr, hv % {_HLL_M} AS bucket, hv // {_HLL_M} AS w FROM h),
    r AS (
      SELECT day, hr, bucket,
             max(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS m_j
      FROM b GROUP BY day, hr, bucket
    ),
    th AS (
      SELECT day, hr, count(*) AS n_present,
             sum(1::BIGINT << (55 - m_j))::BIGINT AS sum_int
      FROM r GROUP BY day, hr
    ),
    eh AS (
      SELECT day, hr, {_HLL_M} - n_present AS v,
             {_HLL_NUM}
               / (sum_int + ({_HLL_M} - n_present) * (1::BIGINT << 55)) AS e_raw
      FROM th
    ),
    esth AS (
      SELECT day, hr,
             CAST(round(CASE WHEN e_raw <= {2.5 * _HLL_M} AND v > 0
                             THEN {_HLL_M} * ln({_HLL_M}.0 / v) ELSE e_raw END
                        * 100, 0) AS BIGINT) AS est_c
      FROM eh
    ),
    sh AS (
      SELECT day, count(*) AS n_hours,
             round(sum(est_c) / 100.0, 2) AS sum_hll_hours
      FROM esth GROUP BY day
    ),
    rd AS (SELECT day, bucket, max(m_j) AS m_j FROM r GROUP BY day, bucket),
    td AS (
      SELECT day, count(*) AS n_present,
             sum(1::BIGINT << (55 - m_j))::BIGINT AS sum_int
      FROM rd GROUP BY day
    ),
    ed AS (
      SELECT day, {_HLL_M} - n_present AS v,
             {_HLL_NUM}
               / (sum_int + ({_HLL_M} - n_present) * (1::BIGINT << 55)) AS e_raw
      FROM td
    ),
    x AS (
      SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS exact_day
      FROM events GROUP BY 1
    )
    SELECT ed.day, sh.n_hours,
           round(CASE WHEN e_raw <= {2.5 * _HLL_M} AND v > 0
                      THEN {_HLL_M} * ln({_HLL_M}.0 / v) ELSE e_raw END,
                 2) AS hll_day,
           sh.sum_hll_hours, x.exact_day
    FROM ed JOIN sh USING (day) JOIN x USING (day)
    ORDER BY ed.day
    """,
    description=(
        "HLL sketch rollup across time windows: hourly user-distinct "
        "registers max-merged into daily estimates (the hypertable/"
        "continuous-aggregate shape), next to the naive sum of hourly "
        "estimates and the exact daily count"
    ),
)
def hll_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch re-aggregation — the property that makes pre-aggregated
    rollups work at 100 TB: registers built once per (hour, bucket) are
    max-merged to any coarser grain without touching raw data again
    (same merge the property test proves for approx_distinct_hll). The
    contrast column sum_hll_hours shows why naive rollups of distinct
    counts are wrong: summing hourly estimates double-counts users
    active in several hours (it overshoots exact_day), while the
    register merge does not. Hourly estimates are fixed to integer
    cents before summing so the sum is order-independent across
    engines.
    """
    from kafka_stream_spark.operators._common import load as _load

    (events,) = _load(spark, sf_dir, "events")
    # the hourly register table IS the stored rollup artifact in a
    # continuous aggregate; cache it so both grains read it, not raw
    # data (asserted: one raw scan for registers, one for the audit)
    r = hll_hour_registers(events).cache()

    def _estimate(t):
        return hll_estimate_col(F.col("n_present"), F.col("sum_int"))

    th = r.groupBy("day", "hr").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - m_j)")).alias("sum_int"),
    )
    esth = th.select(
        "day", F.round(_estimate(th) * 100, 0).cast("bigint").alias("est_c")
    )
    sh = esth.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.round(F.sum("est_c") / 100.0, 2).alias("sum_hll_hours"),
    )
    rd = r.groupBy("day", "bucket").agg(F.max("m_j").alias("m_j"))
    td = rd.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - m_j)")).alias("sum_int"),
    )
    ed = td.select("day", F.round(_estimate(td), 2).alias("hll_day"))
    exact = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("exact_day")
    )
    return (
        ed.join(sh, "day")
        .join(exact, "day")
        .select("day", "n_hours", "hll_day", "sum_hll_hours", "exact_day")
        .orderBy("day")
    )
