"""Time-series analytics over the events stream (SURVEY.md §2.6 W3 —
analytic functions with frames; §2.9 T1 event-time semantics).

Three shapes a monitoring/feature-engineering user runs on keyed,
timestamped topics (the reference's datasets are exactly this shape —
``sample-data/variables.env:3-10``; Lenses SQL exposes analytic windows
as **[component]** capability, ``README.md:41-43``):

- **rolling stats**: trailing event-time RANGE frame (last hour) per key
  — the "requests in the last N minutes" feature every dashboard needs.
- **z-score outliers**: per-type standardized deviation, top-k most
  anomalous events (round-before-rank for cross-engine determinism).
- **SCD2 intervals**: collapse an event stream into slowly-changing-
  dimension validity ranges ``[valid_from, valid_to)`` — the batch
  materialization of a changelog (same duality as A5 latest-by-key,
  but keeping full history instead of only the head).

Scale notes: each query costs exactly ONE shuffle on its partition key
(user_id / event_type); every window function and the final aggregate
run inside that partitioning. Timestamps stay µs-exact (events ns → µs
truncation per ``functions/time.py``); durations are never emitted
(engines disagree on sub-second boundary counting — NOTES.md #11).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

# Trailing-hour frame in µs: both engines include rows with
# ts' >= ts - 1h (RANGE ... PRECEDING AND CURRENT ROW is inclusive).
_HOUR_US = 3_600_000_000


@query(
    "rolling_stats_events",
    oracle="""
    SELECT event_id, user_id, ts,
           count(*) OVER w AS n_1h,
           round(avg(value) OVER w, 6) AS avg_value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    description=(
        "Trailing 1-hour rolling count/avg per user via an event-time "
        "RANGE frame (peers with equal ts share the frame in both engines)"
    ),
    bench=True,
)
def rolling_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on user_id; the RANGE frame is evaluated over the
    in-partition sort, so a 100 TB stream costs a single exchange and a
    per-key sorted scan. The frame bound is expressed on exact integer
    µs (``unix_micros``) — never float seconds — so the Spark frame and
    DuckDB's INTERVAL frame admit identical row sets."""
    (events,) = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_HOUR_US, 0)
    )
    return (
        events.withColumn(
            "ts_us", F.expr("unix_micros(cast(ts as timestamp))")
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.avg("value").over(w), 6).alias("avg_value_1h"),
        )
        .orderBy("event_id")
    )


_TOPK_PER_TYPE = 10


@query(
    "zscore_outlier_events",
    oracle=f"""
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_id, e.user_id, e.event_type,
             round((e.value - s.mu) / s.sd, 4) AS zscore
      FROM events e JOIN stats s ON e.event_type = s.event_type
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(zscore) DESC, event_id)
                AS rank_in_type
      FROM z
    )
    SELECT event_type, rank_in_type, event_id, user_id, zscore
    FROM r WHERE rank_in_type <= {_TOPK_PER_TYPE}
    ORDER BY event_type, rank_in_type
    """,
    description=(
        "Per-type z-score anomaly top-k: standardize value against the "
        "type's mean/stddev, rank by |z| (round-before-rank, event_id "
        "tiebreak) and keep the 10 most anomalous per type"
    ),
)
def zscore_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-type stats table is |event_types| rows — broadcast back to
    the stream, so the standardization pass never shuffles the fact side;
    the only full exchange is the rank's partitionBy(event_type). The
    z-score is rounded to 4dp BEFORE ranking (house rule: round-before-
    rank) so sub-ulp stddev differences between engines cannot reorder
    the top-k; remaining ties break on event_id."""
    (events,) = load(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = events.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "user_id",
        "event_type",
        F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4).alias("zscore"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("zscore")).desc(), F.col("event_id")
    )
    return (
        z.withColumn("rank_in_type", F.row_number().over(w))
        .filter(F.col("rank_in_type") <= _TOPK_PER_TYPE)
        .select("event_type", "rank_in_type", "event_id", "user_id", "zscore")
        .orderBy("event_type", "rank_in_type")
    )


@query(
    "scd2_user_state",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type AS state, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events
    ),
    changes AS (
      SELECT user_id, state, ts FROM o
      WHERE prev_state IS NULL OR state <> prev_state
    )
    SELECT user_id, state,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS version
    FROM changes
    ORDER BY user_id, version
    """,
    description=(
        "SCD2 builder: collapse each user's event-type stream into "
        "validity intervals [valid_from, valid_to) — consecutive "
        "duplicates merged via lag, interval ends via lead, open "
        "interval (valid_to NULL) for the current state"
    ),
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The changelog→dimension materialization (Kafka log-compaction kept
    WITH history — SURVEY.md §2.5 A5's sibling). One shuffle on user_id:
    the lag-collapse, the lead, and the version number all run in the
    same partitioning, and the change-row intermediate is a small
    fraction of the input (only state transitions survive)."""
    (events,) = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.select(
            "user_id",
            F.col("event_type").alias("state"),
            "ts",
            "event_id",
            F.lag("event_type").over(wo).alias("prev_state"),
        )
        .filter(F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state")))
    )
    wc = Window.partitionBy("user_id").orderBy("ts")
    return (
        changes.select(
            "user_id",
            "state",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(wc).alias("valid_to"),
            F.row_number().over(wc).alias("version"),
        )
        .orderBy("user_id", "version")
    )


_DECAY_HALFLIFE_DAYS = 3.0


@query(
    "trending_decayed_topk",
    oracle=f"""
    WITH mx AS (SELECT max(ts) AS t_max FROM events),
    term AS (
      SELECT event_type,
             CAST(round(pow(2.0,
                    -(epoch_us(m.t_max) - epoch_us(e.ts))
                      / ({_DECAY_HALFLIFE_DAYS} * 86400000000.0))
                  * 1000000, 0) AS BIGINT) AS w_u
      FROM events e CROSS JOIN mx m
    )
    SELECT event_type,
           count(*) AS n_events,
           round(sum(w_u) / 1000000.0, 4) AS decayed_count,
           round(sum(w_u) * 1.0 / count(*) / 1000000.0, 6) AS freshness
    FROM term
    GROUP BY event_type
    ORDER BY decayed_count DESC, event_type
    """,
    description=(
        "Exponentially time-decayed event counts per type (half-life 3 "
        "days): the trending score that forgets old traffic, with the "
        "freshness ratio (decayed/raw) alongside"
    ),
)
def trending_decayed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decayed counting — the leaderboard that doesn't need windows or
    state resets: each event contributes 2^(-age/halflife), so scores
    halve every 3 days of silence and a SINGLE number per key maintains
    the whole history (streaming: fold new events and multiply the old
    score by the elapsed decay — O(1) state). Per-event weights are
    fixed to integer micro-units before summing (float addition is
    order-sensitive; integer sums aren't), and ages are exact integer
    microseconds.
    """
    (events,) = load(spark, sf_dir, "events")
    t_max = events.agg(F.max("ts").alias("t_max"))
    hl_us = _DECAY_HALFLIFE_DAYS * 86400000000.0
    term = events.crossJoin(F.broadcast(t_max)).select(
        "event_type",
        F.round(
            F.pow(
                F.lit(2.0),
                -(
                    F.unix_micros(F.col("t_max").cast("timestamp"))
                    - F.unix_micros(F.col("ts").cast("timestamp"))
                )
                / hl_us,
            )
            * 1000000,
            0,
        )
        .cast("bigint")
        .alias("w_u"),
    )
    return (
        term.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("w_u") / 1000000.0, 4).alias("decayed_count"),
            F.round(
                F.sum("w_u") / F.count(F.lit(1)) / 1000000.0, 6
            ).alias("freshness"),
        )
        .orderBy(F.desc("decayed_count"), "event_type")
    )


@query(
    "heatmap_hour_value",
    oracle="""
    WITH t AS (
      SELECT extract(hour FROM ts) AS hour_of_day,
             ntile(10) OVER (ORDER BY value, event_id) AS value_decile
      FROM events
    )
    SELECT hour_of_day, value_decile, count(*) AS n
    FROM t GROUP BY hour_of_day, value_decile
    ORDER BY hour_of_day, value_decile
    """,
    description=(
        "2D dashboard heatmap: event counts per (hour-of-day, "
        "value-decile) cell — activity-vs-magnitude at a glance"
    ),
)
def heatmap_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2D binning behind a heatmap tile: one rank pass for the value
    deciles (deterministic (value, event_id) tie-break), one groupBy
    over at most 24x10 cells. At 100 TB the decile edges come from
    approx_percentile instead of ntile (same trade as
    equidepth_histogram_value) and the cell aggregation is unchanged.
    """
    from pyspark.sql import Window as W

    (events,) = load(spark, sf_dir, "events")
    t = events.select(
        F.hour("ts").alias("hour_of_day"),
        F.ntile(10).over(W.orderBy("value", "event_id")).alias("value_decile"),
    )
    return (
        t.groupBy("hour_of_day", "value_decile")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("hour_of_day", "value_decile")
    )


_LAG_BUCKET_HOURS = 6


@query(
    "conversion_lag_histogram",
    oracle=f"""
    WITH v AS (
      SELECT user_id, ts AS vts, event_id AS vid FROM events
      WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, ts AS pts, event_id AS pid FROM events
      WHERE event_type = 'purchase'
    ),
    lag_min AS (
      SELECT pid,
             min(epoch_us(p2.pts) - epoch_us(v2.vts)) AS lag_us
      FROM p p2 JOIN v v2 ON p2.user_id = v2.user_id AND v2.vts <= p2.pts
      GROUP BY pid
    )
    SELECT CAST(lag_us // ({_LAG_BUCKET_HOURS} * 3600000000) AS BIGINT)
             AS bucket_{_LAG_BUCKET_HOURS}h,
           count(*) AS n_purchases
    FROM lag_min
    GROUP BY 1 ORDER BY 1
    """,
    description=(
        "View-to-purchase conversion lag histogram: time from the "
        "nearest prior view, bucketed in 6-hour integer-microsecond "
        "bins (duration math stays exact-integer for engine parity)"
    ),
)
def conversion_lag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution. Durations are emitted only as
    integer-µs bucket ids (NOTES rule: engines disagree on sub-second
    duration SEMANTICS, but epoch-µs subtraction and integer floor-div
    are exact everywhere). The view⋈purchase join is user-keyed with
    the time bound as residual; per-purchase minimization is one
    map-side-combinable agg.
    """
    (events,) = load(spark, sf_dir, "events")
    v = events.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    lag_us = F.unix_micros(F.col("pts").cast("timestamp")) - F.unix_micros(
        F.col("vts").cast("timestamp")
    )
    lag_min = (
        p.join(v, "user_id")
        .where(F.col("vts") <= F.col("pts"))
        .groupBy("pid")
        .agg(F.min(lag_us).alias("lag_us"))
    )
    bucket = F.expr(f"lag_us div ({_LAG_BUCKET_HOURS} * 3600000000)")
    return (
        lag_min.groupBy(bucket.alias(f"bucket_{_LAG_BUCKET_HOURS}h"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy(f"bucket_{_LAG_BUCKET_HOURS}h")
    )


@query(
    "cusum_revenue_shift",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    n AS (SELECT count(*) AS nd, sum(cents) AS total FROM daily),
    dev AS (  -- scale by n_days so deviations vs the mean stay integral
      SELECT day, cents, cents * n.nd - n.total AS dev_u
      FROM daily CROSS JOIN n
    ),
    s AS (
      SELECT day, cents, dev_u,
             sum(dev_u) OVER (ORDER BY day) AS run_sum
      FROM dev
    ),
    c AS (
      SELECT day, cents,
             run_sum - min(run_sum) OVER (ORDER BY day) AS cusum_hi_u,
             max(run_sum) OVER (ORDER BY day) - run_sum AS cusum_lo_u
      FROM s
    ),
    thresh AS (  -- 4 x mean absolute deviation, in the same scaled units
      -- explicit floor: DuckDB's double->BIGINT cast rounds, Spark's
      -- truncates; floor() agrees everywhere
      SELECT CAST(floor(4 * avg(abs(dev_u))) AS BIGINT) AS t_u FROM dev
    )
    SELECT day, CAST(cents AS BIGINT) AS revenue_cents,
           CAST(cusum_hi_u AS BIGINT) AS cusum_hi_u,
           CAST(cusum_lo_u AS BIGINT) AS cusum_lo_u,
           CASE WHEN cusum_hi_u > t.t_u THEN 1
                WHEN cusum_lo_u > t.t_u THEN -1 ELSE 0 END AS shift_flag
    FROM c CROSS JOIN thresh t
    ORDER BY day
    """,
    description=(
        "CUSUM change-point detection on daily purchase revenue: "
        "upward/downward cumulative-sum excursions vs the corpus mean, "
        "flagged past 4x the mean absolute deviation — all integer math"
    ),
)
def cusum_revenue_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift detection without recursion: the CUSUM-with-reset
    recurrence max(0, C+dev) equals running-sum minus running-min (resp.
    running-max minus running-sum for downward shifts) — two window
    functions over the daily series. Deviations are scaled by n_days so
    everything from cents to excursions stays exact BIGINT; the only
    float is the threshold's mean-absolute-deviation, floored to the
    same integer units in both engines. The window runs over |days|
    rows — at any raw-data scale the sequential part is the calendar,
    not the corpus.
    """
    from pyspark.sql import Window as W

    (events,) = load(spark, sf_dir, "events")
    daily = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"))
    )
    n = daily.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("cents").alias("total")
    )
    dev = daily.crossJoin(F.broadcast(n)).select(
        "day", "cents", (F.col("cents") * F.col("nd") - F.col("total")).alias("dev_u")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    s = dev.select("day", "cents", "dev_u", F.sum("dev_u").over(w).alias("run_sum"))
    c = s.select(
        "day",
        "cents",
        (F.col("run_sum") - F.min("run_sum").over(w)).alias("cusum_hi_u"),
        (F.max("run_sum").over(w) - F.col("run_sum")).alias("cusum_lo_u"),
    )
    thresh = dev.agg(
        F.floor(4 * F.avg(F.abs("dev_u"))).cast("bigint").alias("t_u")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .select(
            "day",
            F.col("cents").alias("revenue_cents"),
            "cusum_hi_u",
            "cusum_lo_u",
            F.when(F.col("cusum_hi_u") > F.col("t_u"), 1)
            .when(F.col("cusum_lo_u") > F.col("t_u"), -1)
            .otherwise(0)
            .alias("shift_flag"),
        )
        .orderBy("day")
    )


@query(
    "mad_outlier_events",
    oracle="""
    WITH med AS (
      SELECT event_type,
             round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           count(*) AS n_events,
           m.med, d.mad,
           CAST(sum(CASE WHEN abs(e.value - m.med) > 4 * d.mad THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers,
           round(sum(CASE WHEN abs(e.value - m.med) > 4 * d.mad
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS outlier_rate
    FROM events e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad d ON e.event_type = d.event_type
    GROUP BY e.event_type, m.med, d.mad
    ORDER BY e.event_type
    """,
    description=(
        "Robust outlier rates per event type via median absolute "
        "deviation (4x MAD fence) — the zscore variant that a single "
        "extreme value can't poison"
    ),
)
def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics where mean/stddev would be dragged by the very
    outliers being hunted. Two aggregate passes (median, then median of
    absolute deviations — MAD needs the first median joined back) plus
    one counting pass; all three group on event_type, and the
    |types|-row stat dims broadcast onto the count scan. Medians round
    6dp before the fence comparison (the same exact-percentile parity
    quantiles_orders established).
    """
    (events,) = load(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad")
        )
    )
    fenced = events.join(F.broadcast(med), "event_type").join(
        F.broadcast(mad), "event_type"
    )
    is_out = F.when(
        F.abs(F.col("value") - F.col("med")) > 4 * F.col("mad"), 1
    ).otherwise(0)
    return (
        fenced.groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(is_out).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            "med",
            "mad",
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n_events"), 6).alias("outlier_rate"),
        )
        .orderBy("event_type")
    )


@query(
    "ewma_event_value",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type, list(cents::DOUBLE ORDER BY day) AS vals
      FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(len(vals) AS INTEGER) AS n_days,
           round(list_reduce(vals, (acc, x) -> 0.5 * x + 0.5 * acc) / 100, 6)
             AS ewma_value
    FROM ser ORDER BY event_type
    """,
    description=(
        "EWMA level forecast per event type: exact integer daily sums, "
        "then one sequential fold per key — identical fold order in both "
        "engines (alpha = 0.5 is exact binary) makes an inherently "
        "recursive statistic cross-engine verifiable"
    ),
)
def ewma_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily value per event
    type — the standard streaming level estimator, computed batch-side.

    The recursion ewma_t = a*x_t + (1-a)*ewma_{t-1} is sequential in t,
    so it folds over the per-key ORDERED daily series with `aggregate`
    (seeded with the first element, exactly like DuckDB's list_reduce).
    The sequential part is the calendar (30 elements), never the corpus:
    the corpus-sized work is the daily integer groupBy, which partial-
    aggregates map-side. Daily sums are exact BIGINT cents, so the fold
    consumes identical doubles in both engines, in the same order, with
    exact-binary 0.5 coefficients — bitwise-equal results before the
    final 6dp round.
    """
    (events,) = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"))
    ser = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, cents))),"
            " s -> cast(s.cents as double))"
        ).alias("vals")
    )
    return ser.select(
        "event_type",
        F.size("vals").alias("n_days"),
        F.round(
            F.expr(
                "aggregate(slice(vals, 2, size(vals) - 1), vals[0],"
                " (acc, x) -> 0.5 * x + 0.5 * acc)"
            )
            / 100,
            6,
        ).alias("ewma_value"),
    ).orderBy("event_type")


@query(
    "kl_drift_event_types",
    oracle="""
    WITH mid AS (
      SELECT CAST(min(ts) AS DATE) + CAST(floor(date_diff('day',
               CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) / 2) AS INTEGER)
             AS split_day
      FROM events
    ),
    counts AS (
      SELECT event_type,
             sum(CASE WHEN CAST(ts AS DATE) < split_day THEN 1 ELSE 0 END) AS n_first,
             sum(CASE WHEN CAST(ts AS DATE) >= split_day THEN 1 ELSE 0 END) AS n_second
      FROM events CROSS JOIN mid GROUP BY event_type
    ),
    tot AS (SELECT sum(n_first) AS t1, sum(n_second) AS t2 FROM counts)
    SELECT event_type,
           CAST(n_first AS BIGINT) AS n_first,
           CAST(n_second AS BIGINT) AS n_second,
           round(n_first / t1, 6) AS p_first,
           round(n_second / t2, 6) AS p_second,
           round((n_second / t2) * ln((n_second / t2) / (n_first / t1)), 6)
             AS kl_term
    FROM counts CROSS JOIN tot
    ORDER BY event_type
    """,
    description=(
        "Distribution-drift monitor: per-type KL divergence terms of the "
        "second half-window vs the first — emitted per row so no "
        "cross-row float summation can diverge between engines"
    ),
)
def kl_drift_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-drift detection for a training-data feed: split the corpus
    at the midpoint day, compare the event-type distributions, report
    each type's KL contribution p2*ln(p2/p1) (sum them for the scalar
    KL; large positive terms name the drifting categories).

    Scale shape: two scans' worth of work collapsed into ONE groupBy
    with conditional sums (map-side partial), a 1-row broadcast for the
    split day and totals — the corpus shuffles only the event_type
    partials. All counts exact integers; ratios rounded at 6dp.
    """
    (events,) = load(spark, sf_dir, "events")
    mid = events.agg(
        F.expr(
            "cast(min(ts) as date) + cast(floor("
            "datediff(cast(max(ts) as date), cast(min(ts) as date)) / 2) as int)"
        ).alias("split_day")
    )
    counts = (
        events.crossJoin(F.broadcast(mid))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.to_date("ts") < F.col("split_day"), 1).otherwise(0)
            ).alias("n_first"),
            F.sum(
                F.when(F.to_date("ts") >= F.col("split_day"), 1).otherwise(0)
            ).alias("n_second"),
        )
    )
    tot = counts.agg(
        F.sum("n_first").alias("t1"), F.sum("n_second").alias("t2")
    )
    p1 = F.col("n_first") / F.col("t1")
    p2 = F.col("n_second") / F.col("t2")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_first",
            "n_second",
            F.round(p1, 6).alias("p_first"),
            F.round(p2, 6).alias("p_second"),
            F.round(p2 * F.log(p2 / p1), 6).alias("kl_term"),
        )
        .orderBy("event_type")
    )


@query(
    "kaplan_meier_repurchase",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    mx AS (SELECT max(day) AS max_day FROM p),
    gaps AS (
      SELECT user_id, day,
             lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
      FROM p
    ),
    dur AS (
      SELECT CASE WHEN nxt IS NOT NULL THEN date_diff('day', day, nxt)
                  ELSE date_diff('day', day, max_day) END AS t,
             CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM gaps CROSS JOIN mx
    ),
    at_t AS (SELECT t, count(*) AS n_ending, sum(ev) AS d FROM dur GROUP BY t),
    km AS (
      SELECT t, d, sum(n_ending) OVER (ORDER BY t DESC) AS n_risk
      FROM at_t
    ),
    ser AS (
      SELECT list(struct_pack(t := t, d := d, n_risk := n_risk) ORDER BY t) AS rows_,
             list(1.0 - d / n_risk ORDER BY t) AS terms
      FROM km
    ),
    idx AS (
      SELECT i, rows_[i].t AS t, rows_[i].d AS d, rows_[i].n_risk AS n_risk,
             terms
      FROM ser CROSS JOIN (SELECT unnest(generate_series(1, 100)) AS i)
      WHERE i <= len(rows_)
    )
    SELECT CAST(t AS INTEGER) AS gap_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_repurchased,
           round(list_reduce(list_slice(terms, 1, i), (a, b) -> a * b), 6)
             AS km_survival
    FROM idx WHERE d > 0 ORDER BY gap_days
    """,
    description=(
        "Kaplan-Meier survival over inter-purchase gaps (right-censored "
        "at the window end): exact integer risk/event counts, survival "
        "via identical prefix-product folds in both engines"
    ),
)
def kaplan_meier_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-repurchase survival — the standard churn/LTV curve.
    Product-limit estimator S(t) = prod_{t_i<=t} (1 - d_i/n_i) over
    distinct gap lengths; censored spells (no next purchase before the
    window ends) enter the risk set but never the numerator.

    Scale shape: gap construction is one lead() window per user
    partition (the same exchange sessionization uses); the KM table is
    CALENDAR-sized (17 rows here), so collecting it into one array and
    computing prefix products by slice+fold is O(|times|^2) on a
    driver-negligible series — and the folds run in identical order in
    both engines, so survival matches bitwise before the 6dp round.
    Censored-only times contribute an exact 1.0 factor (1 - 0/n), so
    including them in the fold is a no-op, and only event times are
    emitted."""
    from pyspark.sql import Window as W

    (events,) = load(spark, sf_dir, "events")
    p = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    mx = p.agg(F.max("day").alias("max_day"))
    gaps = p.withColumn(
        "nxt", F.lead("day").over(W.partitionBy("user_id").orderBy("day"))
    )
    dur = gaps.crossJoin(F.broadcast(mx)).select(
        F.when(F.col("nxt").isNotNull(), F.datediff("nxt", "day"))
        .otherwise(F.datediff("max_day", "day"))
        .alias("t"),
        F.when(F.col("nxt").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    at_t = dur.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_ending"), F.sum("ev").alias("d")
    )
    km = at_t.select(
        "t",
        "d",
        F.sum("n_ending")
        .over(W.orderBy(F.desc("t")).rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("n_risk"),
    )
    ser = km.agg(
        F.array_sort(F.collect_list(F.struct("t", "d", "n_risk"))).alias("rows_")
    ).select(
        "rows_",
        F.expr(
            "transform(rows_, r -> 1.0 - r.d / r.n_risk)"
        ).alias("terms"),
    )
    return (
        ser.select(F.posexplode("rows_").alias("pos", "r"), "terms")
        .select(
            F.col("r.t").cast("int").alias("gap_days"),
            F.col("r.n_risk").cast("bigint").alias("n_risk"),
            F.col("r.d").cast("bigint").alias("n_repurchased"),
            F.round(
                F.expr(
                    "aggregate(slice(terms, 1, pos + 1), cast(1.0 as double),"
                    " (a, b) -> a * b)"
                ),
                6,
            ).alias("km_survival"),
        )
        .where(F.col("n_repurchased") > 0)
        .orderBy("gap_days")
    )


@query(
    "theilsen_revenue_trend",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2026-01-01', CAST(ts AS DATE)) AS x,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    slopes AS (
      SELECT (b.y - a.y) / (b.x - a.x) AS s
      FROM daily a JOIN daily b ON b.x > a.x
    ),
    m AS (SELECT quantile_cont(s, 0.5) AS slope FROM slopes)
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           round(m.slope, 6) AS slope_cents_per_day,
           round((SELECT quantile_cont(y - m.slope * x, 0.5) FROM daily), 6)
             AS intercept_cents
    FROM m
    """,
    description=(
        "Theil-Sen robust trend of daily purchase revenue: median of all "
        "pairwise slopes (outlier breakdown point 29%), median-residual "
        "intercept — exact integer inputs, verified quantile_cont parity"
    ),
)
def theilsen_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil 1950 / Sen 1968 (public estimator): the slope a single
    wild day cannot move, unlike OLS. Pairwise slopes are CALENDAR² —
    30 days → 435 pairs — so the self-join is driver-negligible at any
    corpus size; the corpus-scale work is the one daily integer groupBy
    feeding it. Day index is anchored to a fixed epoch so x is an exact
    int in both engines; y is exact cents; each slope is one int/int
    division — identical doubles — and the medians interpolate
    identically (Spark percentile == DuckDB quantile_cont, verified)."""
    (events,) = load(spark, sf_dir, "events")
    daily = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("2026-01-01").cast("date")).alias("x")
        )
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("y"))
        .localCheckpoint()  # reused by slopes (twice) + residuals
    )
    a = daily.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = a.join(b, F.col("xb") > F.col("xa")).select(
        ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias("s")
    )
    m = slopes.agg(F.expr("percentile(s, 0.5)").alias("slope"))
    resid = daily.crossJoin(F.broadcast(m)).select(
        "slope", (F.col("y") - F.col("slope") * F.col("x")).alias("r")
    )
    n = daily.count()
    return resid.agg(
        F.lit(n).cast("bigint").alias("n_days"),
        F.round(F.first("slope"), 6).alias("slope_cents_per_day"),
        F.round(F.expr("percentile(r, 0.5)"), 6).alias("intercept_cents"),
    )


@query(
    "forecast_eval_mase",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, day, cents,
             lag(cents, 7) OVER (PARTITION BY event_type ORDER BY day) AS snaive,
             lag(cents, 1) OVER (PARTITION BY event_type ORDER BY day) AS naive1
      FROM daily
    )
    SELECT event_type,
           CAST(count(snaive) AS BIGINT) AS n_forecasts,
           CAST(sum(abs(cents - snaive)) AS BIGINT) AS abs_err_cents,
           round((sum(abs(cents - snaive)) / count(snaive))
                 / (sum(CASE WHEN naive1 IS NOT NULL THEN abs(cents - naive1) END)
                    / count(naive1)), 6) AS mase
    FROM lagged
    WHERE snaive IS NOT NULL OR naive1 IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    description=(
        "Forecast-accuracy harness: seasonal-naive lag-7 predictions "
        "scored by MASE (scale-free, exact-integer numerators) per "
        "event type — the backtest every forecasting pipeline needs"
    ),
)
def forecast_eval_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman & Koehler 2006 MASE (public): forecast MAE scaled by the
    in-sample naive-1 MAE, so values compare across series of different
    magnitude (MASE < 1 beats naive). Seasonal-naive lag-7 is the
    standard baseline every real model must beat. Scale shape: the
    corpus-sized work is the daily integer groupBy; both lags share ONE
    per-key window partitioning; absolute errors stay exact BIGINT and
    only the final scale-free ratio is floating (6dp round)."""
    from pyspark.sql import Window as W

    (events,) = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"))
    byk = W.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "cents",
        F.lag("cents", 7).over(byk).alias("snaive"),
        F.lag("cents", 1).over(byk).alias("naive1"),
    )
    err7 = F.abs(F.col("cents") - F.col("snaive"))
    err1 = F.abs(F.col("cents") - F.col("naive1"))
    return (
        lagged.where(F.col("snaive").isNotNull() | F.col("naive1").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("snaive").cast("bigint").alias("n_forecasts"),
            F.sum(err7).cast("bigint").alias("abs_err_cents"),
            F.round(
                (F.sum(err7) / F.count("snaive"))
                / (F.sum(err1) / F.count("naive1")),
                6,
            ).alias("mase"),
        )
        .orderBy("event_type")
    )


@query(
    "holt_trend_forecast",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
             cents::DOUBLE AS x,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    rec AS (
      SELECT s2.event_type, 2 AS t, s2.x AS level, s2.x - s1.x AS trend
      FROM ser s2 JOIN ser s1
        ON s1.event_type = s2.event_type AND s1.t = 1 AND s2.t = 2
      UNION ALL
      SELECT r.event_type, r.t + 1,
             0.5 * s.x + 0.5 * (r.level + r.trend),
             0.5 * ((0.5 * s.x + 0.5 * (r.level + r.trend)) - r.level)
               + 0.5 * r.trend
      FROM rec r JOIN ser s
        ON s.event_type = r.event_type AND s.t = r.t + 1
    ),
    fin AS (
      SELECT event_type, level, trend,
             row_number() OVER (PARTITION BY event_type ORDER BY t DESC) AS rn
      FROM rec
    )
    SELECT f.event_type,
           CAST(n.n_days AS INTEGER) AS n_days,
           round(f.level / 100, 6) AS level_value,
           round(f.trend / 100, 6) AS trend_value,
           round((f.level + f.trend) / 100, 6) AS forecast_next
    FROM fin f
    JOIN (SELECT event_type, max(t) AS n_days FROM ser GROUP BY 1) n
      USING (event_type)
    WHERE f.rn = 1
    ORDER BY f.event_type
    """,
    description=(
        "Holt double exponential smoothing (level + trend) per event "
        "type over exact daily cents, one-step-ahead forecast — the "
        "sequential recursion folds over the CALENDAR (30 elements), "
        "never the corpus; exact-binary 0.5 coefficients make it "
        "cross-engine bit-stable"
    ),
)
def holt_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend smoothing (Holt 1957 / Hyndman fpp3 §8.2 —
    public): level_t = a*x_t + (1-a)*(level+trend), trend_t =
    b*(level_t - level_{t-1}) + (1-b)*trend, a = b = 0.5, init
    level_2 = x_2, trend_2 = x_2 - x_1.

    Same scale shape as `ewma_event_value`: the corpus-sized work is
    ONE map-side-combinable daily integer groupBy; the sequential fold
    runs over the per-key ordered daily array (calendar-bounded, ~30
    elements) with a struct accumulator — `aggregate` in Spark, a
    recursive CTE in the DuckDB oracle, both evaluating the identical
    IEEE expression shapes in the identical order.
    """
    (events,) = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"))
    ser = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, cents))),"
            " s -> cast(s.cents as double))"
        ).alias("vals")
    )
    lvl = "0.5 * x + 0.5 * (acc.level + acc.trend)"
    fold = F.expr(
        "aggregate(slice(vals, 3, size(vals) - 2),"
        " named_struct('level', vals[1], 'trend', vals[1] - vals[0]),"
        f" (acc, x) -> named_struct('level', {lvl},"
        f" 'trend', 0.5 * (({lvl}) - acc.level) + 0.5 * acc.trend))"
    )
    return (
        ser.filter(F.size("vals") >= 2)
        .select("event_type", F.size("vals").alias("n_days"), fold.alias("st"))
        .select(
            "event_type",
            "n_days",
            F.round(F.col("st.level") / 100, 6).alias("level_value"),
            F.round(F.col("st.trend") / 100, 6).alias("trend_value"),
            F.round((F.col("st.level") + F.col("st.trend")) / 100, 6).alias(
                "forecast_next"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "dow_seasonality_events",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    cells AS (
      SELECT event_type, isodow(day) - 1 AS dow,
             count(*) AS n_days,
             sum(cents) AS s,
             sum(cents * cents) AS ss
      FROM daily GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, count(*) AS nt, sum(cents) AS st
      FROM daily GROUP BY 1
    ),
    outl AS (
      SELECT d.event_type, isodow(d.day) - 1 AS dow,
             sum(CASE WHEN (d.cents * c.n_days - c.s)
                          * (d.cents * c.n_days - c.s)
                        > 4 * (c.ss * c.n_days - c.s * c.s)
                      THEN 1 ELSE 0 END) AS n_outlier_days
      FROM daily d
      JOIN cells c ON c.event_type = d.event_type
                  AND c.dow = isodow(d.day) - 1
      GROUP BY 1, 2
    )
    SELECT c.event_type,
           CAST(c.dow AS INTEGER) AS dow,
           CAST(c.n_days AS BIGINT) AS n_days,
           round(c.s / c.n_days / 100.0, 6) AS dow_avg,
           round((c.s * t.nt) * 1.0 / (c.n_days * t.st), 6)
             AS seasonal_index,
           CAST(o.n_outlier_days AS BIGINT) AS n_outlier_days
    FROM cells c
    JOIN tot t ON t.event_type = c.event_type
    JOIN outl o ON o.event_type = c.event_type AND o.dow = c.dow
    ORDER BY c.event_type, c.dow
    """,
    description=(
        "Day-of-week seasonal decomposition per event type: seasonal "
        "index (dow mean over grand mean) plus 2-sigma residual-outlier "
        "day counts — ALL comparisons in exact integer cents (variance "
        "fence cross-multiplied to integers), so the decomposition is "
        "cross-engine exact"
    ),
)
def dow_seasonality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seasonal-profile monitor behind 'is Tuesday always a spike':
    per (event_type, ISO day-of-week) the mean daily revenue, its ratio
    to the type's grand daily mean (the multiplicative seasonal index),
    and how many individual days broke the 2-sigma fence for their own
    weekday cell.

    Scale shape: one daily integer groupBy over the corpus (map-side
    partial), then everything downstream operates on <= |types|*7 cells
    and |types|*|days| daily rows — the cell stats broadcast back onto
    the daily rows for the fence count. The fence compares
    (x*n - s)^2 > 4*(ss*n - s^2): both sides exact BIGINT at test SFs
    (cents^2 * days fits 2^63 up to ~sf1; beyond that the fence flips to
    double with the usual 6dp round — a projection swap, not a plan
    change).
    """
    (events,) = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"))
    dow = F.expr("weekday(day)").cast("bigint")
    cells = daily.groupBy("event_type", dow.alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nt"), F.sum("cents").alias("st")
    )
    dev = F.col("cents") * F.col("n_days") - F.col("s")
    is_out = F.when(
        dev * dev > 4 * (F.col("ss") * F.col("n_days") - F.col("s") * F.col("s")),
        1,
    ).otherwise(0)
    outl = (
        daily.withColumn("dow", dow)
        .join(F.broadcast(cells), ["event_type", "dow"])
        .groupBy("event_type", "dow")
        .agg(F.sum(is_out).alias("n_outlier_days"))
    )
    return (
        cells.join(F.broadcast(tot), "event_type")
        .join(F.broadcast(outl), ["event_type", "dow"])
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("n_days").cast("bigint").alias("n_days"),
            F.round(F.col("s") / F.col("n_days") / 100.0, 6).alias("dow_avg"),
            F.round(
                (F.col("s") * F.col("nt")) * 1.0 / (F.col("n_days") * F.col("st")),
                6,
            ).alias("seasonal_index"),
            F.col("n_outlier_days").cast("bigint").alias("n_outlier_days"),
        )
        .orderBy("event_type", "dow")
    )


@query(
    "capped_running_balance",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100, 0) AS BIGINT)
                      WHEN event_type = 'error'
                      THEN -CAST(round(value * 100, 0) AS BIGINT)
                      ELSE 0 END) AS delta
      FROM events
      WHERE event_type IN ('purchase', 'error')
      GROUP BY 1, 2
    ),
    ser AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS t,
             delta,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM daily
    ),
    rec AS (
      SELECT user_id, t, n,
             greatest(delta, 0) AS bal,
             CASE WHEN delta < 0 THEN 1 ELSE 0 END AS nc
      FROM ser WHERE t = 1
      UNION ALL
      SELECT s.user_id, s.t, s.n,
             greatest(r.bal + s.delta, 0),
             r.nc + CASE WHEN r.bal + s.delta < 0 THEN 1 ELSE 0 END
      FROM rec r JOIN ser s ON s.user_id = r.user_id AND s.t = r.t + 1
    )
    SELECT user_id,
           CAST(n AS INTEGER) AS n_days,
           CAST(bal AS BIGINT) AS balance_cents,
           CAST(nc AS BIGINT) AS n_clamped_days
    FROM rec WHERE t = n
    ORDER BY user_id
    """,
    description=(
        "Saturating running balance per user: purchases credit, errors "
        "debit, balance clamps at zero — the stateful fold plain window "
        "sums cannot express (a clamp makes the recurrence non-linear); "
        "exact integer cents, clamped-day counts included"
    ),
)
def capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The credit-ledger / inventory-position recurrence
    bal_t = max(bal_{t-1} + delta_t, 0): non-linear in the deltas, so
    no prefix-sum window rewrite exists — it needs a per-key ordered
    fold. Same scale shape as `ewma_event_value`/`holt_trend_forecast`:
    the corpus-sized work is one map-side-combinable daily integer
    groupBy; the sequential fold runs over calendar-bounded per-key
    arrays with a struct accumulator (balance + clamp count), mirrored
    by a recursive CTE in the oracle. Everything integer — bit-exact.
    """
    (events,) = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    daily = (
        events.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", cents).otherwise(-cents)
            ).alias("delta")
        )
    )
    ser = daily.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, delta))),"
            " s -> s.delta)"
        ).alias("deltas")
    )
    fold = F.expr(
        "aggregate(slice(deltas, 2, size(deltas) - 1),"
        " named_struct('bal', greatest(deltas[0], 0L),"
        "              'nc', if(deltas[0] < 0, 1L, 0L)),"
        " (acc, x) -> named_struct('bal', greatest(acc.bal + x, 0L),"
        "                          'nc', acc.nc + if(acc.bal + x < 0, 1L, 0L)))"
    )
    return ser.select(
        "user_id",
        F.size("deltas").alias("n_days"),
        fold.alias("st"),
    ).select(
        "user_id",
        "n_days",
        F.col("st.bal").cast("bigint").alias("balance_cents"),
        F.col("st.nc").cast("bigint").alias("n_clamped_days"),
    ).orderBy("user_id")


@query(
    "gapfill_daily_purchases",
    oracle="""
    WITH ext AS (
      SELECT min(CAST(ts AS DATE)) AS mind, max(CAST(ts AS DATE)) AS maxd
      FROM events
    ),
    cal AS (
      SELECT unnest(generate_series(mind, maxd, INTERVAL 1 DAY))::DATE AS day
      FROM ext
    ),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' AND user_id < 30
      GROUP BY 1, 2
    ),
    users AS (SELECT DISTINCT user_id FROM daily),
    dense AS (
      SELECT u.user_id, c.day, coalesce(d.cents, 0) AS cents,
             CASE WHEN d.day IS NOT NULL THEN 1 ELSE 0 END AS observed
      FROM users u CROSS JOIN cal c
      LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = c.day
    )
    SELECT user_id, day,
           CAST(cents AS BIGINT) AS cents,
           CAST(observed AS BIGINT) AS observed,
           last_value(CASE WHEN observed = 1 THEN day END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_day,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_cents
    FROM dense
    ORDER BY user_id, day
    """,
    description=(
        "Calendar densification (gap-fill) of sparse per-user purchase "
        "days onto the full date range: zero-filled gaps, an observed "
        "flag, forward-filled last-purchase day, and an exact running "
        "total — the time_bucket_gapfill/LOCF shape time-series stores "
        "ship natively"
    ),
)
def gapfill_daily_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + LOCF (last observation carried forward): downstream
    window/forecast math needs a DENSE calendar, and the fill must be
    declarative, not imperative. Scale shape: the calendar is a tiny
    generated dimension (|days| rows) broadcast-crossed with the
    (bounded, filtered) user dim — never with the corpus; the corpus-
    sized work is one daily integer groupBy; the fill itself is a left
    join plus one per-user window partitioning that serves BOTH the
    forward-fill and the running total.
    """
    from pyspark.sql import Window as W

    (events,) = load(spark, sf_dir, "events")
    purch = events.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 30)
    )
    # full-range calendar from ALL events, as the oracle does
    ext = events.select(F.to_date("ts").alias("d")).agg(
        F.min("d").alias("mind"), F.max("d").alias("maxd")
    )
    cal = ext.select(
        F.explode(F.expr("sequence(mind, maxd, interval 1 day)")).alias("day")
    )
    daily = purch.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"))
    users = daily.select("user_id").distinct()
    obs = daily.select(
        F.col("user_id").alias("duser"), F.col("day").alias("dday"), "cents"
    )
    dense = (
        users.crossJoin(F.broadcast(cal))
        .join(
            obs,
            (F.col("user_id") == F.col("duser")) & (F.col("day") == F.col("dday")),
            "left",
        )
        .select(
            "user_id",
            "day",
            F.coalesce("cents", F.lit(0)).alias("cents"),
            F.when(F.col("dday").isNotNull(), 1).otherwise(0).alias("observed"),
        )
    )
    wu = W.partitionBy("user_id").orderBy("day").rowsBetween(
        W.unboundedPreceding, 0
    )
    return dense.select(
        "user_id",
        "day",
        F.col("cents").cast("bigint").alias("cents"),
        F.col("observed").cast("bigint").alias("observed"),
        F.last(
            F.when(F.col("observed") == 1, F.col("day")), ignorenulls=True
        ).over(wu).alias("last_purchase_day"),
        F.sum("cents").over(wu).cast("bigint").alias("running_cents"),
    ).orderBy("user_id", "day")


@query(
    "trimmed_mean_value",
    oracle="""
    WITH ranked AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS r,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    bounds AS (
      SELECT *,
             (n * 5) // 100 AS k
      FROM ranked
    ),
    stats AS (
      SELECT event_type,
             any_value(n) AS n,
             any_value(k) AS k,
             sum(CASE WHEN r > k AND r <= n - k THEN cents ELSE 0 END)
               AS trimmed_sum,
             min(CASE WHEN r = k + 1 THEN cents END) AS lo_fence,
             min(CASE WHEN r = n - k THEN cents END) AS hi_fence,
             sum(CASE WHEN r <= k THEN 1 WHEN r > n - k THEN 1 ELSE 0 END)
               AS n_clipped,
             sum(cents) AS full_sum
      FROM bounds GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           CAST(n_clipped AS BIGINT) AS n_clipped,
           round(full_sum * 1.0 / n / 100, 6) AS mean_value,
           round(trimmed_sum * 1.0 / (n - 2 * k) / 100, 6) AS trimmed_mean,
           round((trimmed_sum + k * lo_fence + k * hi_fence) * 1.0 / n / 100, 6)
             AS winsorized_mean
    FROM stats
    ORDER BY event_type
    """,
    description=(
        "5% trimmed and winsorized means per event type next to the "
        "raw mean: rank-fenced in one window pass, tails either dropped "
        "(trim) or clamped to the fence values (winsorize) — robust "
        "aggregation in exact integer cents"
    ),
)
def trimmed_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location estimates the plain mean can't give when tails
    are junk (sensor spikes, bot traffic): drop the extreme 5% per side
    (trimmed) or clamp them to the 5th/95th rank values (winsorized).
    Scale shape: ONE rank window partitioning by event_type feeds every
    statistic — the fences are rank lookups inside the same pass, not
    extra percentile scans; all sums exact integer cents with one 6dp
    round at the ratio boundary. Deterministic (value, event_id) rank
    tie-break, the same discipline as heatmap_hour_value.
    """
    from pyspark.sql import Window as W

    (events,) = load(spark, sf_dir, "events")
    byt = W.partitionBy("event_type")
    ranked = events.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.row_number().over(byt.orderBy("value", "event_id")).alias("r"),
        F.count(F.lit(1)).over(byt).alias("n"),
    ).withColumn("k", F.expr("(n * 5) div 100"))
    in_core = (F.col("r") > F.col("k")) & (F.col("r") <= F.col("n") - F.col("k"))
    stats = ranked.groupBy("event_type").agg(
        F.first("n").alias("n"),
        F.first("k").alias("k"),
        F.sum(F.when(in_core, F.col("cents")).otherwise(0)).alias("trimmed_sum"),
        F.min(F.when(F.col("r") == F.col("k") + 1, F.col("cents"))).alias("lo_fence"),
        F.min(F.when(F.col("r") == F.col("n") - F.col("k"), F.col("cents"))).alias(
            "hi_fence"
        ),
        F.sum(F.when(~in_core, 1).otherwise(0)).alias("n_clipped"),
        F.sum("cents").alias("full_sum"),
    )
    return stats.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("n_clipped").cast("bigint").alias("n_clipped"),
        F.round(F.col("full_sum") * 1.0 / F.col("n") / 100, 6).alias("mean_value"),
        F.round(
            F.col("trimmed_sum") * 1.0 / (F.col("n") - 2 * F.col("k")) / 100, 6
        ).alias("trimmed_mean"),
        F.round(
            (
                F.col("trimmed_sum")
                + F.col("k") * F.col("lo_fence")
                + F.col("k") * F.col("hi_fence")
            )
            * 1.0
            / F.col("n")
            / 100,
            6,
        ).alias("winsorized_mean"),
    ).orderBy("event_type")


@query(
    "ols_daily_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', (SELECT min(CAST(ts AS DATE)) FROM events),
                       CAST(ts AS DATE)) AS x,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS y
      FROM events GROUP BY 1, 2
    ),
    sums AS (
      SELECT event_type,
             count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) / 100, 6)
             AS slope_per_day,
           round(((sy * sxx - sx * sxy) * 1.0 / (n * sxx - sx * sx)) / 100, 6)
             AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) * 1.0
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM sums
    ORDER BY event_type
    """,
    description=(
        "Per-type OLS daily revenue trend: slope, intercept, and R^2 "
        "from the five exact integer moment sums — one map-side-"
        "combinable groupBy over the corpus, closed-form normal "
        "equations on |types| rows, cross-engine exact"
    ),
)
def ols_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares companion to `theilsen_revenue_trend` (robust
    median-of-slopes): the classical fit plus R^2 goodness. All five
    moments (Σx, Σy, Σxx, Σxy, Σyy) are exact BIGINT accumulated in one
    daily groupBy + one per-type groupBy; the normal equations evaluate
    on |types| rows with identical expression shapes in both engines —
    float enters only at the final three 6dp divisions. Magnitudes:
    y ~ 1e7 cents, yy*n ~ 1e17 < 2^63 through ~sf1; beyond that the
    moments switch to DOUBLE (projection swap).
    """
    (events,) = load(spark, sf_dir, "events")
    mind = events.select(F.min(F.to_date("ts")).alias("mind"))
    daily = (
        events.crossJoin(F.broadcast(mind))
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.col("mind")).alias("x"),
        )
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("y"))
    )
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return sums.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(cov * 1.0 / det / 100, 6).alias("slope_per_day"),
        F.round(
            ((F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")) * 1.0 / det)
            / 100,
            6,
        ).alias("intercept"),
        F.round(
            (cov * cov) * 1.0
            / (det * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            6,
        ).alias("r2"),
    ).orderBy("event_type")


@query(
    "leadlag_correlation",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CASE WHEN event_type = 'click'
                      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS a,
             sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS b
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
    paired AS (
      SELECT l.lag, x.a, y.b
      FROM lags l
      JOIN daily x ON TRUE
      JOIN daily y ON y.day = x.day + CAST(l.lag AS INTEGER)
    ),
    sums AS (
      SELECT lag, count(*) AS n,
             sum(a) AS sa, sum(b) AS sb,
             sum(a * a) AS saa, sum(b * b) AS sbb, sum(a * b) AS sab
      FROM paired GROUP BY lag
    )
    SELECT CAST(lag AS INTEGER) AS lag_days,
           CAST(n AS BIGINT) AS n_pairs,
           round((n * sab - sa * sb) * 1.0
                 / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                    * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6) AS pearson_r
    FROM sums
    ORDER BY lag_days
    """,
    description=(
        "Lead-lag cross-correlation between daily click and purchase "
        "revenue at lags -3..+3 days — 'does one series lead the "
        "other'; exact integer moments per lag, sqrt only at the final "
        "Pearson ratio"
    ),
)
def leadlag_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function over a pair of aligned daily series.
    Scale shape: ONE conditional-sum groupBy collapses the corpus to
    |days| rows carrying both series; the 7-lag pairing is a broadcast
    self-join of that tiny table (days x 7 rows), and each lag's
    Pearson r comes from exact integer moments — the corpus is scanned
    once, everything downstream is calendar-sized.
    """
    (events,) = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", cents).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0)).alias(
            "b"
        ),
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    x = daily.select("day", "a")
    y = daily.select(F.col("day").alias("yday"), "b")
    paired = (
        lags.crossJoin(F.broadcast(x))
        .join(
            F.broadcast(y),
            F.col("yday") == F.expr("date_add(day, lag)"),
        )
    )
    sums = paired.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
    )
    return sums.select(
        F.col("lag").cast("int").alias("lag_days"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round(
            (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb"))
            * 1.0
            / (
                F.sqrt((F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double"))
                * F.sqrt((F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double"))
            ),
            6,
        ).alias("pearson_r"),
    ).orderBy("lag_days")


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov drift — the continuous companion to the
# binned KL monitor above
# ---------------------------------------------------------------------------


@query(
    "ks_drift_events",
    oracle="""
    WITH ev AS (
      SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    base AS (
      SELECT vc, count(*) AS cb FROM ev WHERE t = 'view' GROUP BY vc
    ),
    oth AS (
      SELECT t, vc, count(*) AS ct FROM ev WHERE t <> 'view' GROUP BY t, vc
    ),
    grid AS (
      SELECT t, vc FROM oth
      UNION
      SELECT o.t, b.vc
      FROM (SELECT DISTINCT t FROM oth) o CROSS JOIN base b
    ),
    cum AS (
      SELECT g.t, g.vc,
             sum(coalesce(o.ct, 0)) OVER w AS c1,
             sum(coalesce(b.cb, 0)) OVER w AS c2,
             sum(coalesce(o.ct, 0)) OVER (PARTITION BY g.t) AS n1,
             sum(coalesce(b.cb, 0)) OVER (PARTITION BY g.t) AS n2
      FROM grid g
      LEFT JOIN oth o ON o.t = g.t AND o.vc = g.vc
      LEFT JOIN base b ON b.vc = g.vc
      WINDOW w AS (PARTITION BY g.t ORDER BY g.vc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type,
           CAST(max(n1) AS BIGINT) AS n_obs,
           CAST(max(n2) AS BIGINT) AS n_base,
           CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num,
           CAST(max(abs(c1 * n2 - c2 * n1)) * 1000000
                // (max(n1) * max(n2)) AS BIGINT) AS d_micro
    FROM cum
    GROUP BY t
    ORDER BY t
    """,
    description=(
        "Exact two-sample Kolmogorov-Smirnov distance of each event type's "
        "value distribution against the 'view' baseline — the continuous "
        "drift monitor next to the binned KL one. All-integer: values in "
        "cents, the sup evaluated as max |c1*n2 - c2*n1| over the merged "
        "support, so both engines agree bit-for-bit"
    ),
    bench=True,
)
def ks_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS via counts, never a global sort: values collapse to the distinct
    cents domain first (bounded by the price range, not the row count), the
    cumulative step is a per-type partitioned window over that bounded
    domain, and the statistic is the integer cross-multiplied sup
    |F1 - F2| — no float CDFs, no engine-ordered float sums. At 100 TB the
    only corpus-sized work is the two groupBys; everything after is
    |distinct cents| x |types| sized. Reference framing: the drift screen a
    Lenses-style continuous-monitoring stack runs next to throughput
    metrics (kafka-tests.yml's monitoring group)."""
    (events,) = load(spark, sf_dir, "events")
    ev = events.select(
        F.col("event_type").alias("t"),
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    base = ev.where(F.col("t") == "view").groupBy("vc").agg(
        F.count(F.lit(1)).alias("cb")
    )
    oth = ev.where(F.col("t") != "view").groupBy("t", "vc").agg(
        F.count(F.lit(1)).alias("ct")
    )
    grid = oth.select("t", "vc").union(
        base.select("vc").crossJoin(F.broadcast(oth.select("t").distinct()))
        .select("t", "vc")
    ).distinct()
    joined = (
        grid.join(oth, ["t", "vc"], "left")
        .join(base, ["vc"], "left")
        .select(
            "t", "vc",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = (
        Window.partitionBy("t")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("t")
    cum = joined.select(
        "t",
        F.sum("ct").over(w).alias("c1"),
        F.sum("cb").over(w).alias("c2"),
        F.sum("ct").over(wt).alias("n1"),
        F.sum("cb").over(wt).alias("n2"),
    )
    return (
        cum.groupBy("t")
        .agg(
            F.max("n1").cast("bigint").alias("n_obs"),
            F.max("n2").cast("bigint").alias("n_base"),
            F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")))
            .cast("bigint")
            .alias("d_num"),
            F.expr(
                "CAST(max(abs(c1 * n2 - c2 * n1)) * 1000000"
                " div (max(n1) * max(n2)) AS BIGINT)"
            ).alias("d_micro"),
        )
        .withColumnRenamed("t", "event_type")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Holt-Winters triple smoothing — level + trend + weekly seasonality
# ---------------------------------------------------------------------------


def _hw_lvl_new_duck() -> str:
    s_case = " ".join(f"WHEN {j} THEN r.s{j}" for j in range(7))
    return f"0.5 * (s.x - CASE s.dw {s_case} END) + 0.5 * (r.level + r.trend)"


def _hw_duck_s_updates() -> str:
    lvl = _hw_lvl_new_duck()
    return ", ".join(
        f"CASE WHEN s.dw = {j} THEN 0.5 * (s.x - ({lvl})) + 0.5 * r.s{j} "
        f"ELSE r.s{j} END AS s{j}"
        for j in range(7)
    )


@query(
    "holt_winters_forecast",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
             CAST(day - DATE '1970-01-01' AS INTEGER) % 7 AS dw,
             cents::DOUBLE AS x,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    init AS (
      SELECT event_type,
             sum(CASE WHEN t <= 7 THEN x END) / 7 AS l0,
             {", ".join(f"max(CASE WHEN t <= 7 AND dw = {j} THEN x END) AS x{j}" for j in range(7))}
      FROM ser WHERE n >= 8 GROUP BY event_type
    ),
    rec AS (
      SELECT event_type, 7 AS t, l0 AS level, CAST(0.0 AS DOUBLE) AS trend,
             {", ".join(f"x{j} - l0 AS s{j}" for j in range(7))}
      FROM init
      UNION ALL
      SELECT r.event_type, r.t + 1,
             {_hw_lvl_new_duck()} AS level,
             0.5 * (({_hw_lvl_new_duck()}) - r.level) + 0.5 * r.trend AS trend,
             {_hw_duck_s_updates()}
      FROM rec r JOIN ser s
        ON s.event_type = r.event_type AND s.t = r.t + 1
    ),
    fin AS (
      SELECT r.*, row_number() OVER (PARTITION BY event_type ORDER BY t DESC)
               AS rn
      FROM rec r
    ),
    lastdw AS (
      SELECT event_type, max(t) AS n_days,
             max(CASE WHEN t = n THEN dw END) AS dw_last
      FROM ser GROUP BY event_type
    )
    SELECT f.event_type,
           CAST(l.n_days AS INTEGER) AS n_days,
           round(f.level / 100, 6) AS level_value,
           round(f.trend / 100, 6) AS trend_value,
           round((f.level + f.trend +
                  CASE (l.dw_last + 1) % 7
                    {" ".join(f"WHEN {j} THEN f.s{j}" for j in range(7))}
                  END) / 100, 6) AS forecast_next
    FROM fin f JOIN lastdw l USING (event_type)
    WHERE f.rn = 1
    ORDER BY f.event_type
    """,
    description=(
        "Holt-Winters additive triple smoothing (level + trend + weekly "
        "seasonal, alpha=beta=gamma=0.5) per event type over exact daily "
        "cents, one-step forecast honoring the next day's seasonal index "
        "— the recursion folds over the calendar, cross-engine bit-stable "
        "(dyadic 0.5 coefficients, identical expression shapes)"
    ),
)
def holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winters' seasonal extension of Holt (Winters 1960 / Hyndman fpp3
    §8.3): seasonal slots are epoch-day mod 7 (engine-neutral dow), the
    first week initializes level (week mean) and the seven seasonal
    offsets, then the fold runs t=8..n. Corpus work is the same single
    daily groupBy as holt_trend_forecast; the recursion is
    calendar-sized per type with a 9-field struct accumulator."""
    (events,) = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"))
    ser = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day,"
            " cast(datediff(day, date'1970-01-01') % 7 as int) as dw,"
            " cast(cents as double) as x))),"
            " s -> struct(s.dw as dw, s.x as x))"
        ).alias("vals")
    ).where(F.size("vals") >= 8)

    s_case = " ".join(f"WHEN {j} THEN acc.s{j}" for j in range(7))
    lvl_new = (
        f"0.5 * (t.x - CASE t.dw {s_case} END)"
        " + 0.5 * (acc.level + acc.trend)"
    )
    s_updates = ", ".join(
        f"'s{j}', CASE WHEN t.dw = {j} "
        f"THEN 0.5 * (t.x - ({lvl_new})) + 0.5 * acc.s{j} "
        f"ELSE acc.s{j} END"
        for j in range(7)
    )
    init_l0 = (
        "(" + " + ".join(f"element_at(vals, {i}).x" for i in range(1, 8)) + ") / 7D"
    )
    init_s = ", ".join(
        f"'s{j}', element_at(filter(slice(vals, 1, 7), v -> v.dw = {j}), 1).x"
        f" - ({init_l0})"
        for j in range(7)
    )
    fold = F.expr(
        f"aggregate(slice(vals, 8, size(vals) - 7),"
        f" named_struct('level', {init_l0}, 'trend', 0D, {init_s}),"
        f" (acc, t) -> named_struct("
        f"   'level', {lvl_new},"
        f"   'trend', 0.5 * (({lvl_new}) - acc.level) + 0.5 * acc.trend,"
        f"   {s_updates}))"
    ).alias("hw")
    next_s = " ".join(
        f"WHEN {j} THEN hw.s{j}" for j in range(7)
    )
    return (
        ser.select(
            "event_type",
            F.size("vals").cast("int").alias("n_days"),
            F.element_at("vals", -1).getField("dw").alias("dw_last"),
            fold,
        )
        .select(
            "event_type",
            "n_days",
            F.round(F.col("hw.level") / 100, 6).alias("level_value"),
            F.round(F.col("hw.trend") / 100, 6).alias("trend_value"),
            F.round(
                (
                    F.col("hw.level")
                    + F.col("hw.trend")
                    + F.expr(f"CASE (dw_last + 1) % 7 {next_s} END")
                )
                / 100,
                6,
            ).alias("forecast_next"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# autocorrelation function (seasonality diagnostic)
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7


@query(
    "acf_daily_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               // 100000 AS v
      FROM orders GROUP BY 1
    ),
    lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
    pairs AS (
      SELECT l.lag, a.v AS x, b.v AS y
      FROM lags l CROSS JOIN daily a
      JOIN daily b ON b.day = a.day - CAST(l.lag AS INTEGER)
    ),
    s AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT lag, n AS n_pairs,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf
    FROM s ORDER BY lag
    """,
    description=(
        "Autocorrelation of daily revenue at lags 1-7 — the weekly-"
        "seasonality diagnostic (pairwise-complete Pearson over the "
        "lag-aligned daily series, all moments as exact BIGINTs)"
    ),
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF over the daily revenue series.

    Determinism: daily revenue folds as exact integer cents, truncate-
    divided to integer thousand-dollar units (Spark ``div`` == DuckDB
    ``//``, NOTES.md), so every Pearson moment is a BIGINT and the one
    float op (the final r) starts from identical integers in both
    engines. Unit scaling keeps n*Sxx inside BIGINT through ~sf1; at
    larger SFs raise the divisor a decade.

    Scale shape: the corpus collapses to one row per day before any
    lag work; the lag self-join runs on that tiny aggregate (7 lags x
    |days| rows), never on raw orders.
    """
    (orders,) = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents")
        )
        .select("day", F.expr("cents div 100000").alias("v"))
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day").alias("day_a"), F.col("v").alias("x"))
    b = daily.select(F.col("day").alias("day_b"), F.col("v").alias("y"))
    pairs = (
        lags.crossJoin(a)
        .withColumn("day_b", F.date_sub(F.col("day_a"), F.col("lag")))
        .join(b, "day_b")
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        s.select(
            "lag",
            F.col("n").alias("n_pairs"),
            F.round(num / F.sqrt(varx * vary), 6).alias("acf"),
        )
        .orderBy("lag")
    )


@query(
    "changepoint_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    tot AS (
      SELECT count(*) AS n, sum(cents) AS s, sum(cents * cents) AS sq
      FROM daily
    ),
    pre AS (
      SELECT day, row_number() OVER (ORDER BY day) AS k,
             sum(cents) OVER (ORDER BY day) AS pk
      FROM daily
    ),
    scored AS (
      -- between-segment contrast at split k (left = first k days):
      -- d = pk*(n-k) - (s-pk)*k is EXACT in BIGINT; the square and the
      -- ratio happen in one fixed-shape double expression
      SELECT day, k, pk, n, s,
             (CAST(pk * (n - k) - (s - pk) * k AS DOUBLE)
              * CAST(pk * (n - k) - (s - pk) * k AS DOUBLE))
             / (CAST(k AS DOUBLE) * (n - k)) AS gain
      FROM pre CROSS JOIN tot
      WHERE k < n
    ),
    best AS (
      SELECT * FROM scored ORDER BY gain DESC, day LIMIT 1
    )
    SELECT b.day AS split_day,
           CAST(b.k AS BIGINT) AS left_days,
           CAST(b.n - b.k AS BIGINT) AS right_days,
           round(b.pk * 1.0 / b.k, 6) AS left_mean_cents,
           round((b.s - b.pk) * 1.0 / (b.n - b.k), 6) AS right_mean_cents,
           round(b.gain / (b.n * (CAST(t.sq AS DOUBLE)
                 - CAST(b.s AS DOUBLE) * b.s / b.n)), 6) AS var_explained
    FROM best b CROSS JOIN tot t
    """,
    description=(
        "Optimal single change-point on daily purchase revenue: the split "
        "maximizing the between-segment SSE reduction (binary-segmentation "
        "step 1) — exact BIGINT prefix contrasts, one fixed-shape double "
        "ratio, total tie-break by day; the localization companion to "
        "cusum_revenue_shift's detection"
    ),
)
def changepoint_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary segmentation's first split (public change-point method):
    argmax_k of n1*n2/(n1+n2)*(mean1-mean2)^2, computed as
    d^2/(k*(n-k)) with d = pk*(n-k) - (s-pk)*k from exact integer
    prefix sums. The variance-explained normalization keeps the output
    dimensionless. Identical double expressions in both engines; ties
    break on day."""
    (events,) = load(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("sq"),
    )
    w = Window.orderBy("day")
    pre = daily.select(
        "day",
        F.row_number().over(w).alias("k"),
        F.sum("cents").over(w).alias("pk"),
    )
    d = F.col("pk") * (F.col("n") - F.col("k")) - (F.col("s") - F.col("pk")) * F.col("k")
    gain = (d.cast("double") * d.cast("double")) / (
        F.col("k").cast("double") * (F.col("n") - F.col("k"))
    )
    scored = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("k") < F.col("n"))
        .withColumn("gain", gain)
    )
    best = scored.orderBy(F.col("gain").desc(), "day").limit(1)
    tss = F.col("sq").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    return best.select(
        F.col("day").alias("split_day"),
        F.col("k").cast("bigint").alias("left_days"),
        (F.col("n") - F.col("k")).cast("bigint").alias("right_days"),
        F.round(F.col("pk") * 1.0 / F.col("k"), 6).alias("left_mean_cents"),
        F.round((F.col("s") - F.col("pk")) * 1.0 / (F.col("n") - F.col("k")), 6).alias(
            "right_mean_cents"
        ),
        F.round(F.col("gain") / (F.col("n") * tss), 6).alias("var_explained"),
    )
