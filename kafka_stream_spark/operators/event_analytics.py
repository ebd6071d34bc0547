"""Event-sequence analytics over the events stream (Lenses-SQL-style
continuous analytics use cases; SURVEY.md §2.6 W3 analytic functions and
§2.9 T1 event-time semantics).

Three classic shapes a streaming-SQL user runs on keyed event topics
(reference datasets are exactly this shape — keyed, timestamped activity
streams, ``sample-data/variables.env:3-10``):

- **funnel**: ordered-stage conversion (signup → view → purchase, each
  stage strictly after the previous user-wise).
- **cohort retention**: users bucketed by first-activity day, activity
  counted per day offset.
- **sessionization**: gap-based session ids via lag + running sum — the
  analytic-function formulation (the streaming twin is
  ``session_window_events``).

All timestamps stay µs-exact in both engines (events ns → µs truncation
per ``functions/time.py``); durations are deliberately NOT emitted —
engines disagree on sub-second boundary-counting semantics, so session
bounds are emitted instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query


@query(
    "funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS st FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    v AS (
      SELECT e.user_id, min(e.ts) AS vt
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts > s.st
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS pt
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.vt
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM v) AS n_signup_view,
           (SELECT count(*) FROM p) AS n_signup_view_purchase,
           round((SELECT count(*) FROM p) * 1.0
                 / (SELECT count(*) FROM s), 6) AS conversion
    """,
    description=(
        "Ordered-stage funnel (signup -> view -> purchase, strictly "
        "increasing event time per user) with end-to-end conversion rate"
    ),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each stage is a groupBy(user) min-ts bounded by the previous stage's
    timestamp — three shuffles on user_id that AQE plans as one exchange
    reused (same key), then three scalar counts assembled by cross join.
    No collect; the result is a single row at any scale."""
    (events,) = load(spark, sf_dir, "events")
    s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    v = (
        events.join(s, "user_id")
        .filter((F.col("event_type") == "view") & (F.col("ts") > F.col("st")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    p = (
        events.join(v, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("vt")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    ns = s.agg(F.count(F.lit(1)).alias("n_signup"))
    nv = v.agg(F.count(F.lit(1)).alias("n_signup_view"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_signup_view_purchase"))
    return (
        ns.crossJoin(nv)
        .crossJoin(np_)
        .select(
            "n_signup",
            "n_signup_view",
            "n_signup_view_purchase",
            F.round(
                F.col("n_signup_view_purchase") / F.col("n_signup"), 6
            ).alias("conversion"),
        )
    )


@query(
    "cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN first f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, count(*) AS n_users
    FROM act
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
    description=(
        "Daily cohort retention: users bucketed by first-activity day, "
        "distinct-user counts per day offset"
    ),
    bench=True,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first-activity table is |users| rows (tiny next to the event
    stream) — AQE broadcasts it, so the events side never shuffles for the
    join; the distinct and the final aggregate are both map-side
    partial-agg'd shuffles (per-user-day repeats collapse before the wire).
    At dim sizes past broadcast range this degrades to a shuffled join on
    user_id, which the groupBy exchange then reuses."""
    (events,) = load(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(F.to_date(F.min("ts")).alias("cohort_day"))
    act = (
        events.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        act.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


_SESSION_GAP = "INTERVAL '6' HOUR"  # Spark literal
_SESSION_GAP_DUCK = "INTERVAL '6 hours'"


@query(
    "sessionize_events",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ),
    m AS (
      SELECT user_id, ts,
             CASE WHEN prev IS NULL OR ts - prev > {_SESSION_GAP_DUCK}
                  THEN 1 ELSE 0 END AS new_s
      FROM o
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM m
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM s
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
    description=(
        "Gap-based sessionization (6h inactivity splits) via lag + running "
        "sum — the analytic-function twin of session_window_events"
    ),
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on user_id; lag, the running sum, and the final session
    aggregate all run within that partitioning (window + groupBy keys
    share the prefix), so sessionizing 100 TB costs a single exchange."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    o = events.select("user_id", "ts", F.lag("ts").over(w).alias("prev"))
    m = o.select(
        "user_id",
        "ts",
        F.when(
            F.col("prev").isNull()
            | (F.col("ts") - F.col("prev") > F.expr(_SESSION_GAP)),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    s = m.select(
        "user_id",
        "ts",
        F.sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "asof_join_last_view",
    oracle="""
    WITH v AS (
      SELECT user_id, ts AS view_ts, event_id AS view_event_id
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, v.view_event_id, v.view_ts
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts
    ORDER BY p.event_id
    """,
    description=(
        "As-of join: each purchase attributed to the user's most recent "
        "view at-or-before it (last-touch attribution) — the temporal "
        "join Spark lacks natively, vs DuckDB's ASOF JOIN as oracle"
    ),
    bench=True,
)
def asof_join_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable as-of via union + running last-non-null — NOT a per-row
    subquery or range cross-join: both sides union (views tagged 0,
    purchases 1), one shuffle on user_id, one in-partition sort on
    (ts, side), and `last(..., ignorenulls)` carries the latest view
    forward into each purchase row. Cost is sort-shuffle of |events_kept|
    regardless of how many views precede each purchase; at 1000 executors
    the per-user ordering is preserved inside each hash partition so no
    further coordination is needed. Ties at identical ts resolve
    view-first (side asc), matching ASOF's >= semantics.
    """
    (events,) = load(spark, sf_dir, "events")
    v = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.lit(0).alias("side")
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("side")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.col("side") == 0
    return (
        v.unionAll(p)
        .select(
            "user_id", "ts", "event_id", "side",
            F.last(F.when(is_view, F.col("event_id")), ignorenulls=True)
            .over(w)
            .alias("view_event_id"),
            F.last(F.when(is_view, F.col("ts")), ignorenulls=True)
            .over(w)
            .alias("view_ts"),
        )
        .filter(F.col("side") == 1)
        .select("event_id", "user_id", "ts", "view_event_id", "view_ts")
        .orderBy("event_id")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS curr_type, count(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, curr_type, n_transitions,
           round(n_transitions * 1.0
                 / sum(n_transitions) OVER (PARTITION BY prev_type), 6) AS p
    FROM c
    ORDER BY prev_type, curr_type
    """,
    description=(
        "First-order Markov transition matrix over per-user event "
        "sequences: counts and row-normalized probabilities per "
        "(prev_type, curr_type)"
    ),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix (the what-follows-what dashboard).
    One shuffle on user_id orders each user's history for the lag; the
    count matrix is at most |types|² rows, so the normalizing window
    over it is driver-scale. Ties on ts break by event_id in both
    engines — without that the lag would be nondeterministic.
    """
    (events,) = load(spark, sf_dir, "events")
    seq = events.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    c = seq.groupBy(
        F.col("prev_type"), F.col("event_type").alias("curr_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    return c.select(
        "prev_type",
        "curr_type",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(Window.partitionBy("prev_type")),
            6,
        ).alias("p"),
    ).orderBy("prev_type", "curr_type")


_ATTR_WINDOW_DAYS = 7


@query(
    "attribution_linear",
    oracle=f"""
    WITH v AS (
      SELECT user_id, ts AS vts, event_id AS vid FROM events
      WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, ts AS pts, event_id AS pid,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT p.pid, p.cents, v.vid, CAST(v.vts AS DATE) AS view_day,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY v.vts, v.vid) AS rn,
             count(*) OVER (PARTITION BY p.pid) AS k
      FROM p JOIN v
        ON p.user_id = v.user_id
       AND v.vts <= p.pts
       AND v.vts >= p.pts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
    ),
    credit AS (
      SELECT view_day,
             cents // k + CASE WHEN rn <= cents % k THEN 1 ELSE 0 END
               AS credit_cents
      FROM touch
    )
    SELECT view_day,
           count(*) AS n_touches,
           round(sum(credit_cents) / 100.0, 2) AS attributed_revenue
    FROM credit GROUP BY view_day ORDER BY view_day
    """,
    description=(
        "Linear multi-touch attribution: each purchase's value split in "
        "integer cents across the user's views in the prior 7 days "
        "(largest-remainder to earliest touches), rolled up by view day"
    ),
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution with EXACT allocation: purchase value is
    fixed to integer cents, split by integer division across the k
    qualifying touches, remainder cents assigned to the earliest
    touches (largest-remainder) — every engine allocates identical
    cents, and per-purchase credits sum exactly to the purchase. The
    view⋈purchase join is equi-keyed on user_id with the 7-day window
    as residual (the J2 interval-join cost model); the per-purchase
    windows run over each purchase's touch list only.
    """
    (events,) = load(spark, sf_dir, "events")
    v = events.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("event_id").alias("vid")
    )
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    touch = (
        p.join(v, "user_id")
        .where(
            (F.col("vts") <= F.col("pts"))
            & (F.col("vts") >= F.expr(f"pts - INTERVAL {_ATTR_WINDOW_DAYS} DAY"))
        )
        .select(
            "pid",
            "cents",
            F.to_date("vts").alias("view_day"),
            F.row_number()
            .over(Window.partitionBy("pid").orderBy("vts", "vid"))
            .alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("pid")).alias("k"),
        )
    )
    credit = touch.select(
        "view_day",
        (
            F.expr("cents div k")
            + F.when(F.col("rn") <= F.col("cents") % F.col("k"), 1).otherwise(0)
        ).alias("credit_cents"),
    )
    return (
        credit.groupBy("view_day")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum("credit_cents") / 100.0, 2).alias("attributed_revenue"),
        )
        .orderBy("view_day")
    )


@query(
    "user_rfm_features",
    oracle="""
    WITH mx AS (SELECT max(ts) AS max_ts FROM events),
    base AS (
      SELECT user_id,
             datediff('day', CAST(max(ts) AS DATE),
                      (SELECT CAST(max_ts AS DATE) FROM mx)) AS recency_days,
             count(*) AS frequency,
             round(sum(value), 2) AS monetary
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, recency_days, frequency, monetary,
             ntile(5) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
             ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
             ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_score
      FROM base
    )
    SELECT user_id, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS rfm_segment
    FROM scored ORDER BY user_id
    """,
    description=(
        "Per-user RFM feature table: purchase recency/frequency/monetary "
        "with quintile scores and the composite segment code — the "
        "feature-engineering shape for churn/LTV models"
    ),
)
def user_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM featurization. One groupBy(user) builds the base features;
    the three quintile assignments are rank statistics over the (much
    smaller) per-user table — the same single-sort cost class as the
    equi-depth histogram, with deterministic (metric, user_id)
    tie-breaks so segment codes are engine-stable. Best-score
    convention: quintile 1 = most recent / most frequent / highest
    spend.
    """
    from pyspark.sql import Window as W

    (events,) = load(spark, sf_dir, "events")
    p = events.where(F.col("event_type") == "purchase")
    max_day = p.agg(F.to_date(F.max("ts")).alias("d"))
    base = (
        p.groupBy("user_id")
        .agg(
            F.to_date(F.max("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(max_day))
        .select(
            "user_id",
            F.datediff(F.col("d"), F.col("last_day")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    scored = base.select(
        "*",
        F.ntile(5).over(W.orderBy(F.asc("recency_days"), F.asc("user_id"))).alias("r_score"),
        F.ntile(5).over(W.orderBy(F.desc("frequency"), F.asc("user_id"))).alias("f_score"),
        F.ntile(5).over(W.orderBy(F.desc("monetary"), F.asc("user_id"))).alias("m_score"),
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).alias(
            "rfm_segment"
        ),
    ).orderBy("user_id")


_PATH_LEN = 3
_PATH_TOPK = 10


@query(
    "top_session_paths",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             sum(CASE WHEN prev IS NULL OR ts - prev > {_SESSION_GAP_DUCK}
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      FROM o
    ),
    ranked AS (
      SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rn
      FROM s
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= {_PATH_LEN}
      GROUP BY user_id, session_id
      HAVING count(*) = {_PATH_LEN}
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT {_PATH_TOPK}
    """,
    description=(
        "Top session-opening paths: first 3 event types of each gap-based "
        "session, ranked by session count (the navigation-flow dashboard)"
    ),
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining on top of the sessionize machinery: the lag, the
    running session-id sum, the per-session rank, and the path assembly
    all share the user_id partitioning — one data exchange end to end,
    then a tiny groupBy over |paths| strings. Sessions shorter than the
    path length are excluded (HAVING), so every counted path is a full
    prefix. Ties on ts break by event_id in both engines.
    """
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = events.select(
        "user_id", "ts", "event_id", "event_type", F.lag("ts").over(w).alias("prev")
    )
    s = o.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(
            F.when(
                F.col("prev").isNull()
                | (F.col("ts") - F.col("prev") > F.expr(_SESSION_GAP)),
                1,
            ).otherwise(0)
        )
        .over(w)
        .alias("session_id"),
    )
    ranked = s.select(
        "user_id",
        "session_id",
        "event_type",
        F.row_number()
        .over(Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    paths = (
        ranked.where(F.col("rn") <= _PATH_LEN)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.concat_ws(
                ">",
                F.expr("transform(sort_array(collect_list(struct(rn, event_type))), x -> x.event_type)"),
            ).alias("path"),
        )
        .where(F.col("n") == _PATH_LEN)
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(_PATH_TOPK)
    )


@query(
    "ab_test_analysis",
    oracle="""
    WITH assign AS (  -- deterministic 50/50 split on md5(user) parity
      SELECT DISTINCT user_id,
             CASE WHEN (('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 8))
                        ::BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS variant
      FROM events
    ),
    conv AS (
      SELECT a.variant,
             count(*) AS n_users,
             count(p.user_id) AS n_converted
      FROM assign a LEFT JOIN (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 200
      ) p ON p.user_id = a.user_id
      GROUP BY a.variant
    ),
    wide AS (
      SELECT
        max(CASE WHEN variant = 'A' THEN n_users END) AS na,
        max(CASE WHEN variant = 'A' THEN n_converted END) AS ca,
        max(CASE WHEN variant = 'B' THEN n_users END) AS nb,
        max(CASE WHEN variant = 'B' THEN n_converted END) AS cb
      FROM conv
    )
    SELECT na AS n_a, ca AS conv_a, round(ca * 1.0 / na, 6) AS rate_a,
           nb AS n_b, cb AS conv_b, round(cb * 1.0 / nb, 6) AS rate_b,
           round((ca * 1.0 / na) - (cb * 1.0 / nb), 6) AS lift,
           CASE WHEN ca + cb = 0 OR ca + cb = na + nb THEN 0.0
                ELSE round(((ca * 1.0 / na) - (cb * 1.0 / nb))
                     / sqrt(((ca + cb) * 1.0 / (na + nb))
                            * (1 - (ca + cb) * 1.0 / (na + nb))
                            * (1.0 / na + 1.0 / nb)), 6) END AS z_stat
    FROM wide
    """,
    description=(
        "A/B experiment readout: deterministic md5 bucket assignment, "
        "per-variant purchase conversion, lift, and the pooled "
        "two-proportion z statistic"
    ),
)
def ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The experimentation readout as one query. Assignment is the same
    md5-bucket determinism as dataset_split (a user lands in the same
    variant on every engine, rerun, and scale); conversion is a
    distinct-user semi-structure (LEFT JOIN on the converter set);
    the z statistic is a handful of scalar arithmetic ops on exact
    integer counts, rounded once at the end. One corpus scan for
    assignment, one for conversions — both map-side aggregable.
    """
    (events,) = load(spark, sf_dir, "events")
    hv = (
        "cast(conv(substr(md5(cast(concat('ab:', cast(user_id as string)) "
        "as binary)), 1, 8), 16, 10) as bigint)"
    )
    assign = events.select("user_id").distinct().select(
        "user_id",
        F.when(F.expr(f"{hv} % 2") == 0, "A").otherwise("B").alias("variant"),
    )
    # conversion = a HIGH-VALUE purchase (every user purchases something
    # at this event density; value > 200 splits converters ~20/80)
    conv_users = (
        events.where((F.col("event_type") == "purchase") & (F.col("value") > 200))
        .select("user_id")
        .distinct()
    )
    conv = (
        assign.join(
            conv_users.withColumn("converted", F.lit(1)), "user_id", "left"
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("converted").alias("n_converted"),
        )
    )
    wide = conv.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("n_converted"))).alias("ca"),
        F.max(F.when(F.col("variant") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("n_converted"))).alias("cb"),
    )
    ra = F.col("ca") / F.col("na")
    rb = F.col("cb") / F.col("nb")
    pooled = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    return wide.select(
        F.col("na").alias("n_a"),
        F.col("ca").alias("conv_a"),
        F.round(ra, 6).alias("rate_a"),
        F.col("nb").alias("n_b"),
        F.col("cb").alias("conv_b"),
        F.round(rb, 6).alias("rate_b"),
        F.round(ra - rb, 6).alias("lift"),
        # degenerate experiments (0% or 100% pooled conversion) have zero
        # variance: report z = 0 instead of dividing by it
        F.when(
            (F.col("ca") + F.col("cb") == 0)
            | (F.col("ca") + F.col("cb") == F.col("na") + F.col("nb")),
            F.lit(0.0),
        )
        .otherwise(
            F.round(
                (ra - rb)
                / F.sqrt(
                    pooled * (1 - pooled) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
                ),
                6,
            )
        )
        .alias("z_stat"),
    )


@query(
    "markov_eval_accuracy",
    oracle="""
    WITH mid AS (
      SELECT CAST(min(ts) AS DATE) + CAST(floor(date_diff('day',
               CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) / 2) AS INTEGER)
             AS split_day
      FROM events
    ),
    seq AS (
      SELECT user_id, event_type, CAST(ts AS DATE) AS day,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             lag(CAST(ts AS DATE)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_day
      FROM events
    ),
    train AS (  -- transitions fully inside the first half
      SELECT prev_type, event_type, count(*) AS c
      FROM seq CROSS JOIN mid
      WHERE prev_type IS NOT NULL AND day < split_day
      GROUP BY 1, 2
    ),
    pred AS (  -- argmax next-type per prev-type (count desc, type asc)
      SELECT prev_type, event_type AS predicted FROM (
        SELECT prev_type, event_type,
               row_number() OVER (PARTITION BY prev_type
                                  ORDER BY c DESC, event_type) AS rn
        FROM train) WHERE rn = 1
    ),
    test AS (  -- transitions fully inside the second half
      SELECT s.prev_type, s.event_type
      FROM seq s CROSS JOIN mid
      WHERE s.prev_type IS NOT NULL AND s.prev_day >= split_day
    )
    SELECT t.prev_type,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN t.event_type = p.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(sum(CASE WHEN t.event_type = p.predicted THEN 1 ELSE 0 END)
                 / count(*), 6) AS accuracy
    FROM test t JOIN pred p ON p.prev_type = t.prev_type
    GROUP BY t.prev_type
    ORDER BY t.prev_type
    """,
    description=(
        "Markov next-event backtest: argmax transitions trained on the "
        "first half-window, top-1 accuracy measured on the second — the "
        "train/test-split discipline applied to a behavioral model"
    ),
)
def markov_eval_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A sequence model you can actually grade: first-order Markov
    argmax (integer-count tie-break) fit on the first half of the
    window, evaluated out-of-sample on the second. One user_id window
    pass produces both halves' transitions; the model table is at most
    |types|² rows and broadcasts back onto the test transitions —
    corpus-scale work is the single lag() exchange."""
    from pyspark.sql import Window as W

    (events,) = load(spark, sf_dir, "events")
    mid = events.agg(
        F.expr(
            "cast(min(ts) as date) + cast(floor("
            "datediff(cast(max(ts) as date), cast(min(ts) as date)) / 2) as int)"
        ).alias("split_day")
    )
    byu = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.lag("event_type").over(byu).alias("prev_type"),
        F.lag(F.to_date("ts")).over(byu).alias("prev_day"),
    ).crossJoin(F.broadcast(mid))
    train = (
        seq.where(F.col("prev_type").isNotNull() & (F.col("day") < F.col("split_day")))
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pred = (
        train.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("prev_type").orderBy(F.desc("c"), F.asc("event_type"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("prev_type", F.col("event_type").alias("predicted"))
    )
    test = seq.where(
        F.col("prev_type").isNotNull() & (F.col("prev_day") >= F.col("split_day"))
    ).select("prev_type", "event_type")
    hit = F.when(F.col("event_type") == F.col("predicted"), 1).otherwise(0)
    return (
        test.join(F.broadcast(pred), "prev_type")
        .groupBy("prev_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(hit).cast("bigint").alias("n_correct"),
            F.round(F.sum(hit) / F.count(F.lit(1)), 6).alias("accuracy"),
        )
        .orderBy("prev_type")
    )


@query(
    "cuped_ab_adjustment",
    oracle="""
    WITH ext AS (
      SELECT CAST(min(ts) AS DATE) + CAST(floor(date_diff('day',
               CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) / 2) AS INTEGER)
             AS split_day
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'purchase' AND CAST(ts AS DATE) < split_day
                      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS x,
             sum(CASE WHEN event_type = 'purchase' AND CAST(ts AS DATE) >= split_day
                      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS y
      FROM events CROSS JOIN ext
      GROUP BY user_id
    ),
    assigned AS (
      SELECT CASE WHEN (('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 8))
                        ::BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS variant,
             x, y
      FROM per_user
    ),
    pooled AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM assigned
    ),
    theta AS (
      SELECT n, sx,
             round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6) AS th
      FROM pooled
    ),
    per_variant AS (
      SELECT variant, count(*) AS nv, sum(x) AS vx, sum(y) AS vy,
             sum(x * x) AS vxx, sum(x * y) AS vxy, sum(y * y) AS vyy
      FROM assigned GROUP BY variant
    )
    SELECT variant,
           CAST(nv AS BIGINT) AS n_users,
           round(vy * 1.0 / nv / 100, 6) AS mean_metric,
           round((vy * 1.0 / nv
                  - th * (vx * 1.0 / nv - t.sx * 1.0 / t.n)) / 100, 6)
             AS mean_adjusted,
           th AS theta,
           round(1.0 - (
               (vyy * 1.0 / nv - (vy * 1.0 / nv) * (vy * 1.0 / nv))
               - 2 * th * (vxy * 1.0 / nv - (vx * 1.0 / nv) * (vy * 1.0 / nv))
               + th * th * (vxx * 1.0 / nv - (vx * 1.0 / nv) * (vx * 1.0 / nv))
             ) / (vyy * 1.0 / nv - (vy * 1.0 / nv) * (vy * 1.0 / nv)), 6)
             AS var_reduction
    FROM per_variant CROSS JOIN theta t
    ORDER BY variant
    """,
    description=(
        "CUPED variance-reduced A/B readout: pre-period revenue as the "
        "covariate, pooled theta = cov/var from exact integer moments, "
        "adjusted means and per-variant variance reduction evaluated "
        "algebraically from the same moments (no per-user float sums)"
    ),
)
def cuped_ab_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al., WSDM 2013 — public): shrink experiment
    variance by regressing out each user's PRE-period behavior;
    mean_adjusted keeps the same expected lift with tighter error bars,
    var_reduction reports how much tighter.

    Determinism discipline: theta and every adjusted statistic are
    derived ALGEBRAICALLY from exact BIGINT moments (n, Σx, Σy, Σxx,
    Σxy, Σyy per variant and pooled) — the float enters in fixed-shape
    scalar expressions only, never in a data-order-dependent sum. One
    conditional-sum groupBy per user, one per-variant rollup; the same
    md5 assignment as ab_test_analysis keeps variants stable across
    engines and scales.
    """
    (events,) = load(spark, sf_dir, "events")
    mid = events.agg(
        F.expr(
            "cast(min(ts) as date) + cast(floor("
            "datediff(cast(max(ts) as date), cast(min(ts) as date)) / 2) as int)"
        ).alias("split_day")
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    is_p = F.col("event_type") == "purchase"
    per_user = (
        events.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(is_p & (F.to_date("ts") < F.col("split_day")), cents).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(is_p & (F.to_date("ts") >= F.col("split_day")), cents).otherwise(0)
            ).alias("y"),
        )
    )
    hv = (
        "cast(conv(substr(md5(cast(concat('ab:', cast(user_id as string)) "
        "as binary)), 1, 8), 16, 10) as bigint)"
    )
    assigned = per_user.select(
        F.expr(f"case when {hv} % 2 = 0 then 'A' else 'B' end").alias("variant"),
        "x",
        "y",
    )
    pooled = assigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    theta = pooled.select(
        "n",
        "sx",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * 1.0
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("th"),
    )
    pv = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum("x").alias("vx"),
        F.sum("y").alias("vy"),
        F.sum(F.col("x") * F.col("x")).alias("vxx"),
        F.sum(F.col("x") * F.col("y")).alias("vxy"),
        F.sum(F.col("y") * F.col("y")).alias("vyy"),
    )
    mx = F.col("vx") * 1.0 / F.col("nv")
    my = F.col("vy") * 1.0 / F.col("nv")
    var_y = F.col("vyy") * 1.0 / F.col("nv") - my * my
    cov_xy = F.col("vxy") * 1.0 / F.col("nv") - mx * my
    var_x = F.col("vxx") * 1.0 / F.col("nv") - mx * mx
    th = F.col("th")
    return (
        pv.crossJoin(F.broadcast(theta))
        .select(
            "variant",
            F.col("nv").cast("bigint").alias("n_users"),
            F.round(my / 100, 6).alias("mean_metric"),
            F.round(
                (my - th * (mx - F.col("sx") * 1.0 / F.col("n"))) / 100, 6
            ).alias("mean_adjusted"),
            th.alias("theta"),
            F.round(
                1.0 - (var_y - 2 * th * cov_xy + th * th * var_x) / var_y, 6
            ).alias("var_reduction"),
        )
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured path (Spark 4)
# ---------------------------------------------------------------------------


@query(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS sum_k,
           round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 6)
             AS avg_k,
           CAST(min(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS max_k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    description=(
        "Semi-structured props aggregated through Spark 4's VARIANT "
        "type (parse_json -> variant_get typed extraction) instead of "
        "per-row JSON string re-parsing — the open-schema event-payload "
        "path; per event_type count/sum/avg/min/max of $.k"
    ),
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 native semi-structured handling: ``parse_json`` builds a
    binary VARIANT once and ``variant_get`` does typed path extraction
    JVM-side (whole-stage codegen; no Python, no schema declaration up
    front — the open-schema shape Kafka event payloads actually have).
    One scan + one map-side-combined aggregate; at scale the variant
    parse is the same single pass a from_json schema-bound read costs,
    without freezing the schema.

    Reference framing: every reference topic carries free-form JSON
    values (sample-data producers); Lenses SQL browses them without
    declared schemas — VARIANT is the engine-native equivalent.
    """
    (events,) = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# windowed funnel — the time-budgeted variant (ClickHouse windowFunnel shape)
# ---------------------------------------------------------------------------


@query(
    "windowed_funnel_events",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(t1.t1) AS t1, min(e.ts) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.t1
        AND e.ts <= t1.t1 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.t2
        AND e.ts <= t2.t1 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT d.depth,
           CASE d.depth
             WHEN 1 THEN (SELECT count(*) FROM t1)
             WHEN 2 THEN (SELECT count(*) FROM t2)
             ELSE (SELECT count(*) FROM t3)
           END AS n_users_reaching
    FROM (SELECT unnest([1, 2, 3]) AS depth) d
    ORDER BY d.depth
    """,
    description=(
        "Windowed funnel (view -> click -> purchase, whole chain within "
        "24h of the anchor view): per-depth user counts — the "
        "time-budgeted windowFunnel variant next to the unbounded "
        "funnel_conversion"
    ),
)
def windowed_funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same three user-keyed min-aggregations as funnel_conversion (one
    exchange key throughout, AQE reuses it), with every later stage
    bounded by the ANCHOR's 24h budget, not just the previous stage's
    timestamp — the deterministic first-anchor reading of windowFunnel
    (the chain starts at the user's first view; each stage is the
    earliest qualifying event). One row per depth at any scale."""
    (events,) = load(spark, sf_dir, "events")
    t1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        events.join(t1, "user_id")
        .filter(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"), F.min("ts").alias("t2"))
    )
    t3 = (
        events.join(t2, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    depths = spark.range(1, 4).select(F.col("id").cast("int").alias("depth"))
    counts = (
        t1.agg(F.count(F.lit(1)).alias("c1"))
        .crossJoin(t2.agg(F.count(F.lit(1)).alias("c2")))
        .crossJoin(t3.agg(F.count(F.lit(1)).alias("c3")))
    )
    return (
        depths.crossJoin(F.broadcast(counts))
        .select(
            "depth",
            F.when(F.col("depth") == 1, F.col("c1"))
            .when(F.col("depth") == 2, F.col("c2"))
            .otherwise(F.col("c3"))
            .cast("bigint")
            .alias("n_users_reaching"),
        )
        .orderBy("depth")
    )


@query(
    "diff_in_diff_revenue",
    oracle="""
    WITH ext AS (
      SELECT CAST(min(ts) AS DATE) + CAST(floor(date_diff('day',
               CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) / 2) AS INTEGER)
             AS split_day
      FROM events
    ),
    cells AS (
      SELECT CASE WHEN (('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 8))
                        ::BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             CASE WHEN CAST(ts AS DATE) >= split_day THEN 1 ELSE 0 END AS post,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events CROSS JOIN ext
      WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT variant, post, count(*) AS n, sum(cents) AS s
      FROM cells GROUP BY variant, post
    ),
    wide AS (
      SELECT
        max(CASE WHEN variant = 'A' AND post = 0 THEN s * 1.0 / n END) AS pre_a,
        max(CASE WHEN variant = 'A' AND post = 1 THEN s * 1.0 / n END) AS post_a,
        max(CASE WHEN variant = 'B' AND post = 0 THEN s * 1.0 / n END) AS pre_b,
        max(CASE WHEN variant = 'B' AND post = 1 THEN s * 1.0 / n END) AS post_b,
        sum(n) AS n_events
      FROM m
    )
    SELECT CAST(n_events AS BIGINT) AS n_events,
           round(pre_a, 6) AS pre_a_cents, round(post_a, 6) AS post_a_cents,
           round(pre_b, 6) AS pre_b_cents, round(post_b, 6) AS post_b_cents,
           round((post_b - pre_b) - (post_a - pre_a), 6) AS did_cents
    FROM wide
    """,
    description=(
        "Difference-in-differences estimator on purchase revenue: md5-"
        "assigned A/B variants x pre/post midpoint split; the treatment "
        "effect is the B-group's post-pre delta net of the A-group's "
        "trend — exact integer cell moments, fixed-shape float at the end"
    ),
)
def diff_in_diff_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical quasi-experimental estimator (public econometrics;
    same md5 variant assignment and midpoint split as
    ``cuped_ab_adjustment`` so the designs compose). One conditional
    groupBy builds the four (variant, period) cells as exact BIGINT
    (n, sum) moments; every mean and the DiD contrast are fixed-shape
    scalar expressions over them — no order-dependent float sums."""
    (events,) = load(spark, sf_dir, "events")
    mid = events.agg(
        F.expr(
            "cast(min(ts) as date) + cast(floor("
            "datediff(cast(max(ts) as date), cast(min(ts) as date)) / 2) as int)"
        ).alias("split_day")
    )
    hv = (
        "cast(conv(substr(md5(cast(concat('ab:', cast(user_id as string)) "
        "as binary)), 1, 8), 16, 10) as bigint)"
    )
    cells = (
        events.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mid))
        .select(
            F.expr(f"case when {hv} % 2 = 0 then 'A' else 'B' end").alias("variant"),
            F.when(F.to_date("ts") >= F.col("split_day"), 1).otherwise(0).alias("post"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        )
    )
    m = cells.groupBy("variant", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    mean = F.col("s") * 1.0 / F.col("n")
    cell = lambda v, p: F.max(
        F.when((F.col("variant") == v) & (F.col("post") == p), mean)
    )
    wide = m.agg(
        cell("A", 0).alias("pre_a"), cell("A", 1).alias("post_a"),
        cell("B", 0).alias("pre_b"), cell("B", 1).alias("post_b"),
        F.sum("n").alias("n_events"),
    )
    return wide.select(
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("pre_a", 6).alias("pre_a_cents"),
        F.round("post_a", 6).alias("post_a_cents"),
        F.round("pre_b", 6).alias("pre_b_cents"),
        F.round("post_b", 6).alias("post_b_cents"),
        F.round(
            (F.col("post_b") - F.col("pre_b")) - (F.col("post_a") - F.col("pre_a")), 6
        ).alias("did_cents"),
    )


@query(
    "winsorized_stats_value",
    oracle="""
    WITH ev AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    tot AS (SELECT count(*) AS n FROM ev),
    byv AS (SELECT cents, count(*) AS c FROM ev GROUP BY cents),
    cum AS (SELECT cents, sum(c) OVER (ORDER BY cents) AS cc FROM byv),
    k AS (
      SELECT n, greatest(1, CAST(floor(n * 5 / 100) AS BIGINT)) AS kl FROM tot
    ),
    bounds AS (
      SELECT (SELECT min(cents) FROM cum, k WHERE cc >= kl) AS v_lo,
             (SELECT min(cents) FROM cum, k WHERE cc >= n - kl + 1) AS v_hi
    ),
    w AS (
      SELECT least(greatest(ev.cents, b.v_lo), b.v_hi) AS wc
      FROM ev CROSS JOIN bounds b
    ),
    mom AS (SELECT count(*) AS n, sum(wc) AS s, sum(wc * wc) AS ss FROM w)
    SELECT CAST(mom.n AS BIGINT) AS n_events,
           CAST(b.v_lo AS BIGINT) AS lo_cents, CAST(b.v_hi AS BIGINT) AS hi_cents,
           round(s * 1.0 / mom.n, 6) AS win_mean_cents,
           round(sqrt(ss * 1.0 / mom.n - (s * 1.0 / mom.n) * (s * 1.0 / mom.n)), 6)
             AS win_std_cents
    FROM mom CROSS JOIN bounds b
    """,
    description=(
        "Winsorized mean/std of purchase value: clamp at the exact p5/p95 "
        "order statistics (distinct-cents domain, scalable rank lookup) "
        "instead of dropping tails — the robust-statistics twin of "
        "trimmed_mean_value"
    ),
)
def winsorized_stats_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order statistics come from the DISTINCT-cents cumulative table
    (the ``ks_drift_events`` device), so the rank lookup shuffles the
    value domain, never the event count — the 100 TB shape. Clamped
    moments stay exact BIGINT; mean/std are fixed-shape scalar floats."""
    (events,) = load(spark, sf_dir, "events")
    ev = events.filter(F.col("event_type") == "purchase").select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents")
    )
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    byv = ev.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    cum = byv.select(
        "cents", F.sum("c").over(Window.orderBy("cents")).alias("cc")
    )
    k = tot.select(
        "n",
        F.greatest(F.lit(1), F.floor(F.col("n") * 5 / 100)).cast("bigint").alias("kl"),
    )
    ck = cum.crossJoin(F.broadcast(k))
    bounds = (
        ck.filter(F.col("cc") >= F.col("kl"))
        .agg(F.min("cents").alias("v_lo"))
        .crossJoin(
            ck.filter(F.col("cc") >= F.col("n") - F.col("kl") + 1)
            .agg(F.min("cents").alias("v_hi"))
        )
    )
    w = ev.crossJoin(F.broadcast(bounds)).select(
        F.least(F.greatest(F.col("cents"), F.col("v_lo")), F.col("v_hi")).alias("wc"),
        "v_lo", "v_hi",
    )
    mom = w.groupBy("v_lo", "v_hi").agg(
        F.count(F.lit(1)).alias("n"), F.sum("wc").alias("s"),
        F.sum(F.col("wc") * F.col("wc")).alias("ss"),
    )
    mean = F.col("s") * 1.0 / F.col("n")
    return mom.select(
        F.col("n").cast("bigint").alias("n_events"),
        F.col("v_lo").cast("bigint").alias("lo_cents"),
        F.col("v_hi").cast("bigint").alias("hi_cents"),
        F.round(mean, 6).alias("win_mean_cents"),
        F.round(F.sqrt(F.col("ss") * 1.0 / F.col("n") - mean * mean), 6).alias(
            "win_std_cents"
        ),
    )


@query(
    "mann_whitney_ab_test",
    oracle="""
    WITH ev AS (
      SELECT CASE WHEN (('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 8))
                        ::BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    byv AS (
      SELECT cents,
             count(*) AS t,
             sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS tb
      FROM ev GROUP BY cents
    ),
    ranked AS (
      -- 2x the average rank of a tie group is exactly
      -- 2*cum_before + (t + 1): integer, no float ranks anywhere
      SELECT cents, t, tb,
             2 * (sum(t) OVER (ORDER BY cents) - t) + t + 1 AS rank2
      FROM byv
    ),
    agg AS (
      SELECT sum(t) AS n, sum(tb) AS nb,
             sum(tb * rank2) AS r2b,
             sum(t * t * t - t) AS tie3
      FROM ranked
    ),
    u AS (
      SELECT n, nb, n - nb AS na,
             (r2b - nb * (nb + 1)) / 2.0 AS ub,
             tie3
      FROM agg
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(ub, 1) AS u_b,
           round(1.0 - 2.0 * ub / (na * nb), 6) AS rank_biserial,
           round((ub - na * nb / 2.0)
                 / sqrt(na * 1.0 * nb / 12.0
                        * ((n + 1) - tie3 * 1.0 / (n * (n - 1.0)))), 6) AS z
    FROM u
    """,
    description=(
        "Mann-Whitney U test on purchase value between the md5 A/B "
        "variants: tie-averaged ranks kept exactly integral at 2x scale, "
        "tie-corrected normal z and rank-biserial effect size — the "
        "nonparametric companion to ab_test_analysis"
    ),
)
def mann_whitney_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank statistics over the DISTINCT-cents domain (the
    ``ks_drift_events`` device): per distinct value, the tie group's
    doubled average rank is 2*cum_before + t + 1 — pure integers, so
    R_B, U_B, and the tie-correction term Σ(t³−t) are exact BIGINT sums
    regardless of row order; the z and effect-size floats are one
    fixed-shape expression each. Shuffle width is the value domain,
    never the event count."""
    (events,) = load(spark, sf_dir, "events")
    hv = (
        "cast(conv(substr(md5(cast(concat('ab:', cast(user_id as string)) "
        "as binary)), 1, 8), 16, 10) as bigint)"
    )
    ev = events.filter(F.col("event_type") == "purchase").select(
        F.expr(f"case when {hv} % 2 = 0 then 'A' else 'B' end").alias("variant"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    byv = ev.groupBy("cents").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0)).alias("tb"),
    )
    w = Window.orderBy("cents")
    ranked = byv.select(
        "cents", "t", "tb",
        (2 * (F.sum("t").over(w) - F.col("t")) + F.col("t") + 1).alias("rank2"),
    )
    agg = ranked.agg(
        F.sum("t").alias("n"), F.sum("tb").alias("nb"),
        F.sum(F.col("tb") * F.col("rank2")).alias("r2b"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    na = F.col("n") - F.col("nb")
    ub = (F.col("r2b") - F.col("nb") * (F.col("nb") + 1)) / 2.0
    sigma = F.sqrt(
        na * 1.0 * F.col("nb") / 12.0
        * ((F.col("n") + 1) - F.col("tie3") * 1.0 / (F.col("n") * (F.col("n") - 1.0)))
    )
    return agg.select(
        na.cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(ub, 1).alias("u_b"),
        F.round(1.0 - 2.0 * ub / (na * F.col("nb")), 6).alias("rank_biserial"),
        F.round((ub - na * F.col("nb") / 2.0) / sigma, 6).alias("z"),
    )
