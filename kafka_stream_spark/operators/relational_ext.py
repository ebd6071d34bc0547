"""Extended relational surface (SURVEY.md §2 long tail).

Covers the operators Spark gives for free once exposed (§2.5 "grouping
sets / rollup ... nonetheless free via Catalyst", §2.6 W3 analytic frames,
§2.7 U1 union-of-topics) plus P2 regex extraction and correlated
subqueries — each with a DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query


@query(
    "q6_revenue_change",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    description="Single-scan filter+agg (TPC-H Q6 shape): pure pushdown, no join",
    bench=True,
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@query(
    "rollup_order_status",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    description="ROLLUP hierarchy totals (free via Catalyst, SURVEY.md §2.5 note)",
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@query(
    "union_event_streams",
    oracle="""
    SELECT kind, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM (
      SELECT 'engagement' AS kind, value FROM events WHERE event_type IN ('click', 'view')
      UNION ALL
      SELECT 'conversion' AS kind, value FROM events WHERE event_type IN ('signup', 'purchase')
    )
    GROUP BY kind
    ORDER BY kind
    """,
    description="Union/merge of topic streams (SURVEY.md U1: nullsink 4-topic fan-in)",
)
def union_event_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    eng = events.filter(F.col("event_type").isin("click", "view")).select(
        F.lit("engagement").alias("kind"), "value"
    )
    conv = events.filter(F.col("event_type").isin("signup", "purchase")).select(
        F.lit("conversion").alias("kind"), "value"
    )
    return (
        eng.unionByName(conv)
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("kind")
    )


@query(
    "count_records",
    oracle="""
    SELECT 'events' AS dataset, count(*) AS n FROM events
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'documents', count(*) FROM documents
    ORDER BY dataset
    """,
    description="Topic record counts (SURVEY.md A7: topics-UI sizing, perf-test counts)",
)
def count_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    events, lineitem, documents = load(spark, sf_dir, "events", "lineitem", "documents")
    rows = [
        events.agg(F.lit("events").alias("dataset"), F.count(F.lit(1)).alias("n")),
        lineitem.agg(F.lit("lineitem").alias("dataset"), F.count(F.lit(1)).alias("n")),
        documents.agg(F.lit("documents").alias("dataset"), F.count(F.lit(1)).alias("n")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("dataset")


@query(
    "running_revenue_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(avg(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderkey
    """,
    description="Window frames: running total + 3-row moving average (W3)",
)
def running_revenue_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
            ).alias("running_total"),
            F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 6).alias("moving_avg3"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "above_avg_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_above
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = orders.o_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    description="Correlated scalar subquery: orders above the customer's own average",
)
def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load(spark, sf_dir, "customer", "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("ak")).agg(
        F.avg("o_totalprice").alias("cust_avg")
    )
    return (
        orders.join(per_cust, F.col("o_custkey") == F.col("ak"))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_above"))
        .orderBy("c_mktsegment")
    )


@query(
    "regex_extract_source",
    oracle="""
    SELECT CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INTEGER) AS source_num,
           count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
    FROM documents
    GROUP BY source_num
    ORDER BY source_num
    """,
    description="Regex field extraction + restructure (SURVEY.md P2, put.sh:47-55 shape)",
)
def regex_extract_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return (
        documents.select(
            F.regexp_extract("source", r"src([0-9]+)", 1).cast("int").alias("source_num"),
            "n_chars",
        )
        .groupBy("source_num")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.round(F.avg("n_chars"), 6).alias("avg_chars"))
        .orderBy("source_num")
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey, round(o_totalprice, 2) AS totalprice, sum_qty
    FROM (
      SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    ) big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
    description="Agg-filter-join pipeline (TPC-H Q18 shape): HAVING pushes the join input down",
    bench=True,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = load(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 150)
        .select("l_orderkey", F.round("raw_qty", 2).alias("sum_qty"))
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "sum_qty")
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "dq_audit",
    oracle="""
    SELECT 'lineitem_orphan_orderkey' AS check_name,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_violations,
           (SELECT count(*) FROM lineitem) AS n_checked
    UNION ALL
    SELECT 'orders_orphan_custkey',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'orders_duplicate_pk',
           (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM
              (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'lineitem_nonpositive_quantity',
           (SELECT count(*) FROM lineitem WHERE l_quantity <= 0),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'lineitem_discount_out_of_range',
           (SELECT count(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 1),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'events_unknown_type',
           (SELECT count(*) FROM events
            WHERE event_type NOT IN
              ('click', 'view', 'purchase', 'signup', 'error')),
           (SELECT count(*) FROM events)
    UNION ALL
    SELECT 'events_null_value',
           (SELECT count(*) FROM events WHERE value IS NULL),
           (SELECT count(*) FROM events)
    ORDER BY check_name
    """,
    description=(
        "Data-quality audit: referential integrity (orphan foreign keys), "
        "primary-key uniqueness, domain and null checks — one row per "
        "check with violation counts"
    ),
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline-gate audit (Great-Expectations/DBT-tests shape) as
    one query. Referential checks are LeftAnti joins (key-hashed, no
    payload movement); uniqueness is a groupBy on the key; domain/null
    checks are single-scan conditional counts that Catalyst collapses
    into one pass per table. Every check emits (violations, checked) so
    a gate thresholds on rates, not absolutes, at any scale.
    """
    (lineitem, orders, customer, events) = load(
        spark, sf_dir, "lineitem", "orders", "customer", "events"
    )

    def _one(name, viol_df, total_df):
        return (
            viol_df.agg(F.count(F.lit(1)).alias("n_violations"))
            .crossJoin(total_df.agg(F.count(F.lit(1)).alias("n_checked")))
            .select(
                F.lit(name).alias("check_name"), "n_violations", "n_checked"
            )
        )

    dup_orders = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("n_violations"))
        .crossJoin(orders.agg(F.count(F.lit(1)).alias("n_checked")))
        .select(
            F.lit("orders_duplicate_pk").alias("check_name"),
            "n_violations",
            "n_checked",
        )
    )
    checks = [
        _one(
            "lineitem_orphan_orderkey",
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem["l_orderkey"] == orders["o_orderkey"],
                "left_anti",
            ),
            lineitem,
        ),
        _one(
            "orders_orphan_custkey",
            orders.join(
                customer.select("c_custkey"),
                orders["o_custkey"] == customer["c_custkey"],
                "left_anti",
            ),
            orders,
        ),
        dup_orders,
        _one(
            "lineitem_nonpositive_quantity",
            lineitem.where(F.col("l_quantity") <= 0),
            lineitem,
        ),
        _one(
            "lineitem_discount_out_of_range",
            lineitem.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            lineitem,
        ),
        _one(
            "events_unknown_type",
            events.where(
                ~F.col("event_type").isin(
                    "click", "view", "purchase", "signup", "error"
                )
            ),
            events,
        ),
        _one("events_null_value", events.where(F.col("value").isNull()), events),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


@query(
    "profile_orders_columns",
    oracle="""
    WITH s AS (
      SELECT count(*) AS n,
             count(DISTINCT o_orderkey) AS ndv_orderkey,
             count(o_orderkey) AS nn_orderkey,
             CAST(round(min(o_orderkey), 2) AS DOUBLE) AS min_orderkey,
             CAST(round(max(o_orderkey), 2) AS DOUBLE) AS max_orderkey,
             count(DISTINCT o_custkey) AS ndv_custkey,
             count(o_custkey) AS nn_custkey,
             CAST(round(min(o_custkey), 2) AS DOUBLE) AS min_custkey,
             CAST(round(max(o_custkey), 2) AS DOUBLE) AS max_custkey,
             count(DISTINCT o_orderstatus) AS ndv_status,
             count(o_orderstatus) AS nn_status,
             count(DISTINCT o_totalprice) AS ndv_price,
             count(o_totalprice) AS nn_price,
             CAST(round(min(o_totalprice), 2) AS DOUBLE) AS min_price,
             CAST(round(max(o_totalprice), 2) AS DOUBLE) AS max_price,
             count(DISTINCT o_orderpriority) AS ndv_priority,
             count(o_orderpriority) AS nn_priority
      FROM orders
    )
    SELECT col, CAST(ndv AS BIGINT) AS ndv, CAST(n - nn AS BIGINT) AS null_count,
           min_num, max_num
    FROM s, LATERAL (VALUES
      ('o_custkey', ndv_custkey, nn_custkey, min_custkey, max_custkey),
      ('o_orderkey', ndv_orderkey, nn_orderkey, min_orderkey, max_orderkey),
      ('o_orderpriority', ndv_priority, nn_priority, NULL, NULL),
      ('o_orderstatus', ndv_status, nn_status, NULL, NULL),
      ('o_totalprice', ndv_price, nn_price, min_price, max_price)
    ) AS t(col, ndv, nn, min_num, max_num)
    ORDER BY col
    """,
    description=(
        "Column profiling (exact NDV, null counts, numeric ranges) in "
        "ONE aggregation pass + an unpivot — the stats a catalog/CBO "
        "or data-quality dashboard records per table"
    ),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE-EXTENDED-style table profile. Every statistic computes
    in a single scan + single aggregate (Spark evaluates the distinct
    aggregates via one Expand, the same machinery as grouping sets);
    the unpivot to one-row-per-column is a stack() over the 1-row
    result — no second pass, no per-column jobs. At 100 TB swap exact
    NDV for approx_count_distinct and the plan is otherwise unchanged."""
    (orders,) = load(spark, sf_dir, "orders")
    s = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderkey").alias("ndv_orderkey"),
        F.count("o_orderkey").alias("nn_orderkey"),
        F.round(F.min("o_orderkey"), 2).cast("double").alias("min_orderkey"),
        F.round(F.max("o_orderkey"), 2).cast("double").alias("max_orderkey"),
        F.countDistinct("o_custkey").alias("ndv_custkey"),
        F.count("o_custkey").alias("nn_custkey"),
        F.round(F.min("o_custkey"), 2).cast("double").alias("min_custkey"),
        F.round(F.max("o_custkey"), 2).cast("double").alias("max_custkey"),
        F.countDistinct("o_orderstatus").alias("ndv_status"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_totalprice").alias("ndv_price"),
        F.count("o_totalprice").alias("nn_price"),
        F.round(F.min("o_totalprice"), 2).cast("double").alias("min_price"),
        F.round(F.max("o_totalprice"), 2).cast("double").alias("max_price"),
        F.countDistinct("o_orderpriority").alias("ndv_priority"),
        F.count("o_orderpriority").alias("nn_priority"),
    )
    unpivot = F.expr(
        """stack(5,
        'o_custkey', ndv_custkey, nn_custkey, min_custkey, max_custkey,
        'o_orderkey', ndv_orderkey, nn_orderkey, min_orderkey, max_orderkey,
        'o_orderpriority', ndv_priority, nn_priority,
            cast(null as double), cast(null as double),
        'o_orderstatus', ndv_status, nn_status,
            cast(null as double), cast(null as double),
        'o_totalprice', ndv_price, nn_price, min_price, max_price
        ) AS (col, ndv, nn, min_num, max_num)"""
    )
    return (
        s.select("n", unpivot)
        .select(
            "col",
            F.col("ndv").cast("bigint").alias("ndv"),
            (F.col("n") - F.col("nn")).cast("bigint").alias("null_count"),
            "min_num",
            "max_num",
        )
        .orderBy("col")
    )


@query(
    "skyline_orders",
    oracle="""
    WITH r AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             CAST(o_orderdate AS DATE) AS day,
             min(CAST(o_orderdate AS DATE)) OVER (
               ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                        CAST(o_orderdate AS DATE),
                        o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_day
      FROM orders
    )
    SELECT o_orderkey, price_cents, day
    FROM r WHERE best_day IS NULL OR day < best_day
    ORDER BY price_cents DESC, o_orderkey
    """,
    description=(
        "2-D skyline (Pareto front: maximal price, earliest date) via "
        "the sort + running-extreme trick — O(n log n), one window pass, "
        "no dominance self-join"
    ),
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-criteria dominance (Börzsönyi et al. 2001's SKYLINE OF,
    public): an order is on the front iff no other order has BOTH a
    higher price AND an earlier-or-equal date. The naive plan is an
    O(n²) NOT EXISTS self-join; in 2-D it collapses to one sorted
    window: scan by price descending and keep a row iff its date beats
    the running minimum of everything pricier. Ties are resolved by the
    (date, orderkey) sort so the front is deterministic. One exchange,
    one sort — the same envelope as any ranking window; at 100 TB the
    price-descending range partitioning shards the scan."""
    from pyspark.sql import Window as W

    (orders,) = load(spark, sf_dir, "orders")
    r = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("price_cents"),
        F.to_date("o_orderdate").alias("day"),
    ).withColumn(
        "best_day",
        F.min("day").over(
            W.orderBy(F.desc("price_cents"), F.asc("day"), F.asc("o_orderkey"))
            .rowsBetween(W.unboundedPreceding, -1)
        ),
    )
    return (
        r.filter(F.col("best_day").isNull() | (F.col("day") < F.col("best_day")))
        .select("o_orderkey", "price_cents", "day")
        .orderBy(F.desc("price_cents"), "o_orderkey")
    )


@query(
    "reconcile_order_totals",
    oracle="""
    WITH recomputed AS (
      SELECT l_orderkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount)
                            * (1 + l_tax) * 100, 0) AS BIGINT)) AS line_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS fact_cents,
             r.line_cents
      FROM orders o LEFT JOIN recomputed r ON r.l_orderkey = o.o_orderkey
    ),
    classified AS (
      SELECT CASE WHEN line_cents IS NULL THEN 'orphan_order'
                  WHEN abs(fact_cents - line_cents) <= 1 THEN 'match'
                  WHEN fact_cents > line_cents THEN 'fact_high'
                  ELSE 'fact_low' END AS status,
             coalesce(abs(fact_cents - line_cents), 0) AS abs_diff
      FROM joined
    ),
    order_side AS (
      SELECT status, count(*) AS n_keys,
             CAST(sum(abs_diff) AS BIGINT) AS sum_abs_diff_cents,
             CAST(max(abs_diff) AS BIGINT) AS max_abs_diff_cents
      FROM classified GROUP BY status
    ),
    line_side AS (
      SELECT 'orphan_lineitem' AS status,
             count(DISTINCT l.l_orderkey) AS n_keys,
             CAST(0 AS BIGINT) AS sum_abs_diff_cents,
             CAST(0 AS BIGINT) AS max_abs_diff_cents
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      HAVING count(*) > 0
    )
    SELECT status, CAST(n_keys AS BIGINT) AS n_keys,
           sum_abs_diff_cents, max_abs_diff_cents
    FROM (SELECT * FROM order_side UNION ALL SELECT * FROM line_side)
    ORDER BY status
    """,
    description=(
        "Fact-vs-detail reconciliation: every order's header total "
        "recomputed from its line items in exact integer cents, "
        "classified match / fact_high / fact_low / orphan_order (plus "
        "orphan line items) with absolute-deviation totals — the "
        "cross-table DQ check dq_audit's single-table constraints miss"
    ),
    bench=True,
)
def reconcile_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reconciliation every warehouse runs between a fact header
    and its detail rows (and the referential-integrity orphan scan in
    the same pass). Scale shape: ONE groupBy on the detail table
    (map-side partial; the per-row cent rounding happens before the
    sum, so the aggregate is an order-independent integer), ONE
    full-outer join on the shared key answering both orphan legs at
    once (left-null = orphan lineitem group, right-null = orphan
    order), one |statuses|-row aggregate — a single lineitem scan and
    a single shuffle on l_orderkey/o_orderkey. All deviations exact
    BIGINT cents.
    """
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    recomputed = lineitem.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100,
                0,
            ).cast("bigint")
        ).alias("line_cents")
    )
    # ONE full-outer join answers both legs (guide §1.2 / §2.4: the
    # round-6 version scanned lineitem twice and joined twice — the
    # orphan-lineitem leg was a separate left-anti join): a right-null
    # row is an orphan order, a LEFT-null row is an orphan lineitem
    # group (count of groups == count(DISTINCT l_orderkey) of the old
    # anti-join leg, and absent entirely when there are none — same
    # HAVING semantics). Orphan-lineitem rows carry abs_diff NULL which
    # coalesces to 0, so one |statuses|-row aggregate serves all legs.
    joined = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("fact_cents"),
    ).join(recomputed, F.col("l_orderkey") == F.col("o_orderkey"), "full_outer")
    status = (
        F.when(F.col("o_orderkey").isNull(), "orphan_lineitem")
        .when(F.col("line_cents").isNull(), "orphan_order")
        .when(F.abs(F.col("fact_cents") - F.col("line_cents")) <= 1, "match")
        .when(F.col("fact_cents") > F.col("line_cents"), "fact_high")
        .otherwise("fact_low")
    )
    abs_diff = F.coalesce(
        F.abs(F.col("fact_cents") - F.col("line_cents")), F.lit(0)
    )
    return (
        joined.select(status.alias("status"), abs_diff.alias("abs_diff"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("abs_diff").cast("bigint").alias("sum_abs_diff_cents"),
            F.max("abs_diff").cast("bigint").alias("max_abs_diff_cents"),
        )
        .orderBy("status")
    )


@query(
    "prorate_penny_allocation",
    oracle="""
    WITH w AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
      FROM lineitem
    ),
    tot AS (
      SELECT *, sum(cents) OVER (PARTITION BY l_orderkey) AS W
      FROM w
    ),
    base AS (
      SELECT *,
             (W // 10) AS target,
             ((W // 10) * cents) // W AS base_alloc,
             ((W // 10) * cents) % W AS rem
      FROM tot
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY rem DESC, l_linenumber) AS rk,
             (W // 10) - sum(base_alloc) OVER (PARTITION BY l_orderkey)
               AS leftover
      FROM base
    ),
    alloc AS (
      SELECT l_orderkey, target,
             base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
      FROM ranked
    )
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(any_value(target) AS BIGINT) AS target_cents,
           CAST(sum(alloc) AS BIGINT) AS alloc_sum_cents,
           CAST(max(alloc) AS BIGINT) AS max_alloc_cents,
           CAST(min(alloc) AS BIGINT) AS min_alloc_cents
    FROM alloc
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
    description=(
        "Penny-exact proration: a 10% order-level discount allocated "
        "across line items by the largest-remainder method — floor "
        "shares plus rank-ordered remainder pennies, so every order's "
        "allocations sum EXACTLY to its target (alloc_sum == target "
        "row by row); pure integer arithmetic"
    ),
    bench=True,
)
def prorate_penny_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The allocation problem behind every invoice/discount/tax split:
    proportional shares truncate, and the lost pennies must land
    deterministically (largest remainder, Hamilton's method — public).
    Scale shape: every step partitions by l_orderkey — the window sum,
    the remainder rank, the leftover sum, and the final groupBy all
    reuse ONE hash partitioning of the detail table (AQE coalesces the
    plan to a single data exchange). Integer products bound: target *
    cents < 2^63 through ~per-order totals of 10^9 cents.
    """
    from pyspark.sql import Window as W

    (lineitem,) = load(spark, sf_dir, "lineitem")
    byo = W.partitionBy("l_orderkey")
    w = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("cents"),
    )
    tot = w.withColumn("W", F.sum("cents").over(byo))
    base = tot.select(
        "*",
        F.expr("W div 10").alias("target"),
        F.expr("((W div 10) * cents) div W").alias("base_alloc"),
        F.expr("((W div 10) * cents) % W").alias("rem"),
    )
    ranked = base.select(
        "*",
        F.row_number()
        .over(byo.orderBy(F.desc("rem"), F.asc("l_linenumber")))
        .alias("rk"),
        (F.col("target") - F.sum("base_alloc").over(byo)).alias("leftover"),
    )
    alloc = ranked.select(
        "l_orderkey",
        "target",
        (
            F.col("base_alloc")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc"),
    )
    return (
        alloc.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.first("target").cast("bigint").alias("target_cents"),
            F.sum("alloc").cast("bigint").alias("alloc_sum_cents"),
            F.max("alloc").cast("bigint").alias("max_alloc_cents"),
            F.min("alloc").cast("bigint").alias("min_alloc_cents"),
        )
        .orderBy("l_orderkey")
    )


@query(
    "snapshot_diff_orders",
    oracle="""
    WITH current AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
      FROM orders WHERE o_orderkey % 101 <> 0
    ),
    prior AS (  -- deterministic simulated previous snapshot
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             CAST(round(o_totalprice * 100, 0) AS BIGINT)
               + CASE WHEN o_orderkey % 83 = 0 THEN 10000 ELSE 0 END
               AS price_cents
      FROM orders WHERE o_orderkey % 97 <> 0
    ),
    joined AS (
      SELECT coalesce(c.o_orderkey, p.o_orderkey) AS k,
             c.o_orderkey IS NULL AS only_prior,
             p.o_orderkey IS NULL AS only_current,
             CASE WHEN c.o_orderkey IS NOT NULL AND p.o_orderkey IS NOT NULL
                   AND c.o_orderstatus <> p.o_orderstatus THEN 1 ELSE 0 END
               AS status_diff,
             CASE WHEN c.o_orderkey IS NOT NULL AND p.o_orderkey IS NOT NULL
                   AND c.price_cents <> p.price_cents THEN 1 ELSE 0 END
               AS price_diff
      FROM current c FULL OUTER JOIN prior p ON p.o_orderkey = c.o_orderkey
    ),
    classed AS (
      SELECT CASE WHEN only_prior THEN 'removed'
                  WHEN only_current THEN 'added'
                  WHEN status_diff = 1 OR price_diff = 1 THEN 'changed'
                  ELSE 'unchanged' END AS diff_class,
             status_diff, price_diff
      FROM joined
    )
    SELECT diff_class,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(status_diff) AS BIGINT) AS n_status_diff,
           CAST(sum(price_diff) AS BIGINT) AS n_price_diff
    FROM classed
    GROUP BY diff_class
    ORDER BY diff_class
    """,
    description=(
        "Snapshot diff (the data-diff/CDC reconciliation shape): full "
        "outer join of two table versions on the key, rows classified "
        "added/removed/changed/unchanged with per-column change counts "
        "— prior snapshot simulated deterministically from the same "
        "parquet so the whole diff is oracle-exact"
    ),
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'what changed between yesterday's table and today's' audit:
    one key-partitioned FULL OUTER JOIN (both sides shuffle once on the
    shared key — at scale both snapshots are bucketed on it and the
    join is exchange-free), null-side membership classifies add/remove,
    column inequality classifies change, and per-column counters say
    WHERE the churn is. All comparisons integer/string exact.
    """
    (orders,) = load(spark, sf_dir, "orders")
    price = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    current = orders.filter(F.expr("o_orderkey % 101 <> 0")).select(
        F.col("o_orderkey").alias("ck"),
        F.col("o_orderstatus").alias("cs"),
        price.alias("cp"),
    )
    prior = orders.filter(F.expr("o_orderkey % 97 <> 0")).select(
        F.col("o_orderkey").alias("pk"),
        F.expr("case when o_orderkey % 89 = 0 then 'X' else o_orderstatus end").alias(
            "ps"
        ),
        (price + F.expr("case when o_orderkey % 83 = 0 then 10000 else 0 end")).alias(
            "pp"
        ),
    )
    joined = current.join(prior, F.col("pk") == F.col("ck"), "full_outer")
    status_diff = F.when(
        F.col("ck").isNotNull() & F.col("pk").isNotNull() & (F.col("cs") != F.col("ps")),
        1,
    ).otherwise(0)
    price_diff = F.when(
        F.col("ck").isNotNull() & F.col("pk").isNotNull() & (F.col("cp") != F.col("pp")),
        1,
    ).otherwise(0)
    diff_class = (
        F.when(F.col("ck").isNull(), "removed")
        .when(F.col("pk").isNull(), "added")
        .when((status_diff == 1) | (price_diff == 1), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            diff_class.alias("diff_class"),
            status_diff.alias("status_diff"),
            price_diff.alias("price_diff"),
        )
        .groupBy("diff_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("status_diff").cast("bigint").alias("n_status_diff"),
            F.sum("price_diff").cast("bigint").alias("n_price_diff"),
        )
        .orderBy("diff_class")
    )


@query(
    "diversified_topk_orders",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS per_cust
      FROM orders
    )
    SELECT o_orderkey, o_custkey, price_cents,
           CAST(per_cust AS BIGINT) AS per_cust_rank
    FROM ranked
    WHERE per_cust <= 2
    ORDER BY price_cents DESC, o_orderkey
    LIMIT 25
    """,
    description=(
        "Diversity-constrained top-k: the 25 highest-value orders with "
        "AT MOST 2 per customer — the result-diversification shape "
        "(search results, recommendations, account review queues) a "
        "plain ORDER BY LIMIT cannot express"
    ),
)
def diversified_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group cap then global top-k: one window partitioned by the
    diversity key ranks within customers, the cap filter drops
    over-represented rows BEFORE the global selection, and the final
    LIMIT plans as TakeOrderedAndProject (per-partition top-25 heaps,
    no global sort — the same plan contract as topk_orders, asserted in
    the plan tests). Deterministic (price, orderkey) tie-breaks at both
    levels.
    """
    from pyspark.sql import Window as W

    (orders,) = load(spark, sf_dir, "orders")
    ranked = orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("price_cents"),
        F.row_number()
        .over(W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey"))
        .alias("per_cust"),
    )
    return (
        ranked.filter(F.col("per_cust") <= 2)
        .select(
            "o_orderkey",
            "o_custkey",
            "price_cents",
            F.col("per_cust").cast("bigint").alias("per_cust_rank"),
        )
        .orderBy(F.desc("price_cents"), "o_orderkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# collaborative-filtering neighbors + promo elasticity
# ---------------------------------------------------------------------------

_UU_MAX_BUYERS = 25  # ignore ubiquitous parts (the posting-list hub cap)
_UU_MIN_SHARED = 2
_UU_TOPK = 25


@query(
    "user_similarity_parts",
    oracle=f"""
    WITH up AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    rare AS (
      SELECT p FROM up GROUP BY p
      HAVING count(*) <= {_UU_MAX_BUYERS}
    ),
    upr AS (SELECT u, up.p FROM up JOIN rare ON rare.p = up.p),
    sizes AS (SELECT u, count(*) AS n FROM upr GROUP BY u),
    pairs AS (
      SELECT a.u AS ua, b.u AS ub, count(*) AS shared
      FROM upr a JOIN upr b ON a.p = b.p AND a.u < b.u
      GROUP BY a.u, b.u
      HAVING count(*) >= {_UU_MIN_SHARED}
    )
    SELECT p.ua AS cust_a, p.ub AS cust_b,
           CAST(p.shared AS BIGINT) AS shared_parts,
           CAST(p.shared * 1000000 // (sa.n + sb.n - p.shared) AS BIGINT)
             AS jaccard_u
    FROM pairs p
    JOIN sizes sa ON sa.u = p.ua
    JOIN sizes sb ON sb.u = p.ub
    ORDER BY jaccard_u DESC, cust_a, cust_b
    LIMIT {_UU_TOPK}
    """,
    description=(
        "User-user collaborative-filtering neighbors: Jaccard over "
        "purchased part sets (posting-list join on the part, ubiquitous "
        f"parts above {_UU_MAX_BUYERS} buyers excluded — the IDF-style "
        "hub cap), integer micro-Jaccard, top-25 most similar pairs"
    ),
)
def user_similarity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The item-based posting-list join (never |users|^2): pair mass is
    Sum over kept parts of buyers^2, explicitly bounded by the hub cap —
    the same candidate-bounding idea as dedup_ngram_jaccard's posting
    lists, applied to the bipartite purchase graph. All integer outputs
    (micro-Jaccard by truncating division) keep both engines exact."""
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    up = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    rare = (
        up.groupBy("p")
        .agg(F.count(F.lit(1)).alias("buyers"))
        .where(F.col("buyers") <= _UU_MAX_BUYERS)
        .select("p")
    )
    upr = up.join(rare, "p").localCheckpoint()
    sizes = upr.groupBy("u").agg(F.count(F.lit(1)).alias("n"))
    a = upr.select(F.col("u").alias("ua"), "p")
    b = upr.select(F.col("u").alias("ub"), "p")
    pairs = (
        a.join(b, "p")
        .where(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= _UU_MIN_SHARED)
    )
    return (
        pairs.join(sizes.select(F.col("u").alias("ua"), F.col("n").alias("na")), "ua")
        .join(sizes.select(F.col("u").alias("ub"), F.col("n").alias("nb")), "ub")
        .select(
            F.col("ua").alias("cust_a"),
            F.col("ub").alias("cust_b"),
            F.col("shared").cast("bigint").alias("shared_parts"),
            F.expr("CAST(shared * 1000000 div (na + nb - shared) AS BIGINT)")
            .alias("jaccard_u"),
        )
        .orderBy(F.desc("jaccard_u"), "cust_a", "cust_b")
        .limit(_UU_TOPK)
    )


@query(
    "discount_elasticity_brands",
    oracle="""
    WITH pts AS (
      SELECT p.p_brand,
             CAST(round(l.l_discount * 100) AS BIGINT) AS x,
             CAST(l.l_quantity AS BIGINT) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    mom AS (
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pts GROUP BY p_brand
    )
    SELECT p_brand,
           n AS n_lines,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6)
             AS qty_per_discount_pt,
           round(((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6)
             AS r2
    FROM mom ORDER BY p_brand
    """,
    description=(
        "Promo elasticity per brand: exact-integer OLS of line quantity "
        "on discount points — the retail promo-effectiveness readout "
        "(same five-moment engine-exact fit as ols_daily_trend)"
    ),
)
def discount_elasticity_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One lineitem⋈part join (AQE broadcasts the dim at bench scale)
    then a 25-group integer moment rollup with map-side combine — a
    single corpus pass; the fit itself is algebra over six BIGINTs."""
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    pts = lineitem.join(
        part.select("p_partkey", "p_brand"),
        lineitem.l_partkey == part.p_partkey,
    ).select(
        "p_brand",
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x"),
        F.col("l_quantity").cast("bigint").alias("y"),
    )
    mom = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return mom.select(
        "p_brand",
        F.col("n").alias("n_lines"),
        F.round(num * 1.0 / denx, 6).alias("qty_per_discount_pt"),
        F.round((num * 1.0 * num) / (denx * 1.0 * deny), 6).alias("r2"),
    ).orderBy("p_brand")


# ---------------------------------------------------------------------------
# CDC changelog fold (Debezium-shape current table)
# ---------------------------------------------------------------------------


@query(
    "cdc_latest_state_orders",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
      FROM orders
    ),
    changes AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, price_cents,
             'c' AS _op, o_orderkey * 10 AS _lsn FROM base
      UNION ALL
      SELECT o_orderkey, o_custkey, 'P', price_cents + 1000,
             'u', o_orderkey * 10 + 5 FROM base WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, price_cents,
             'd', o_orderkey * 10 + 9 FROM base WHERE o_orderkey % 7 = 0
    ),
    latest AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY _lsn DESC) AS rn
      FROM changes
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, price_cents
    FROM latest WHERE rn = 1 AND _op <> 'd'
    ORDER BY o_orderkey
    """,
    description=(
        "CDC changelog fold: a synthesized Debezium-shape create/update/"
        "delete stream over orders collapses to the current table — "
        "lsn-ordered arg-max per key, deletes as tombstones (the "
        "log-compaction rule; functions/cdc.py is the envelope decoder "
        "this fold sits behind)"
    ),
)
def cdc_latest_state_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives ``functions.cdc.fold_latest_state`` through the driver
    gate on a deterministic changelog: every order creates, every third
    updates (status 'P', +10.00), every seventh deletes — update lsn
    outranks create, delete outranks both. One max_by shuffle."""
    from kafka_stream_spark.functions.cdc import fold_latest_state

    (orders,) = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("price_cents"),
    )
    creates = base.select(
        "*", F.lit("c").alias("_op"), (F.col("o_orderkey") * 10).alias("_lsn")
    )
    updates = base.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey",
        F.lit("P").alias("o_orderstatus"),
        (F.col("price_cents") + 1000).alias("price_cents"),
        F.lit("u").alias("_op"), (F.col("o_orderkey") * 10 + 5).alias("_lsn"),
    )
    deletes = base.filter(F.col("o_orderkey") % 7 == 0).select(
        "*", F.lit("d").alias("_op"), (F.col("o_orderkey") * 10 + 9).alias("_lsn")
    )
    changes = creates.unionByName(updates).unionByName(deletes).withColumn(
        "_ts_ms", F.col("_lsn")
    )
    return fold_latest_state(changes, ["o_orderkey"]).orderBy("o_orderkey")
