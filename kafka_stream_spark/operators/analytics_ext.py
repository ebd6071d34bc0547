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
from pyspark.sql import DataFrame, SparkSession

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
