"""Fixed-bin histogram quantile sketch — the mergeable quantile path.

Exact quantiles need a global sort (or full value materialization per
group); at 100 TB the production answer is a bounded-size mergeable
summary (t-digest, KLL, or — simplest and fully deterministic — a
fixed-bin histogram). This operator builds a B-bin equal-width
histogram of ``events.value`` (one map-side-combinable groupBy; the
histogram is B integers no matter the corpus size, and two histograms
merge by element-wise add — the property that makes it work as
streaming state or partial aggregate), then answers P50/P90/P99 by
linear interpolation inside the covering bin, and audits each estimate
against the exact percentile.

Everything is deterministic floating point evaluated identically in
both engines (same subtraction/division/multiplication shapes, 6dp
rounds at the comparison boundary), so the sketch AND its error audit
are exactly oracle-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_HB = 128  # bins
_QS = (0.5, 0.9, 0.99)


@query(
    "histogram_quantile_sketch",
    oracle=f"""
    WITH ext AS (
      SELECT min(value) AS lo, max(value) AS hi, count(*) AS n FROM events
    ),
    binned AS (
      SELECT least(CAST(floor((value - lo) / ((hi - lo) / {_HB})) AS BIGINT),
                   {_HB - 1}) AS bin
      FROM events CROSS JOIN ext
    ),
    hist AS (SELECT bin, count(*) AS c FROM binned GROUP BY bin),
    cum AS (
      SELECT bin, c,
             sum(c) OVER (ORDER BY bin) AS cum_c,
             sum(c) OVER (ORDER BY bin) - c AS cum_before
      FROM hist
    ),
    qs AS (SELECT CAST(unnest([{", ".join(str(q) for q in _QS)}]) AS DOUBLE) AS q),
    targets AS (SELECT q, CAST(ceil(q * n) AS BIGINT) AS target, lo, hi, n
                FROM qs CROSS JOIN ext),
    covering AS (
      SELECT t.q, t.target, t.lo, t.hi, t.n,
             min(c.bin) AS bin
      FROM targets t JOIN cum c ON c.cum_c >= t.target
      GROUP BY t.q, t.target, t.lo, t.hi, t.n
    ),
    est AS (
      SELECT v.q, v.n,
             round(v.lo + (v.bin + (v.target - c.cum_before) * 1.0 / c.c)
                   * ((v.hi - v.lo) / {_HB}), 6) AS est_value
      FROM covering v JOIN cum c ON c.bin = v.bin
    ),
    exact AS (
      SELECT CAST(0.5 AS DOUBLE) AS q, round(quantile_cont(value, 0.5), 6) AS exact_value FROM events
      UNION ALL
      SELECT CAST(0.9 AS DOUBLE) AS q, round(quantile_cont(value, 0.9), 6) AS exact_value FROM events
      UNION ALL
      SELECT CAST(0.99 AS DOUBLE) AS q, round(quantile_cont(value, 0.99), 6) AS exact_value FROM events
    )
    SELECT e.q, x.exact_value, e.est_value,
           round(abs(e.est_value - x.exact_value), 6) AS abs_err
    FROM est e JOIN exact x ON x.q = e.q
    ORDER BY e.q
    """,
    description=(
        f"{_HB}-bin equal-width histogram quantile sketch over event "
        "values: bounded mergeable state (B integers at any scale), "
        "P50/P90/P99 by in-bin interpolation, audited against exact "
        "percentiles"
    ),
)
def histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One extremes pass (min/max/count — a 1-row broadcast), one
    histogram groupBy whose partial aggregation collapses each partition
    to <= B rows before the exchange, then driver-scale interpolation
    over B rows. The exact-percentile audit column is the only part
    that wouldn't survive 100 TB — it exists to measure the sketch, and
    the round-1 `quantiles_orders` parity pattern makes it engine-stable.
    """
    (events,) = load(spark, sf_dir, "events")
    ext = events.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / _HB
    binned = events.crossJoin(F.broadcast(ext)).select(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width).cast("bigint"),
            F.lit(_HB - 1),
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin", "c",
        F.sum("c").over(wb).alias("cum_c"),
        (F.sum("c").over(wb) - F.col("c")).alias("cum_before"),
    )
    qs = spark.createDataFrame([(q,) for q in _QS], "q double")
    targets = qs.crossJoin(F.broadcast(ext)).select(
        "q", F.ceil(F.col("q") * F.col("n")).cast("bigint").alias("target"),
        "lo", "hi", "n",
    )
    covering = (
        targets.join(cum, F.col("cum_c") >= F.col("target"))
        .groupBy("q", "target", "lo", "hi", "n")
        .agg(F.min("bin").alias("bin"))
    )
    est = covering.join(
        cum.select(F.col("bin").alias("cbin"), "c", "cum_before"),
        F.col("cbin") == F.col("bin"),
    ).select(
        "q", "n",
        F.round(
            F.col("lo")
            + (
                F.col("bin")
                + (F.col("target") - F.col("cum_before")) * 1.0 / F.col("c")
            )
            * ((F.col("hi") - F.col("lo")) / _HB),
            6,
        ).alias("est_value"),
    )
    # percentile() needs a foldable percentage: one literal aggregate
    # per q, unioned (3 fixed quantiles — the union is 3 branches over
    # one cached scan, not a data-dependent loop)
    exact = None
    for q in _QS:
        leg = events.agg(
            F.lit(float(q)).alias("q"),
            F.round(F.expr(f"percentile(value, {q})"), 6).alias("exact_value"),
        )
        exact = leg if exact is None else exact.unionByName(leg)
    return (
        est.join(exact, "q")
        .select(
            "q", "exact_value", "est_value",
            F.round(F.abs(F.col("est_value") - F.col("exact_value")), 6)
            .alias("abs_err"),
        )
        .orderBy("q")
    )
