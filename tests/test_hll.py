"""HyperLogLog sketch properties (oracle equality is in test_queries.py)."""

import pyspark.sql.functions as F

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.analytics_ext import _HLL_M, approx_distinct_hll


def _registers(events_df):
    hv = (
        "cast(conv(substr(md5(cast(concat('hll:', cast(user_id as string)) "
        "as binary)), 1, 15), 16, 10) as bigint)"
    )
    return (
        events_df.select(
            "event_type",
            F.expr(f"{hv} % {_HLL_M}").alias("bucket"),
            F.expr(
                f"CASE WHEN {hv} div {_HLL_M} = 0 THEN 55 "
                f"ELSE 55 - length(bin({hv} div {_HLL_M})) END"
            ).alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def test_hll_registers_merge_by_max(spark, sf_dir):
    """Registers built on disjoint halves and max-merged must equal the
    registers of the whole — the linearity that lets the sketch build
    per-partition / per-micro-batch and merge."""
    (events,) = load(spark, sf_dir, "events")
    full = {
        (r.event_type, r.bucket): r.m_j for r in _registers(events).collect()
    }
    lo = events.filter(F.col("event_id") % 2 == 0)
    hi = events.filter(F.col("event_id") % 2 == 1)
    merged = {}
    for half in (lo, hi):
        for r in _registers(half).collect():
            k = (r.event_type, r.bucket)
            merged[k] = max(merged.get(k, 0), r.m_j)
    assert merged == full


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """m=64 → standard error ~13%; allow 3 sigma."""
    rows = approx_distinct_hll(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel = abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct
        assert rel < 0.4, (r.event_type, r.hll_estimate, r.exact_distinct)


def test_hll_register_build_collapses_map_side(spark, sf_dir):
    """The register aggregate must plan a partial_max before the exchange
    (the O(partitions×m) shuffle argument)."""
    (events,) = load(spark, sf_dir, "events")
    p = _registers(events)._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in p or "HashAggregate" in p.split("Exchange")[1]
