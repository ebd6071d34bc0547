"""Tests for hll_window_rollup (sketch re-aggregation) and
hybrid_search_rrf (reciprocal-rank fusion)."""

import hashlib
import math

from kafka_stream_spark.operators.analytics_ext import (
    _HLL_M,
    _HLL_NUM,
    hll_window_rollup,
)
from kafka_stream_spark.operators.search import (
    _RRF_K,
    _RRF_DEPTH,
    _TOPK,
    hybrid_search_rrf,
)

_NUM = float(_HLL_NUM)  # alpha * m^2 * 2^55, exactly as the engine uses it


def _py_day_registers(rows):
    """Reference day-level HLL registers built straight from raw events."""
    regs: dict = {}
    for day, user_id in rows:
        hv = int(hashlib.md5(f"hll:{user_id}".encode()).hexdigest()[:15], 16)
        bucket, w = hv % _HLL_M, hv // _HLL_M
        rho = 55 if w == 0 else 55 - w.bit_length()
        key = (day, bucket)
        regs[key] = max(regs.get(key, 0), rho)
    return regs


def _py_estimate(day_regs):
    n_present = len(day_regs)
    v = _HLL_M - n_present
    sum_int = sum(1 << (55 - m) for m in day_regs.values()) + v * (1 << 55)
    e_raw = _NUM / sum_int
    if e_raw <= 2.5 * _HLL_M and v > 0:
        return round(_HLL_M * math.log(_HLL_M / v), 2)
    return round(e_raw, 2)


def test_hll_rollup_equals_direct_day_sketch(spark, sf_dir):
    """Max-merging hourly registers to day grain must give EXACTLY the
    sketch you'd get building day registers from raw data — that
    losslessness is the whole point of pre-aggregated sketch rollups."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = [(r.ts.date(), r.user_id) for r in events.select("ts", "user_id").collect()]
    regs = _py_day_registers(raw)
    by_day: dict = {}
    for (day, bucket), m in regs.items():
        by_day.setdefault(day, {})[bucket] = m

    out = {r.day: r for r in hll_window_rollup(spark, sf_dir).collect()}
    assert set(out) == set(by_day)
    for day, r in out.items():
        assert r.hll_day == _py_estimate(by_day[day])
        assert 1 <= r.n_hours <= 24
        # summing per-hour estimates double-counts multi-hour users;
        # it can never be materially below the merged-register estimate
        assert r.sum_hll_hours >= r.hll_day - 0.01
        # sketch accuracy: 3 sigma at m=64 is ~40%
        assert abs(r.hll_day - r.exact_day) <= 0.4 * r.exact_day + 3


def test_rrf_fusion_is_consistent(spark, sf_dir):
    rows = hybrid_search_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= _TOPK
    prev = None
    for r in rows:
        assert r.bm25_rank is not None or r.cos_rank is not None
        expected = round(
            (1.0 / (_RRF_K + r.bm25_rank) if r.bm25_rank else 0.0)
            + (1.0 / (_RRF_K + r.cos_rank) if r.cos_rank else 0.0),
            6,
        )
        assert abs(r.rrf_score - expected) <= 1e-9
        for rank in (r.bm25_rank, r.cos_rank):
            if rank is not None:
                assert 1 <= rank <= _RRF_DEPTH
        if prev is not None:
            assert r.rrf_score <= prev + 1e-12
        prev = r.rrf_score
    # a doc present in both legs must outrank a doc present in neither's
    # top — i.e. the top fused doc appears in at least one leg at depth,
    # and any doc in both legs beats the best single-leg-only doc at
    # equal rank: spot-check ordering property on the returned page
    both = [r for r in rows if r.bm25_rank and r.cos_rank]
    if both:
        best_both = max(b.rrf_score for b in both)
        single = [r for r in rows if (r.bm25_rank is None) != (r.cos_rank is None)]
        for s in single:
            if (s.bm25_rank or s.cos_rank) >= min(
                b.bm25_rank or _RRF_DEPTH for b in both
            ) and (s.bm25_rank or s.cos_rank) >= min(
                b.cos_rank or _RRF_DEPTH for b in both
            ):
                assert s.rrf_score <= best_both


def test_histogram_quantile_error_bounded_by_bin_width(spark, sf_dir):
    """In-bin interpolation can never be off by more than one bin width
    (the sketch's deterministic error bound)."""
    from kafka_stream_spark.operators._common import load
    from kafka_stream_spark.operators.sketches_histogram import (
        _HB,
        histogram_quantile_sketch,
    )
    import pyspark.sql.functions as F

    rows = histogram_quantile_sketch(spark, sf_dir).collect()
    assert [r.q for r in rows] == [0.5, 0.9, 0.99]
    (events,) = load(spark, sf_dir, "events")
    lo, hi = events.agg(F.min("value"), F.max("value")).first()
    bin_w = (hi - lo) / _HB
    for r in rows:
        assert r.abs_err <= bin_w, (r.q, r.abs_err, bin_w)
        assert r.est_value >= lo and r.est_value <= hi
