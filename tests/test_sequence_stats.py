"""Tests for sequence_stats (bigram LM scoring, substring dedup spans),
sketches_kmv (KMV/theta overlap), and the event transition matrix."""

import math

import pyspark.sql.functions as F

from kafka_stream_spark.operators.sequence_stats import (
    _K,
    _LM_THRESHOLD,
    lm_bigram_logprob,
    substring_dedup_spans,
)
from kafka_stream_spark.operators.sketches_kmv import _KMV_K, kmv_type_overlap
from kafka_stream_spark.operators.event_analytics import event_transition_matrix


def _docs(spark, sf_dir):
    return {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }


def test_lm_scores_match_reference(spark, sf_dir):
    """Per-doc average bigram log-prob recomputed in pure Python equals the
    engine's output (up to the declared 6dp rounding)."""
    docs = _docs(spark, sf_dir)
    c2: dict[tuple, int] = {}
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), n in c2.items():
        c1[a] = c1.get(a, 0) + n

    rows = {r.doc_id: r for r in lm_bigram_logprob(spark, sf_dir).collect()}
    scored = [d for d, t in docs.items() if len(t) >= 2]
    assert set(rows) == set(scored)
    for doc_id in scored[:50]:
        toks = docs[doc_id]
        lps_u = [
            round(math.log(c2[(a, b)] / c1[a]) * 1e6)
            for a, b in zip(toks, toks[1:])
        ]
        r = rows[doc_id]
        assert r.n_bigrams == len(lps_u)
        # Python round() is half-to-even, engines round half-up: allow one
        # 6dp ulp on the final rounding
        assert (
            abs(r.avg_logprob - round(sum(lps_u) / (len(lps_u) * 1e6), 6))
            <= 1.0000001e-6
        )
        assert r.low_quality == int(r.avg_logprob <= _LM_THRESHOLD)
        assert r.avg_logprob < 0  # MLE probs are < 1


def test_substring_spans_are_real_duplicates(spark, sf_dir):
    """Every reported span is covered by 5-grams that genuinely occur in
    more than one document, span arithmetic is consistent, and islands
    are maximal (no two spans of one doc touch or overlap)."""
    docs = _docs(spark, sf_dir)
    gram_docs: dict[str, set] = {}
    for d, toks in docs.items():
        for i in range(len(toks) - _K + 1):
            gram_docs.setdefault(" ".join(toks[i : i + _K]), set()).add(d)

    rows = substring_dedup_spans(spark, sf_dir).collect()
    assert rows, "synthetic corpus has a tiny vocab; cross-doc 5-grams exist"
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, spans in by_doc.items():
        toks = docs[doc_id]
        prev_end = -10
        for r in sorted(spans, key=lambda x: x.span_start):
            # span arithmetic: n_dup_grams windows of K tokens, 1-based pos
            assert r.n_dup_grams == r.span_end - r.span_start - _K + 2
            assert 1 <= r.span_start and r.span_end <= len(toks)
            # maximality: a gap of at least one non-duplicated window
            assert r.span_start > prev_end - _K + 2
            prev_end = r.span_end
            # every window inside the span is a cross-doc duplicate
            for i in range(r.span_start, r.span_end - _K + 2):
                g = " ".join(toks[i - 1 : i - 1 + _K])
                assert len(gram_docs[g]) > 1


def test_kmv_estimates_track_exact(spark, sf_dir):
    """KMV estimates land within sketch error of the truth (k=32 →
    ~1/sqrt(32) ≈ 18% relative stderr; assert 3 sigma) and the merged
    union sketch respects set algebra."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = kmv_type_overlap(spark, sf_dir).collect()
    assert len(rows) == len(exact) * (len(exact) - 1) // 2
    tol = 3.0 / math.sqrt(_KMV_K)
    for r in rows:
        assert abs(r.est_a - exact[r.type_a]) <= tol * exact[r.type_a]
        assert abs(r.est_b - exact[r.type_b]) <= tol * exact[r.type_b]
        assert 0.0 <= r.est_jaccard <= 1.0
        assert r.est_union >= max(r.est_a, r.est_b) * (1 - tol)
        assert r.est_union <= (r.est_a + r.est_b) * (1 + tol)
        assert abs(r.est_intersection - r.exact_intersection) <= max(
            tol * r.exact_intersection, 0.25 * r.est_union
        )


def test_transition_matrix_counts_and_rows(spark, sf_dir):
    """Row-normalized probabilities sum to 1 per prev_type, and the total
    transition count is exactly (events - distinct users): every event
    but each user's first has a predecessor."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    rows = event_transition_matrix(spark, sf_dir).collect()
    assert sum(r.n_transitions for r in rows) == n_events - n_users
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for total in by_prev.values():
        assert abs(total - 1.0) < 1e-4
