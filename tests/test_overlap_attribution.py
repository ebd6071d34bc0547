"""Tests for source_overlap_matrix and attribution_linear."""

import datetime

from kafka_stream_spark.operators.curation_ext import source_overlap_matrix
from kafka_stream_spark.operators.event_analytics import (
    _ATTR_WINDOW_DAYS,
    attribution_linear,
)


def test_source_overlap_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_src: dict = {}
    for r in docs:
        toks = r.text.split(" ")
        g = by_src.setdefault(r.source, set())
        for i in range(len(toks) - 4):
            g.add(" ".join(toks[i : i + 5]))
    expect = {}
    srcs = sorted(by_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(by_src[a] & by_src[b])
            if shared:
                expect[(a, b)] = (
                    shared,
                    round(shared / len(by_src[a]), 6),
                    round(shared / len(by_src[b]), 6),
                )
    got = {
        (r.source_a, r.source_b): (r.n_shared, r.containment_a, r.containment_b)
        for r in source_overlap_matrix(spark, sf_dir).collect()
    }
    assert got == expect
    for n, ca, cb in got.values():
        assert n > 0 and 0 < ca <= 1 and 0 < cb <= 1


def test_attribution_credits_sum_to_purchases(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    views = [
        (r.user_id, r.ts, r.event_id) for r in events if r.event_type == "view"
    ]
    window = datetime.timedelta(days=_ATTR_WINDOW_DAYS)
    total_cents = 0
    day_cents: dict = {}
    day_touches: dict = {}
    for r in events:
        if r.event_type != "purchase":
            continue
        touches = sorted(
            (v for v in views if v[0] == r.user_id and v[1] <= r.ts and v[1] >= r.ts - window),
            key=lambda v: (v[1], v[2]),
        )
        if not touches:
            continue
        cents = round(r.value * 100)
        total_cents += cents
        k = len(touches)
        for rn, (_, vts, _) in enumerate(touches, start=1):
            c = cents // k + (1 if rn <= cents % k else 0)
            d = vts.date()
            day_cents[d] = day_cents.get(d, 0) + c
            day_touches[d] = day_touches.get(d, 0) + 1

    rows = attribution_linear(spark, sf_dir).collect()
    got_days = {r.view_day: (r.n_touches, r.attributed_revenue) for r in rows}
    assert got_days == {
        d: (day_touches[d], round(day_cents[d] / 100.0, 2)) for d in day_cents
    }
    # conservation: every attributed purchase's cents fully allocated
    assert sum(day_cents.values()) == total_cents
    assert rows == sorted(rows, key=lambda r: r.view_day)


def test_dedup_eval_consistency(spark, sf_dir):
    """Recall bookkeeping must be internally consistent, and the
    candidate stage must surface nearly all very-high-similarity pairs
    (at J >= 0.9 the 4x4 band miss probability is ~1.5% per pair)."""
    from kafka_stream_spark.operators.dedup import (
        dedup_eval_metrics,
        dedup_ngram_jaccard,
    )

    rows = dedup_eval_metrics(spark, sf_dir).collect()
    n_truth_total = dedup_ngram_jaccard(spark, sf_dir).count()
    assert sum(r.n_truth for r in rows) == n_truth_total
    for r in rows:
        assert 0.5 <= r.bucket_lo <= 1.0
        assert 0 <= r.n_hit <= r.n_truth
        assert abs(r.recall - round(r.n_hit / r.n_truth, 6)) < 1e-9
        if r.bucket_lo >= 0.9 and r.n_truth >= 5:
            assert r.recall >= 0.8


def test_weighted_sample_favors_heavy_docs(spark, sf_dir):
    """E-S sampling: matches the pure-Python computation exactly, and the
    sampled docs' mean weight exceeds the corpus mean (weight-
    proportional selection pressure)."""
    import hashlib
    import math

    from kafka_stream_spark.operators.curation_ext import (
        _WS_K,
        weighted_sample_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    keyed = []
    for r in docs:
        if r.n_chars <= 0:
            continue
        u = int(hashlib.md5(f"ws:{r.doc_id}".encode()).hexdigest()[:13], 16) / 4503599627370496.0
        keyed.append((round(math.log(u) / r.n_chars * 1e9), r.doc_id, r.n_chars))
    expect = sorted(keyed, key=lambda t: (-t[0], t[1]))[:_WS_K]

    rows = weighted_sample_documents(spark, sf_dir).collect()
    assert [(r.key_u, r.doc_id, r.n_chars) for r in rows] == expect
    assert len(rows) == min(_WS_K, len(keyed))
    assert all(r.n_chars > 0 for r in rows)
    # design-level check (a single draw is too noisy for a mean
    # assertion at fixture size): between two docs whose uniforms
    # happen to be equal, the heavier one must always win the key
    # ordering — verify the key formula is monotone in weight
    u_fixed = 0.5
    k_light = round(math.log(u_fixed) / 10 * 1e9)
    k_heavy = round(math.log(u_fixed) / 1000 * 1e9)
    assert k_heavy > k_light
