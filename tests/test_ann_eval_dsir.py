"""Tests for ann_eval_metrics (recall/MRR vs pure-Python reference) and
importance_weights_dsir (log-ratio weights vs pure-Python reference)."""

import math

from kafka_stream_spark.operators.sequence_stats import (
    _DSIR_TARGET,
    _DSIR_THRESHOLD,
    importance_weights_dsir,
)
from kafka_stream_spark.operators.similarity import ann_eval_metrics


def _cos6(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return round(dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))), 6)


def test_ann_eval_matches_python_reference(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    labels = {r.vec_id: r.label for r in rows}

    # per-label centroids (the IVF coarse quantizer)
    by_label: dict = {}
    for vid, v in vecs.items():
        by_label.setdefault(labels[vid], []).append(v)
    cents = {
        lab: [sum(c) / len(vs) for c in zip(*vs)] for lab, vs in by_label.items()
    }

    expect = {}
    for qid in range(5):
        qe = vecs[qid]
        exact = sorted(
            ((_cos6(qe, v), vid) for vid, v in vecs.items() if vid != qid),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        probes = sorted(
            ((_cos6(qe, c), lab) for lab, c in cents.items()),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        probe_labels = {lab for _, lab in probes}
        ivf = sorted(
            (
                (_cos6(qe, v), vid)
                for vid, v in vecs.items()
                if vid != qid and labels[vid] in probe_labels
            ),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        ivf_ids = [vid for _, vid in ivf]
        exact_ids = [vid for _, vid in exact]
        n_hits = len(set(exact_ids) & set(ivf_ids))
        rr = (
            round(1.0 / (ivf_ids.index(exact_ids[0]) + 1), 6)
            if exact_ids[0] in ivf_ids
            else 0.0
        )
        expect[qid] = (n_hits, round(n_hits / 10.0, 6), rr)

    got = {
        r.query_id: (r.n_hits, r.recall_at_10, r.reciprocal_rank)
        for r in ann_eval_metrics(spark, sf_dir).collect()
    }
    assert got == expect
    assert all(0.0 <= v[1] <= 1.0 for v in got.values())


def test_dsir_weights_match_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cc: dict = {}
    ct: dict = {}
    t_total = c_total = 0
    for r in docs:
        toks = r.text.split(" ")
        for g in zip(toks, toks[1:]):
            cc[g] = cc.get(g, 0) + 1
            c_total += 1
            if r.source == _DSIR_TARGET:
                ct[g] = ct.get(g, 0) + 1
                t_total += 1
    vocab = len(cc)

    def lr_u(g):
        return round(
            math.log(
                ((ct.get(g, 0) + 1.0) / (t_total + vocab))
                / ((cc[g] + 1.0) / (c_total + vocab))
            )
            * 1e6
        )

    got = {r.doc_id: r for r in importance_weights_dsir(spark, sf_dir).collect()}
    n_checked = 0
    for r in docs:
        if r.source == _DSIR_TARGET:
            assert r.doc_id not in got
            continue
        toks = r.text.split(" ")
        grams = list(zip(toks, toks[1:]))
        if not grams:
            continue
        g = got[r.doc_id]
        assert g.n_bigrams == len(grams)
        ref = round(sum(lr_u(x) for x in grams) / (len(grams) * 1e6), 6)
        assert abs(g.avg_log_ratio - ref) <= 1.0000001e-6  # half-up vs half-even
        assert g.selected == int(g.avg_log_ratio >= _DSIR_THRESHOLD)
        n_checked += 1
    assert n_checked > 0
