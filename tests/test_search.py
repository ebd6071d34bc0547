"""Plan + semantic invariants for BM25 search scoring."""

import math

import pyspark.sql.functions as F

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.search import (
    _B,
    _K1,
    _QUERY_TERMS,
    bm25_search_documents,
)


def test_bm25_topk_avoids_global_sort(spark, sf_dir):
    p = (
        bm25_search_documents(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p
    # the df (per-term doc frequency) side must broadcast
    assert "BroadcastHashJoin" in p


def test_bm25_matches_per_doc_reference(spark, sf_dir):
    """Recompute BM25 in plain Python for the returned docs."""
    rows = bm25_search_documents(spark, sf_dir).collect()
    assert rows and rows[0].rank == 1
    (documents,) = load(spark, sf_dir, "documents")
    docs = {r.doc_id: r.text.split(" ") for r in documents.collect()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in _QUERY_TERMS
    }
    for r in rows:
        toks = docs[r.doc_id]
        score = 0.0
        for t in _QUERY_TERMS:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * tf * (_K1 + 1) / (
                tf + _K1 * (1 - _B + _B * len(toks) / avgdl)
            )
        assert abs(r.score - score) < 1e-4, r.doc_id
    # scores are non-increasing down the ranking
    scores = [r.score for r in sorted(rows, key=lambda x: x.rank)]
    assert scores == sorted(scores, reverse=True)


def test_bm25_prefers_term_dense_short_docs(spark, sf_dir):
    """Length normalization: among docs with equal tf, shorter ones score
    higher — check the top doc beats the corpus-average score."""
    rows = bm25_search_documents(spark, sf_dir).collect()
    scores = [r.score for r in rows]
    assert scores[0] > sum(scores) / len(scores)
