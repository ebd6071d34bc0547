"""Invariant tests for dedup-cluster connected components and quantized
ANN (value-level oracle coverage lives in test_queries.py)."""

import pyspark.sql.functions as F

from kafka_stream_spark.operators.components import (
    ann_quantized_topk,
    dedup_cluster_components,
)
from kafka_stream_spark.operators.similarity import ann_cosine_topk, embedding_lsh_banded


def test_components_close_the_pair_graph(spark, sf_dir):
    comp = {r.vec_id: r.component for r in dedup_cluster_components(spark, sf_dir).collect()}
    pairs = embedding_lsh_banded(spark, sf_dir).select("vec_a", "vec_b").collect()
    assert pairs, "graph must be non-empty at test SF"
    # every edge joins two nodes of the same component (closure property)
    for p in pairs:
        assert comp[p.vec_a] == comp[p.vec_b]
    # the component label is the minimum member id and is itself a member
    by_comp = {}
    for node, c in comp.items():
        by_comp.setdefault(c, []).append(node)
    for c, members in by_comp.items():
        assert c == min(members)


def test_components_keeper_flags_and_sizes(spark, sf_dir):
    rows = dedup_cluster_components(spark, sf_dir).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for c, members in by_comp.items():
        keepers = [r for r in members if r.is_keeper == 1]
        assert len(keepers) == 1 and keepers[0].vec_id == c
        assert all(r.cluster_size == len(members) for r in members)


def test_quantized_topk_tracks_exact_topk(spark, sf_dir):
    exact = ann_cosine_topk(spark, sf_dir).collect()
    quant = ann_quantized_topk(spark, sf_dir).collect()
    ex = {}
    qu = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.vec_id)
    for r in quant:
        qu.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(ex) == set(qu)
    # int8 quantization error is tiny relative to cosine gaps: expect high
    # top-10 agreement per query (recall >= 0.7 on the synthetic corpus)
    for qid in ex:
        overlap = len(ex[qid] & qu[qid]) / 10
        assert overlap >= 0.7, f"query {qid}: top-10 overlap {overlap}"


# ---------------------------------------------------------------------------
# property test: connected_components vs a union-find reference
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

EDGE = st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(lambda e: e[0] != e[1])


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id per component
    comp = {}
    for n in parent:
        root = find(n)
        comp.setdefault(root, []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


@given(st.lists(EDGE, min_size=1, max_size=40))
@settings(max_examples=8, deadline=None)
def test_connected_components_matches_union_find(edges):
    # function-scoped @given can't take the session fixture directly; the
    # engine session factory is idempotent (getOrCreate), so this reuses
    # the suite's session or builds one on a standalone run
    from kafka_stream_spark.operators.components import connected_components
    from kafka_stream_spark.session import get_spark

    spark = get_spark("kafka-stream-spark-tests", master="local[4]", shuffle_partitions=4)
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == _union_find(edges)


def test_ivf_recall_vs_brute_force(spark):
    """Measured IVF recall floor. On this synthetic corpus the `label`
    column is a CLASS label, not a geometric clustering, so 3-of-5 bucket
    probing holds only ~0.4 recall (measured 0.46 sf0.01 / 0.36 sf0.1) —
    the documented cost of an untrained coarse quantizer; a k-means
    codebook is the production upgrade (SCALING.md "Known costs").
    The floor asserted here catches regressions in the probe mechanics,
    not a quality claim."""
    from kafka_stream_spark.operators.similarity import ann_cosine_topk, ann_ivf_topk

    sf_dir = "/root/testdata/sf0.01"  # 500 vectors: recall is meaningful
    exact = {}
    for r in ann_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    ivf = {}
    for r in ann_ivf_topk(spark, sf_dir).collect():
        ivf.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(exact[q] & ivf.get(q, set())) / len(exact[q]) for q in exact]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.25, f"IVF avg recall {avg:.2f} (per-query {recalls})"


def test_kmeans_ivf_beats_label_ivf_recall(spark):
    """The trained coarse quantizer must recover the recall the class-label
    buckets lose (measured 0.94 vs 0.46 at sf0.01)."""
    from kafka_stream_spark.operators.similarity import (
        ann_cosine_topk,
        ann_ivf_kmeans_topk,
        ann_ivf_topk,
    )

    sf_dir = "/root/testdata/sf0.01"
    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    exact = topk_sets(ann_cosine_topk(spark, sf_dir))
    label = topk_sets(ann_ivf_topk(spark, sf_dir))
    km = topk_sets(ann_ivf_kmeans_topk(spark, sf_dir))

    def avg_recall(got):
        rs = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
        return sum(rs) / len(rs)

    km_r, label_r = avg_recall(km), avg_recall(label)
    assert km_r >= 0.8, f"kmeans-IVF recall {km_r}"
    assert km_r > label_r + 0.2  # the training is what buys the recall


def test_kmeans_ivf_deterministic(spark):
    from kafka_stream_spark.operators.similarity import ann_ivf_kmeans_topk

    sf_dir = "/root/testdata/sf0.001"
    a = sorted(map(tuple, ann_ivf_kmeans_topk(spark, sf_dir).collect()))
    b = sorted(map(tuple, ann_ivf_kmeans_topk(spark, sf_dir).collect()))
    assert a == b  # deterministic init + rounded argmin => stable output


def test_pq_adc_rerank_recall_and_determinism(spark):
    """PQ codes (8 bytes/vector) + ADC shortlist + exact re-rank: recall
    floor vs brute force, and bit-stable across runs (deterministic
    codebook init + rounded argmins)."""
    from kafka_stream_spark.operators.similarity import ann_cosine_topk, ann_pq_topk

    sf_dir = "/root/testdata/sf0.01"
    exact = {}
    for r in ann_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    run1 = ann_pq_topk(spark, sf_dir).collect()
    pq = {}
    for r in run1:
        pq.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(exact[q] & pq.get(q, set())) / len(exact[q]) for q in exact]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.6, f"PQ+rerank recall {avg:.2f} ({recalls})"
    run2 = ann_pq_topk(spark, sf_dir).collect()
    assert sorted(map(tuple, run1)) == sorted(map(tuple, run2))


def test_ivfpq_recall_and_determinism(spark):
    """IVF-PQ (residual-encoded inverted lists, nprobe=3 of 8): recall
    floor vs brute force. Measured 0.86 at sf0.01 — ABOVE the full-scan
    PQ's 0.78, because residuals are near-zero-mean so the 16 centroids
    per subspace resolve finer structure than raw-vector coding, which
    more than pays for only probing 3/8 lists."""
    from kafka_stream_spark.operators.similarity import ann_cosine_topk, ann_ivfpq_topk

    sf_dir = "/root/testdata/sf0.01"
    exact = {}
    for r in ann_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    run1 = ann_ivfpq_topk(spark, sf_dir).collect()
    got = {}
    for r in run1:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.7, f"IVF-PQ recall {avg:.2f} ({recalls})"
    run2 = ann_ivfpq_topk(spark, sf_dir).collect()
    assert sorted(map(tuple, run1)) == sorted(map(tuple, run2))


@given(st.lists(EDGE, min_size=1, max_size=40))
@settings(max_examples=8, deadline=None)
def test_star_components_matches_union_find(edges):
    from kafka_stream_spark.operators.components import connected_components_star
    from kafka_stream_spark.session import get_spark

    spark = get_spark("kafka-stream-spark-tests", master="local[4]", shuffle_partitions=4)
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {r.node: r.component for r in connected_components_star(pairs).collect()}
    assert got == _union_find(edges)


def test_star_components_logarithmic_rounds_on_deep_path(spark):
    """The point of large-star/small-star: a 200-hop path converges in
    O(log n) rounds (measured 9; min-label needs 200). A regression that
    reintroduces diameter-bound behavior trips the round cap."""
    from kafka_stream_spark.operators.components import _star_labels

    edges = [(i, i + 1) for i in range(200)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    labels, rounds = _star_labels(pairs, max_iters=50)
    assert rounds <= 12, f"star CC took {rounds} rounds on a 200-path"
    got = {r.node: r.component for r in labels.collect()}
    assert got == {i: 0 for i in range(201)}


def test_star_and_minlabel_agree_on_lsh_graph(spark, sf_dir):
    """Both CC strategies must label the real near-dup graph identically
    (the query runs star; min-label is the shallow-graph alternative)."""
    from kafka_stream_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    pairs = embedding_lsh_banded(spark, sf_dir).select("vec_a", "vec_b").localCheckpoint()
    a = sorted(map(tuple, connected_components(pairs).collect()))
    b = sorted(map(tuple, connected_components_star(pairs).collect()))
    assert a and a == b


def test_keep_best_keeper_is_highest_quality(spark, sf_dir):
    """Exactly one keeper per cluster, and no member outranks it on
    (quality, doc_id) — the keep-best curation policy."""
    from kafka_stream_spark.operators.dedup import dedup_keep_best

    rows = dedup_keep_best(spark, sf_dir).collect()
    assert rows
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for c, members in by_comp.items():
        assert len(members) >= 2  # clusters come from pairs
        keepers = [r for r in members if r.is_keeper == 1]
        assert len(keepers) == 1
        best = max(members, key=lambda r: (r.quality, -r.doc_id))
        assert keepers[0].doc_id == best.doc_id


def test_star_components_scales_rounds_logarithmically(spark):
    """100x the deep-path test: a 20,000-hop path must converge in O(log
    n) rounds (diameter-bound algorithms would need 20k). Guards the
    claim SCALING.md makes for chain-shaped dup graphs at 100 TB."""
    from kafka_stream_spark.operators.components import _star_labels

    n = 20_000
    pairs = (
        spark.range(n)
        .selectExpr("id AS a", "id + 1 AS b")
    )
    labels, rounds = _star_labels(pairs, max_iters=40)
    assert rounds <= 18, f"star CC took {rounds} rounds on a {n}-path"
    bad = labels.filter("component != 0").count()
    assert bad == 0  # every node reaches the single root


def test_opq_rotation_is_orthogonal_and_beats_pq():
    """R must be orthogonal (RRᵀ=I) and the learned rotation must not
    lose recall vs plain PQ (measured 0.84 vs 0.78 at sf0.01 —
    deterministic training, so the comparison is stable)."""
    import numpy as np

    from kafka_stream_spark.operators.similarity import (
        _opq_rotation,
        ann_cosine_topk,
        ann_opq_topk,
        ann_pq_topk,
    )
    from kafka_stream_spark.session import get_spark

    rng = np.random.default_rng(3)
    x = rng.normal(size=(128, 64))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    r = _opq_rotation(x)
    assert np.allclose(r @ r.T, np.eye(64), atol=1e-8)

    spark = get_spark("kafka-stream-spark-tests", master="local[4]", shuffle_partitions=4)
    sf_dir = "/root/testdata/sf0.01"

    def topk_sets(df):
        out = {}
        for row in df.collect():
            out.setdefault(row.query_id, set()).add(row.vec_id)
        return out

    exact_rows = ann_cosine_topk(spark, sf_dir).collect()
    exact = {}
    cosines = {}
    for row in exact_rows:
        exact.setdefault(row.query_id, set()).add(row.vec_id)
        cosines[(row.query_id, row.vec_id)] = row.cosine
    pq = topk_sets(ann_pq_topk(spark, sf_dir))
    opq_rows = ann_opq_topk(spark, sf_dir).collect()
    opq = {}
    for row in opq_rows:
        opq.setdefault(row.query_id, set()).add(row.vec_id)
        # rotation preserves inner products: emitted cosines must equal
        # the un-rotated exact cosines (for pairs the baseline scored)
        if (row.query_id, row.vec_id) in cosines:
            assert abs(row.cosine - cosines[(row.query_id, row.vec_id)]) < 1e-5

    def recall(approx):
        return sum(len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact) / len(exact)

    assert recall(opq) >= recall(pq) >= 0.7
