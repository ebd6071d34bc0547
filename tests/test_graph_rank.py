"""Integer-arithmetic PageRank: pure-Python reference on a constructed
graph (cross-engine oracles can share bugs — the triangle-counting
lesson from round 1), plus structural sanity on the real corpus graph."""

import pyspark.sql.functions as F

from kafka_stream_spark.operators.graph_rank import (
    _PR_BASE,
    _PR_ITERS,
    _PR_SCALE,
    pagerank_parts,
)


def _py_pagerank(edges, iters=_PR_ITERS):
    """Reference: same integer floor arithmetic as both engines."""
    from collections import defaultdict

    out = defaultdict(list)
    nodes = set()
    for s, d in edges:
        out[s].append(d)
        nodes.add(s)
        nodes.add(d)
    r = {n: _PR_SCALE for n in nodes}
    for _ in range(iters):
        contrib = defaultdict(int)
        for s, ds in out.items():
            share = r[s] // len(ds)
            for d in ds:
                contrib[d] += share
        r = {n: _PR_BASE + contrib.get(n, 0) * 85 // 100 for n in nodes}
    return r


def test_pagerank_matches_python_reference(spark, tmp_path):
    """Orders constructed so the co-occurrence graph is known exactly:
    order 1 = {10, 11, 12} (triangle), order 2 = {12, 13} (pendant)."""
    import os

    rows = []
    for ok, parts in [(1, [10, 11, 12]), (2, [12, 13])]:
        for i, pk in enumerate(parts):
            rows.append((ok, pk, i, 1.0, 10.0, 0.0, 0.0, "N", "O", "1995-06-01"))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int, l_quantity double,"
        " l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "lineitem.parquet"))

    got = {r.l_partkey: r.rank_u for r in pagerank_parts(spark, d).collect()}
    edges = set()
    for _, parts in [(1, [10, 11, 12]), (2, [12, 13])]:
        for a in parts:
            for b in parts:
                if a != b:
                    edges.add((a, b))
    expect = _py_pagerank(sorted(edges))
    assert got == expect
    # structure: 12 bridges both orders -> highest rank
    assert max(got, key=got.get) == 12


def test_pagerank_mass_and_determinism(spark, sf_dir):
    rows1 = pagerank_parts(spark, sf_dir).collect()
    rows2 = pagerank_parts(spark, sf_dir).collect()
    assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]
    assert rows1
    # every rank >= teleport mass and <= total mass
    for r in rows1:
        assert _PR_BASE <= r.rank_u
