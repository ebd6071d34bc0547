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


def _kc_peel_python(edges, k):
    """Pure-Python fixpoint k-core for cross-checking the bounded loop."""
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    while True:
        deg = {}
        for s, d in edges:
            if s in nodes and d in nodes:
                deg[s] = deg.get(s, 0) + 1
        keep = {n for n, dg in deg.items() if dg >= k}
        if keep == nodes:
            return nodes
        nodes = keep
        if not nodes:
            return nodes


def test_kcore_bounded_rounds_reach_fixpoint():
    """The oracle's exactness depends on _KC_ITERS >= true peel depth
    at the verified SFs: assert round R == round R-1 in DuckDB."""
    import duckdb

    from kafka_stream_spark.operators.graph_rank import (
        _KC_ITERS, _KC_K, _KC_MIN_W)

    for sf in ("sf0.001", "sf0.01"):
        con = duckdb.connect()
        con.sql(f"""
        CREATE TABLE p AS SELECT DISTINCT l_orderkey, l_partkey
        FROM read_parquet('/root/testdata/{sf}/lineitem.parquet');
        CREATE TABLE edges AS
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM p a JOIN p b ON a.l_orderkey=b.l_orderkey
                         AND a.l_partkey<>b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {_KC_MIN_W};
        """)
        con.sql("CREATE TABLE nodes AS SELECT DISTINCT src AS part FROM edges")
        sizes = []
        for _ in range(_KC_ITERS):
            con.sql(f"""
            CREATE OR REPLACE TABLE nodes AS
            SELECT e.src AS part FROM edges e
            JOIN nodes a ON a.part = e.src
            JOIN nodes b ON b.part = e.dst
            GROUP BY e.src HAVING count(*) >= {_KC_K}
            """)
            sizes.append(con.sql("SELECT count(*) FROM nodes").fetchone()[0])
        assert sizes[-1] == sizes[-2], (sf, sizes)  # converged inside bound


def test_kcore_matches_python_reference(spark, tmp_path):
    from kafka_stream_spark.operators.graph_rank import (
        _KC_K, _KC_MIN_W, kcore_parts)

    # two dense cliques bridged by a single weak path: the bridge node
    # attaches with degree 1 and must peel out of the 2-core
    baskets = [
        (1, [10, 11, 12]), (2, [10, 11, 12]),        # clique A (w>=2 edges)
        (3, [20, 21, 22]), (4, [20, 21, 22]),        # clique B
        (5, [12, 30]), (6, [12, 30]),                # 30 hangs off A
    ]
    rows = [(o, p_) for o, ps in baskets for p_ in ps]
    d = str(tmp_path / "li")
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long") \
        .write.parquet(d)

    # build the same frame the operator builds, but from our parquet
    li = spark.read.parquet(d)
    import kafka_stream_spark.operators.graph_rank as gr
    orig_load = gr.load
    gr.load = lambda s, sd, *names: (li,)
    try:
        got = {r.l_partkey: r.core_deg
               for r in kcore_parts(spark, d).collect()}
    finally:
        gr.load = orig_load

    edges = set()
    from collections import Counter
    c = Counter()
    for _, ps in baskets:
        for x in ps:
            for y in ps:
                if x != y:
                    c[(x, y)] += 1
    edges = {e for e, w in c.items() if w >= _KC_MIN_W}
    core = _kc_peel_python(sorted(edges), _KC_K)
    assert set(got) == core
    assert 30 not in got  # the weak tendril peeled away
    # reported degree = in-core degree
    for n in core:
        assert got[n] == sum(1 for s, dd in edges if s == n and dd in core)


def test_assortativity_matches_python_reference(spark, tmp_path):
    import statistics

    from kafka_stream_spark.operators.graph_rank import (
        _KC_MIN_W, graph_assortativity_parts)
    import kafka_stream_spark.operators.graph_rank as gr

    baskets = [
        (1, [10, 11, 12]), (2, [10, 11, 12]),
        (3, [20, 21]), (4, [20, 21]),
        (5, [12, 20]), (6, [12, 20]),
    ]
    rows = [(o, p_) for o, ps in baskets for p_ in ps]
    d = str(tmp_path / "li2")
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long") \
        .write.parquet(d)
    li = spark.read.parquet(d)
    orig = gr.load
    gr.load = lambda s, sd, *names: (li,)
    try:
        row = graph_assortativity_parts(spark, d).collect()[0]
    finally:
        gr.load = orig

    from collections import Counter
    c = Counter()
    for _, ps in baskets:
        for x in ps:
            for y in ps:
                if x != y:
                    c[(x, y)] += 1
    edges = sorted(e for e, w in c.items() if w >= _KC_MIN_W)
    deg = Counter(s for s, _ in edges)
    xs = [deg[s] for s, _ in edges]
    ys = [deg[t] for _, t in edges]
    want = statistics.correlation(xs, ys)
    assert row.n_edges == len(edges)
    assert row.assortativity == round(want, 6)
