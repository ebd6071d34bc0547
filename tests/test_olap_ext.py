"""Plan + coverage invariants for the OLAP extension operators."""

import pyspark.sql.functions as F

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.olap_ext import cube_revenue, range_join_tiers


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cube_is_one_expand_one_exchange(spark, sf_dir):
    """CUBE must plan as Expand → partial HashAggregate → ONE exchange,
    not one scan per grouping set."""
    p = _plan(cube_revenue(spark, sf_dir))
    assert "Expand" in p
    assert p.count("FileScan") == 1
    assert p.count("Exchange hashpartitioning") == 1


def test_cube_gid_identifies_grouping_sets(spark, sf_dir):
    rows = cube_revenue(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    assert len(by_gid[3]) == 1  # grand total
    grand = by_gid[3][0]
    assert (grand.returnflag, grand.linestatus) == ("ALL", "ALL")
    # subtotals sum to the grand total
    assert sum(r.n_items for r in by_gid[1]) == grand.n_items
    assert sum(r.n_items for r in by_gid[2]) == grand.n_items


def test_range_join_is_hash_not_nested_loop(spark, sf_dir):
    p = _plan(range_join_tiers(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p


def test_range_join_partitions_every_in_domain_event(spark, sf_dir):
    """Tiers tile [0, 500): every event in-domain lands in exactly one
    tier, so tier counts sum to the in-domain event count."""
    rows = range_join_tiers(spark, sf_dir).collect()
    (events,) = load(spark, sf_dir, "events")
    in_domain = events.filter((F.col("value") >= 0) & (F.col("value") < 500)).count()
    assert sum(r.n_events for r in rows) == in_domain


def test_basket_lift_reference(spark, sf_dir):
    """Lift bookkeeping vs a pure-Python reference on the small corpus."""
    from kafka_stream_spark.operators.olap_ext import (
        _BASKET_MIN_SUPPORT,
        part_cooccurrence_lift,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    baskets: dict = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    n_orders = len(baskets)
    freq: dict = {}
    pair_n: dict = {}
    for parts in baskets.values():
        ps = sorted(parts)
        for x in ps:
            freq[x] = freq.get(x, 0) + 1
        for i, x in enumerate(ps):
            for y in ps[i + 1 :]:
                pair_n[(x, y)] = pair_n.get((x, y), 0) + 1

    rows = part_cooccurrence_lift(spark, sf_dir).collect()
    prev = None
    for r in rows:
        assert r.n_both == pair_n[(r.part_a, r.part_b)]
        assert r.n_both >= _BASKET_MIN_SUPPORT
        expect = round(
            r.n_both * n_orders / (freq[r.part_a] * freq[r.part_b]), 6
        )
        assert abs(r.lift - expect) <= 1.0000001e-6
        if prev is not None:
            assert r.lift <= prev + 1e-12
        prev = r.lift


def test_triangles_match_reference(spark, sf_dir):
    from itertools import combinations

    from kafka_stream_spark.operators.components import (
        _TRI_MIN_SUPPORT,
        cooccurrence_triangles,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    baskets: dict = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    pair_n: dict = {}
    for parts in baskets.values():
        for x, y in combinations(sorted(parts), 2):
            pair_n[(x, y)] = pair_n.get((x, y), 0) + 1
    edges = {e for e, n in pair_n.items() if n >= _TRI_MIN_SUPPORT}
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    per_node: dict = {}
    for u, v in edges:
        for w in adj[u] & adj[v]:
            # count each triangle once per node via ordered triple
            if w > v:
                for n in (u, v, w):
                    per_node[n] = per_node.get(n, 0) + 1
    expect = sorted(per_node.items(), key=lambda t: (-t[1], t[0]))[:20]

    got = [(r.node, r.n_triangles) for r in cooccurrence_triangles(spark, sf_dir).collect()]
    assert got == expect
