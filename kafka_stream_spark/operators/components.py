"""Dedup-cluster connected components + quantized ANN (north-star M6).

Near-dup pair generation (LSH) yields an EDGE LIST; production dedup needs
one keeper per *transitive* cluster (a~b, b~c ⇒ keep one of {a,b,c}).
``dedup_cluster_components`` closes the pair graph with iterative min-label
propagation — the canonical distributed connected-components loop (each
round is one join + one map-side-combinable groupBy; rounds ≈ graph
diameter, and near-dup graphs are shallow). The query itself runs on
``connected_components_star`` — the alternating large-star/small-star
algorithm (Kiveris et al. 2014) whose round count is O(log n) regardless
of diameter — so chain-shaped dup graphs at scale can't blow the round
budget; both strategies are exported and property-tested equal.

``ann_quantized_topk`` searches on int8-quantized vectors (the
``quantize_embeddings`` output shape): integer dot products make scoring
EXACTLY deterministic (no float summation-order drift) and cut index
memory 4× — the memory-bound regime is what kills billion-vector
brute-force, not FLOPs.

Oracle notes: the component oracle is a recursive CTE computing the same
fixpoint; label propagation is pruned to labels smaller than the
destination node, which is lossless for the min-label result (the
component minimum is never pruned — every other member is larger).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.similarity import (
    _B_BANDS,
    _B_BITS,
    _B_PLANES,
    _BSIGNS,
    _DOT,
    _cosine_expr,
    _to_double,
    embedding_lsh_banded,
)
from kafka_stream_spark.registry import query

_CC_THRESHOLD = 0.3  # same verify threshold as embedding_lsh_banded
_CC_MAX_ITERS = 50


def _banded_pairs_sql() -> str:
    """DuckDB CTE body reproducing embedding_lsh_banded's verified pairs."""
    sig_bits = " + ".join(
        f"(CASE WHEN round(list_inner_product(e, "
        + "[" + ", ".join(f"{s}.0" for s in _BSIGNS[j]) + "]::DOUBLE[]"
        + f"), 9) > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(_B_PLANES)
    )
    return f"""
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sig AS (SELECT vec_id, {sig_bits} AS s FROM v),
    bands AS (
      SELECT vec_id, b.band, (s >> (b.band * {_B_BITS})) & {(1 << _B_BITS) - 1} AS bval
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {_B_BANDS - 1})) AS band) b
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
    ),
    verified AS (
      SELECT vec_a, vec_b
      FROM cand JOIN v x ON x.vec_id = vec_a JOIN v y ON y.vec_id = vec_b
      WHERE round(list_inner_product(x.e, y.e)
                  / (sqrt(list_inner_product(x.e, x.e))
                     * sqrt(list_inner_product(y.e, y.e))), 6) >= {_CC_THRESHOLD}
    )
    """


def connected_components(pairs: DataFrame, max_iters: int = _CC_MAX_ITERS) -> DataFrame:
    """Min-label propagation to a fixpoint over an undirected pair graph.

    ``pairs`` must have two integer columns (endpoint ids); returns
    ``(node, component)`` with component = min node id of the cluster.

    The loop is driver-controlled but all data work is distributed: per
    round one shuffle on the node id (join + min-agg share the exchange).
    ``localCheckpoint`` truncates lineage so plans don't grow with rounds.
    Convergence = sum(labels) unchanged (labels are monotone decreasing).
    Rounds ≈ graph diameter (14 on the sf0.1 graph); pointer-jumping
    variants were A/B-tested and rejected here — the lagged jump saved
    ~1 round for an extra join per round, and the true (self-join) jump
    grew plans catastrophically. For deep graphs use
    `connected_components_star` (O(log n) rounds; 5.3s vs 48.2s on a
    200-node path) — kept here as the marginally-cheaper shallow-graph
    variant (fewer shuffles per round).
    """
    ca, cb = pairs.columns[0], pairs.columns[1]
    edges = (
        pairs.select(F.col(ca).alias("a"), F.col(cb).alias("b"))
        .unionAll(pairs.select(F.col(cb).alias("a"), F.col(ca).alias("b")))
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    ).localCheckpoint()

    # Convergence probe: labels only decrease, so sum(component) is strictly
    # monotone until the fixpoint — an unchanged sum means NO label changed.
    # One scalar agg per round instead of a change-count join.
    prev_sum = None
    for _ in range(max_iters):
        # neighbor labels flow along edges; keep the min of (own, neighbors)
        propagated = (
            labels.join(edges, labels["node"] == edges["a"])
            .select(F.col("b").alias("node"), "component")
            .unionAll(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint()
        labels = propagated
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def _star_labels(pairs: DataFrame, max_iters: int) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star rounds to a fixpoint; returns
    (labels, rounds). See `connected_components_star` for the contract."""
    nodes = (
        pairs.select(F.col(pairs.columns[0]).alias("node"))
        .unionAll(pairs.select(F.col(pairs.columns[1]).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    ca, cb = pairs.columns[0], pairs.columns[1]
    # invariant: edges stored (a, b) with a > b, distinct, no self-loops
    e = (
        pairs.select(
            F.greatest(F.col(ca), F.col(cb)).alias("a"),
            F.least(F.col(ca), F.col(cb)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )

    def sym(edges: DataFrame) -> DataFrame:
        return edges.unionAll(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )

    def large_star(edges: DataFrame) -> DataFrame:
        # per node u: m = min(u, min N(u)); emit (v, m) for v in N(u), v > u
        d = sym(edges)
        mins = d.groupBy("a").agg(F.min("b").alias("mn"))
        return (
            d.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(
                F.col("b").alias("a"),
                F.least(F.col("a"), F.col("mn")).alias("b"),
            )
            .distinct()
        )

    def small_star(edges: DataFrame) -> DataFrame:
        # per node u over SMALLER neighbors S(u) (a>b rows are exactly
        # u=a, v=b): m = min S(u); emit (v, m) for v in S(u)\{m} + (u, m)
        mins = edges.groupBy("a").agg(F.min("b").alias("m"))
        vm = (
            edges.join(mins, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        um = mins.select("a", F.col("m").alias("b"))
        return vm.unionAll(um).distinct()

    prev = None
    rounds = 0
    for _ in range(max_iters):
        e = small_star(large_star(e)).localCheckpoint()
        rounds += 1
        probe = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        cur = (probe["n"], probe["h"])
        if cur == prev:
            break
        prev = cur
    # fixpoint edges form stars (member -> root); roots/isolated label self
    labels = (
        nodes.join(e, nodes["node"] == e["a"], "left")
        .groupBy("node")
        .agg(F.min(F.coalesce(F.col("b"), F.col("node"))).alias("component"))
    )
    return labels, rounds


def connected_components_star(pairs: DataFrame, max_iters: int = _CC_MAX_ITERS) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond").

    Same contract as `connected_components` — two integer endpoint columns
    in, ``(node, component=min id)`` out — but O(log n) rounds instead of
    O(diameter): each round contracts toward stars, so adversarially deep
    graphs (chains from transitive near-dup overlap) converge in a handful
    of rounds where min-label propagation needs one round per hop. Each
    round is two agg+join pairs shuffling on the node id, no collect_list
    (max-degree nodes stay map-side-combinable). Convergence probe is
    (edge count, bit_xor of xxhash64 over edges) — one scalar agg per
    round; a 2^-64 hash collision is the only false-stop path.
    """
    labels, _ = _star_labels(pairs, max_iters)
    return labels


@query(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE
    {_banded_pairs_sql()},
    edges AS (
      SELECT vec_a AS a, vec_b AS b FROM verified
      UNION ALL
      SELECT vec_b AS a, vec_a AS b FROM verified
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    walk(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b AS node, w.lbl
      FROM walk w JOIN edges e ON e.a = w.node
      WHERE w.lbl < e.b
    ),
    comp AS (SELECT node AS vec_id, min(lbl) AS component FROM walk GROUP BY node)
    SELECT c.vec_id, c.component, s.cluster_size,
           CASE WHEN c.vec_id = c.component THEN 1 ELSE 0 END AS is_keeper
    FROM comp c
    JOIN (SELECT component, count(*) AS cluster_size
          FROM comp GROUP BY component) s USING (component)
    ORDER BY c.component, c.vec_id
    """,
    description=(
        "Transitive dedup clusters: connected components over banded-LSH "
        "near-dup pairs via iterative min-label propagation; one keeper "
        "(min id) per cluster"
    ),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clusters over banded-LSH near-dup pairs.

    Backed by the large-star/small-star loop: on this shallow graph it
    ties min-label propagation (4.8s vs 4.1s at sf0.1, 5 rounds vs 14,
    identical labels), but round count is O(log n) instead of O(diameter)
    so a chain-shaped near-dup graph at 100 TB can't blow the round
    budget — the safe default at scale.
    """
    pairs = embedding_lsh_banded(spark, sf_dir).select("vec_a", "vec_b")
    labels = connected_components_star(pairs)
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "component")
        .select(
            F.col("node").alias("vec_id"),
            "component",
            "cluster_size",
            F.when(F.col("node") == F.col("component"), 1).otherwise(0).alias("is_keeper"),
        )
        .orderBy("component", "vec_id")
    )


# ---------------------------------------------------------------------------
# quantized ANN — integer dot products over int8 vectors
# ---------------------------------------------------------------------------

_QDOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v)"
)


@query(
    "ann_quantized_topk",
    oracle="""
    WITH scaled AS (
      SELECT vec_id,
             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) / 127.0
               AS scale,
             embedding
      FROM embeddings
    ),
    qv AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))
               AS q
      FROM scaled WHERE scale > 0
    ),
    q AS (SELECT vec_id AS query_id, q AS qq FROM qv WHERE vec_id < 5),
    scored AS (
      SELECT query_id, vec_id,
             round(list_inner_product(qq, q)
                   / (sqrt(list_inner_product(qq, qq)) * sqrt(list_inner_product(q, q))),
                   6) AS qcosine
      FROM q CROSS JOIN qv
      WHERE vec_id <> query_id
    )
    SELECT query_id, vec_id, qcosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY qcosine DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= 10
    ORDER BY query_id, qcosine DESC, vec_id
    """,
    description=(
        "Brute-force cosine top-10 on int8-quantized vectors: integer dot "
        "products (exact, no fp drift), 4x less index memory — the "
        "memory-bound ANN scale path"
    ),
)
def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize-then-search. Cosine over quantized vectors is scale-free
    (per-vector scales cancel), so scoring is pure bigint zip_with/aggregate
    inside whole-stage codegen; only the final normalization is double.
    Queries broadcast; the corpus never shuffles.
    """
    (emb,) = load(spark, sf_dir, "embeddings")
    scale = (
        F.array_max(F.transform("embedding", lambda x: F.abs(x))).cast("double") / 127.0
    )
    qv = (
        emb.select("vec_id", scale.alias("scale"), "embedding")
        .filter(F.col("scale") > 0)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") / F.col("scale") + 0.5).cast("bigint"),
            ).alias("q"),
        )
    )
    q = qv.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    dot = _QDOT.format(a="qq", b="q")
    nq = _QDOT.format(a="qq", b="qq")
    nv = _QDOT.format(a="q", b="q")
    scored = (
        qv.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                F.expr(f"({dot}) / (sqrt({nq}) * sqrt({nv}))"), 6
            ).alias("qcosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id", "qcosine")
        .orderBy("query_id", F.desc("qcosine"), "vec_id")
    )


_TRI_MIN_SUPPORT = 2


@query(
    "cooccurrence_triangles",
    oracle=f"""
    WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY u, v
      HAVING count(*) >= {_TRI_MIN_SUPPORT}
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
      ) GROUP BY node
    ),
    oriented AS (  -- orient every edge from lower (degree, id) to higher
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS td
      FROM edges e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
      -- wedge endpoints ordered by the SAME (degree, id) total order as
      -- the orientation, else triangles whose upper nodes sort
      -- differently by id vs by degree are missed
      SELECT e1.s AS a, e1.t AS b, e2.t AS c
      FROM oriented e1
      JOIN oriented e2 ON e2.s = e1.s AND (e2.td, e2.t) > (e1.td, e1.t)
      JOIN oriented e3 ON e3.s = e1.t AND e3.t = e2.t
    ),
    per_node AS (
      SELECT node, count(*) AS n_triangles FROM (
        SELECT a AS node FROM tri UNION ALL
        SELECT b FROM tri UNION ALL
        SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT node, n_triangles FROM per_node
    ORDER BY n_triangles DESC, node LIMIT 20
    """,
    description=(
        "Triangle counting on the part co-occurrence graph: degree-"
        "oriented edge joins (bounded fan-out), top-20 parts by "
        "triangle participation"
    ),
)
def cooccurrence_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle enumeration (Suri & Vassilvitskii's MR
    formulation, public): orient every edge from its lower-(degree, id)
    endpoint, so each wedge is generated at exactly one node and the
    per-node join fan-out is bounded by O(sqrt(m)) — the trick that
    keeps power-law hubs from exploding the wedge join at 100 TB. Two
    equi-joins: wedges (s→t1, s→t2) then closure against the oriented
    edge list. Orientation comparisons use exact integer (degree, id)
    tuples, so the triangle set — and the ranking — is engine-stable.
    """
    (lineitem,) = load(spark, sf_dir, "lineitem")
    # basket-local pair generation (u < v by sorted-set construction):
    # one wide exchange for the baskets, one for the pair counts — the
    # a-join-b formulation paid four and shuffled the ordered-pair
    # stream (2x this size). Checkpoint the thresholded edge list (tiny)
    # because degree + orientation re-read it three times with no
    # ReusedExchange.
    edges = (
        lineitem.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts)), y ->"
                    " struct(x as u, y as v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("nc"))
        .where(F.col("nc") >= _TRI_MIN_SUPPORT)
        .select("u", "v")
        .localCheckpoint()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        edges.join(F.broadcast(deg.withColumnRenamed("node", "u")
                               .withColumnRenamed("d", "du")), "u")
        .join(F.broadcast(deg.withColumnRenamed("node", "v")
                          .withColumnRenamed("d", "dv")), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("td"),
    )
    e1 = oriented.select(F.col("s"), F.col("t").alias("t1"), F.col("td").alias("td1"))
    e2 = oriented.select(F.col("s"), F.col("t").alias("t2"), F.col("td").alias("td2"))
    # wedge endpoints ordered by the SAME (degree, id) order as the
    # orientation — ordering by raw id would drop triangles whose upper
    # nodes sort differently by id than by degree
    wedges = e1.join(e2, "s").where(
        (F.col("td2") > F.col("td1"))
        | ((F.col("td2") == F.col("td1")) & (F.col("t2") > F.col("t1")))
    )
    tri = wedges.join(
        oriented.select(F.col("s").alias("t1"), F.col("t").alias("t2")),
        ["t1", "t2"],
    ).select(F.col("s").alias("a"), F.col("t1").alias("b"), F.col("t2").alias("c"))
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node.orderBy(F.desc("n_triangles"), "node").limit(20)


# ---------------------------------------------------------------------------
# Duplicate-cluster size histogram — the dedup impact summary
# ---------------------------------------------------------------------------

from kafka_stream_spark.registry import QUERIES as _REG


@query(
    "dup_cluster_size_histogram",
    oracle=f"""
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM ({_REG["dedup_cluster_components"].oracle})
    GROUP BY cluster_size
    ORDER BY cluster_size
    """,
    description=(
        "Duplicate-cluster size distribution over the connected-"
        "components closure: how much of the corpus sits in clusters "
        "of each size — the dedup-savings estimate (docs minus "
        "clusters = removable rows)"
    ),
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The summary a curation run reports after closure: cluster-size
    histogram (size 1 = unique docs; Σ(n_docs - n_clusters) over
    sizes > 1 = rows dedup would remove). Composes
    dedup_cluster_components verbatim, so the histogram inherits the
    O(log n)-round star closure; the aggregate itself is k rows."""
    comps = dedup_cluster_components(spark, sf_dir)
    return (
        comps.groupBy("cluster_size")
        .agg(
            F.countDistinct("component").cast("bigint").alias("n_clusters"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
        .select(F.col("cluster_size").cast("bigint").alias("cluster_size"),
                "n_clusters", "n_docs")
        .orderBy("cluster_size")
    )
