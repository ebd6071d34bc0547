"""PageRank over the part co-occurrence graph — a fixed-iteration
iterative algorithm that is still EXACTLY oracle-checkable.

The usual reason iterative algorithms escape cross-engine verification
is float drift across iterations. Here every rank lives in integer
micro-units (RANK_SCALE = 1e9 per unit mass), per-edge contributions
are floor divisions, and the damping update is integer times-85-div-100
— so Spark's 5-iteration loop and a DuckDB query with the same five
steps unrolled as chained CTEs produce bit-identical BIGINTs. The
price is floor-rounding mass leakage (~outdeg ulps per node per step),
which is a deterministic property of the operator, not noise.

Graph: undirected part co-occurrence (parts sharing an order), the same
edge generation as ``part_cooccurrence_lift`` — per-order pair join
bounded by basket width squared, never |parts|^2. Degrees and rank
tables are |parts|-sized; each iteration is one (edge join + groupBy)
— the standard distributed power-iteration shape, 5 rounds of it.

Public-algorithm citation: Brin & Page 1998; the integer-arithmetic
determinism trick is the same micro-unit pattern used by
``lm_bigram_logprob`` / ``attribution_linear`` in this repo.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_PR_ITERS = 5
_PR_SCALE = 1_000_000_000  # one unit of rank mass, as BIGINT micro-units
_PR_BASE = _PR_SCALE * 15 // 100  # (1-d) teleport mass, precomputed exactly
_PR_TOPK = 25


def _duck_iter(i: int) -> str:
    """One unrolled power-iteration step: r{i} from r{i-1}."""
    return f"""
    contrib{i} AS (
      SELECT e.dst AS part, sum(r.r // d.outdeg) AS c
      FROM edges e
      JOIN r{i - 1} r ON r.part = e.src
      JOIN degs d ON d.part = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT d.part,
             {_PR_BASE} + coalesce(c.c, 0) * 85 // 100 AS r
      FROM degs d LEFT JOIN contrib{i} c ON c.part = d.part
    )"""


@query(
    "pagerank_parts",
    oracle=f"""
    WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM p a JOIN p b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY src, dst
    ),
    degs AS (SELECT src AS part, count(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT part, CAST({_PR_SCALE} AS BIGINT) AS r FROM degs),
    {",".join(_duck_iter(i) for i in range(1, _PR_ITERS + 1))}
    SELECT part AS l_partkey, CAST(r AS BIGINT) AS rank_u
    FROM r{_PR_ITERS}
    ORDER BY rank_u DESC, l_partkey
    LIMIT {_PR_TOPK}
    """,
    description=(
        f"PageRank ({_PR_ITERS} power iterations, damping 0.85) over the "
        "part co-occurrence graph in exact integer micro-units — an "
        "iterative algorithm with a bit-exact cross-engine oracle "
        "(unrolled-CTE DuckDB twin)"
    ),
)
def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed power iteration. Per round: join ranks to edges on
    src (both hash-partitioned on the part key, so AQE keeps one
    exchange each), floor-divide by out-degree, groupBy dst with
    map-side combine, damp in integer arithmetic. localCheckpoint per
    round keeps the plan linear in iterations instead of exponential
    (sharp edge #10 in NOTES.md)."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    p = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = p.select(F.col("l_orderkey"), F.col("l_partkey").alias("src"))
    b = p.select(F.col("l_orderkey"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    degs = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).select(
        F.col("src").alias("part"), "outdeg"
    )
    ranks = degs.select("part", F.lit(_PR_SCALE).cast("bigint").alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(
                ranks.select(F.col("part").alias("src"), "r"), "src"
            )
            .join(degs.select(F.col("part").alias("src"), "outdeg"), "src")
            .select("dst", F.expr("r div outdeg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        ranks = (
            degs.select("part")
            .join(contrib.select(F.col("dst").alias("part"), "c"), "part", "left")
            .select("part", F.coalesce("c", F.lit(0)).alias("c"))
            .select(
                "part",
                (F.lit(_PR_BASE).cast("bigint") + F.expr("c * 85 div 100"))
                .alias("r"),
            )
            .localCheckpoint()
        )
    return (
        ranks.select(F.col("part").alias("l_partkey"), F.col("r").alias("rank_u"))
        .orderBy(F.desc("rank_u"), "l_partkey")
        .limit(_PR_TOPK)
    )


# ---------------------------------------------------------------------------
# label propagation — synchronous community detection, exactly verifiable
# ---------------------------------------------------------------------------

_LP_ITERS = 4
_LP_TOPK = 25


def _lp_duck_iter(i: int) -> str:
    """One unrolled synchronous round: each node takes the MODE of its
    neighbours' labels (count desc, then smallest label — both integer
    tie-breaks, so the round is deterministic)."""
    return f"""
    votes{i} AS (
      SELECT e.dst AS part, l.lbl, count(*) AS cnt
      FROM edges e JOIN lbl{i - 1} l ON l.part = e.src
      GROUP BY e.dst, l.lbl
    ),
    lbl{i} AS (
      SELECT part, lbl FROM (
        SELECT part, lbl,
               row_number() OVER (PARTITION BY part
                                  ORDER BY cnt DESC, lbl) AS rn
        FROM votes{i}) WHERE rn = 1
    )"""


@query(
    "label_prop_communities",
    oracle=f"""
    WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM p a JOIN p b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY src, dst
    ),
    lbl0 AS (SELECT DISTINCT src AS part, src AS lbl FROM edges),
    {",".join(_lp_duck_iter(i) for i in range(1, _LP_ITERS + 1))}
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS n_members
    FROM lbl{_LP_ITERS}
    GROUP BY lbl
    ORDER BY n_members DESC, community
    LIMIT {_LP_TOPK}
    """,
    description=(
        f"Label-propagation community detection ({_LP_ITERS} synchronous "
        "rounds, mode-of-neighbours update with integer tie-breaks) — a "
        "second iterative algorithm with a bit-exact unrolled-CTE oracle"
    ),
)
def label_prop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raghavan et al. 2007 label propagation (public algorithm), the
    standard near-linear community detector. Synchronous update + full
    integer tie-breaking (max vote count, then min label) makes every
    round a pure function of the previous labelling — no RNG, no float,
    so Spark's loop and the DuckDB unrolled CTEs agree exactly.

    Scale: each round is one edges⋈labels hash join on src plus one
    (dst, lbl) groupBy with map-side combine — the same per-round cost
    envelope as PageRank here; labels/votes tables are |V|- and
    |votes|-sized, never |V|². The mode is computed via ONE aggregate
    (max over (cnt, -lbl) structs), not a ranking window, so each round
    costs two exchanges. localCheckpoint per round keeps plans linear
    (sharp edge #10)."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    p = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = p.select(F.col("l_orderkey"), F.col("l_partkey").alias("src"))
    b = p.select(F.col("l_orderkey"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("part")).distinct().select(
        "part", F.col("part").alias("lbl")
    )
    for _ in range(_LP_ITERS):
        votes = (
            edges.join(labels.select(F.col("part").alias("src"), "lbl"), "src")
            .groupBy("dst", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.groupBy("dst")
            .agg(F.max(F.struct("cnt", (-F.col("lbl")).alias("neg"))).alias("m"))
            .select(F.col("dst").alias("part"), (-F.col("m.neg")).alias("lbl"))
            .localCheckpoint()
        )
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(_LP_TOPK)
    )


# ---------------------------------------------------------------------------
# k-core decomposition — iterative peeling, exactly verifiable
# ---------------------------------------------------------------------------

_KC_K = 2        # keep nodes with in-core degree >= K
_KC_ITERS = 8    # bounded peel rounds; reaches the true fixpoint at the
                 # test SFs (asserted in tests/test_graph_rank.py)
_KC_TOPK = 25
_KC_MIN_W = 2    # edge = parts co-occurring in >= this many orders


def _kc_duck_iter(i: int) -> str:
    """One peel round: survivors = nodes whose degree over edges with
    BOTH endpoints surviving stays >= K. MATERIALIZED stops DuckDB
    inlining the chain into 2^i scans (NOTES sharp edge: plain CTEs)."""
    return f"""
    nodes{i} AS MATERIALIZED (
      SELECT e.src AS part
      FROM edges e
      JOIN nodes{i - 1} a ON a.part = e.src
      JOIN nodes{i - 1} b ON b.part = e.dst
      GROUP BY e.src
      HAVING count(*) >= {_KC_K}
    )"""


@query(
    "kcore_parts",
    oracle=f"""
    WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM p a JOIN p b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY src, dst
      HAVING count(*) >= {_KC_MIN_W}
    ),
    nodes0 AS MATERIALIZED (SELECT DISTINCT src AS part FROM edges),
    {",".join(_kc_duck_iter(i) for i in range(1, _KC_ITERS + 1))}
    SELECT e.src AS l_partkey, CAST(count(*) AS BIGINT) AS core_deg
    FROM edges e
    JOIN nodes{_KC_ITERS} a ON a.part = e.src
    JOIN nodes{_KC_ITERS} b ON b.part = e.dst
    GROUP BY e.src
    ORDER BY core_deg DESC, l_partkey
    LIMIT {_KC_TOPK}
    """,
    description=(
        f"{_KC_K}-core of the weighted part co-occurrence graph "
        f"(edges = pairs sharing >= {_KC_MIN_W} orders): {_KC_ITERS} "
        "synchronous peel rounds — the cluster-quality filter shape "
        "(nodes outside the core are weakly-attached noise), exactly "
        "oracle-checked via unrolled MATERIALIZED CTEs"
    ),
)
def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-core peeling. Per round: restrict edges to
    surviving endpoints (two semi-join-shaped hash joins on the part
    key; the survivor set is |parts|-sized so AQE broadcasts it),
    recount degrees with map-side combine, keep nodes >= K.
    localCheckpoint keeps the plan linear in rounds (sharp edge #10).
    Bounded iteration like pagerank_parts: {_KC_ITERS} rounds reach
    the true fixpoint at the verified SFs; at larger scale the bound
    caps the cost and yields a supergraph of the true core.

    Reference framing: the curation-side use is dedup/community
    cluster QUALITY — cores survive, weakly-attached tendrils drop
    (same graph as part_cooccurrence_lift / pagerank_parts).
    """
    (lineitem,) = load(spark, sf_dir, "lineitem")
    p = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = p.select(F.col("l_orderkey"), F.col("l_partkey").alias("src"))
    b = p.select(F.col("l_orderkey"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= _KC_MIN_W)
        .select("src", "dst")
        .localCheckpoint()
    )
    nodes = edges.select(F.col("src").alias("part")).distinct()
    for _ in range(_KC_ITERS):
        nodes = (
            edges.join(nodes.select(F.col("part").alias("src")), "src")
            .join(nodes.select(F.col("part").alias("dst")), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= _KC_K)
            .select(F.col("src").alias("part"))
            .localCheckpoint()
        )
    return (
        edges.join(nodes.select(F.col("part").alias("src")), "src")
        .join(nodes.select(F.col("part").alias("dst")), "dst")
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_deg"))
        .select(F.col("src").alias("l_partkey"), "core_deg")
        .orderBy(F.desc("core_deg"), "l_partkey")
        .limit(_KC_TOPK)
    )


# ---------------------------------------------------------------------------
# degree assortativity — one-number graph health statistic
# ---------------------------------------------------------------------------


@query(
    "graph_assortativity_parts",
    oracle=f"""
    WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM p a JOIN p b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY src, dst
      HAVING count(*) >= {_KC_MIN_W}
    ),
    degs AS (SELECT src AS part, count(*) AS d FROM edges GROUP BY src),
    ed AS (
      SELECT da.d AS dx, db.d AS dy
      FROM edges e JOIN degs da ON da.part = e.src
                   JOIN degs db ON db.part = e.dst
    )
    SELECT CAST(count(*) AS BIGINT) AS n_edges,
           round(corr(dx, dy), 6) AS assortativity
    FROM ed
    """,
    description=(
        "Degree assortativity (Newman 2002) of the weighted co-purchase "
        "graph: Pearson correlation of endpoint degrees over directed "
        "edge instances — positive = hubs buy with hubs, negative = "
        "hub-leaf structure; the one-number health check read before "
        "trusting community/core structure"
    ),
)
def graph_assortativity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-level degree correlation: edges joined to the |parts|-sized
    degree table on each endpoint (AQE broadcasts it), then a single
    scalar aggregate — two tiny hash joins and one map-side-combined
    agg; nothing pairwise. Both endpoints' directions are present in
    the symmetric edge set, so this equals the undirected definition.

    Public algorithm: Newman, "Assortative mixing in networks" (2002).
    """
    (lineitem,) = load(spark, sf_dir, "lineitem")
    p = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = p.select(F.col("l_orderkey"), F.col("l_partkey").alias("src"))
    b = p.select(F.col("l_orderkey"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= _KC_MIN_W)
        .select("src", "dst")
    )
    degs = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("src").alias("part"), "d"
    )
    ed = (
        edges.join(degs.select(F.col("part").alias("src"),
                               F.col("d").alias("dx")), "src")
        .join(degs.select(F.col("part").alias("dst"),
                          F.col("d").alias("dy")), "dst")
    )
    return ed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.round(F.corr("dx", "dy"), 6).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# link prediction — Resource-Allocation index over the co-purchase graph
# ---------------------------------------------------------------------------

_RA_SCALE = 1_000_000
_RA_TOPK = 25
_RA_MIN_CO = 2  # noise floor: parts co-purchased in >= 2 orders
_TIE_TOPN = 16  # per-node kNN sparsification: |E| <= 2*K*|V| at ANY scale


def _tie_graph(lineitem: DataFrame) -> DataFrame:
    """Tie-strength co-purchase graph, scale-stable by construction:
    absolute count thresholds stop sparsifying when the corpus grows
    (every pair's count grows with data, so a fixed >=2 cut converges
    to the COMPLETE co-occurrence graph — measured 10x on 3x data
    before this fix); keeping each node's top-K strongest ties bounds
    |E| at every scale, and requiring the tie to be MUTUAL (both
    endpoints keep each other — the intersection, not the union, of
    the per-node prunes) additionally bounds every DEGREE by K: a
    union-symmetrized prune lets a universally-popular node keep
    in-degree ~|V|, which blew the 4-hop BFS heap on the 3x audit.
    Deterministic: count desc, then dst; symmetric by construction.

    Pair generation is basket-local, not a self-join: one groupBy
    collects each order's (bounded — TPC-H orders carry <= 7 parts;
    cap any real feed the same way) sorted part set, then src<dst
    pairs explode map-side straight into the pair-count shuffle.
    That is 2 wide exchanges of the big table (baskets, pair counts)
    where the a-join-b formulation paid 4 (distinct, two join
    exchanges, pair counts) — and the shuffled pair stream is HALF
    the size (unordered pairs; the symmetric closure is a narrow
    union of the thresholded survivors)."""
    from pyspark.sql import Window

    # repartition raw narrow rows before the basket agg: the scan's 4
    # row-group tasks otherwise serialize the collect_set CPU (same r7
    # change + A/B evidence as part_cooccurrence_lift, guide §2.5)
    ncpu = int(
        lineitem.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .repartition(ncpu, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) ->"
                " transform(slice(parts, i + 2, size(parts)), y ->"
                " struct(x as src, y as dst))))"
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    co_half = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("co_n"))
        .where(F.col("co_n") >= _RA_MIN_CO)
        # barrier at the SMALLEST lineage cut: everything upstream is the
        # expensive part, and the union/window/intersect below re-read
        # this subplan 4x with NO ReusedExchange (verified in the
        # executed plan) — without it the pair aggregation runs 4x.
        .localCheckpoint()
    )
    co = co_half.unionByName(
        co_half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "co_n")
    )
    pruned = (
        co.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.desc("co_n"), "dst")
            ),
        )
        .where(F.col("rnk") <= _TIE_TOPN)
        .select("src", "dst")
    )
    return (
        pruned.intersect(
            pruned.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint()
    )


def _duck_tie_graph() -> str:
    """The oracle twin of :func:`_tie_graph` (CTEs p/co/pruned/edges)."""
    return f"""p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    co AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS co_n
      FROM p a JOIN p b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY src, dst
      HAVING count(*) >= {_RA_MIN_CO}
    ),
    pruned AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY co_n DESC, dst) AS rnk
        FROM co) WHERE rnk <= {_TIE_TOPN}
    ),
    edges AS (
      SELECT src, dst FROM pruned
      INTERSECT
      SELECT dst, src FROM pruned
    )"""


@query(
    "link_prediction_parts",
    oracle=f"""
    WITH {_duck_tie_graph()},
    degs AS (SELECT src AS part, count(*) AS deg FROM edges GROUP BY src),
    e2 AS (
      SELECT e.src AS v, e.dst AS w, {_RA_SCALE} // d.deg AS ra
      FROM edges e JOIN degs d ON d.part = e.src
    ),
    cand AS (
      SELECT e1.src AS u, e2.w,
             CAST(sum(e2.ra) AS BIGINT) AS score_u,
             CAST(count(*) AS BIGINT) AS common_n
      FROM edges e1
      JOIN e2 ON e1.dst = e2.v
      WHERE e1.src < e2.w
      GROUP BY e1.src, e2.w
    )
    SELECT u AS part_a, w AS part_b, score_u, common_n
    FROM cand
    WHERE NOT EXISTS (
      SELECT 1 FROM edges e WHERE e.src = cand.u AND e.dst = cand.w
    )
    ORDER BY score_u DESC, part_a, part_b
    LIMIT {_RA_TOPK}
    """,
    description=(
        "Link prediction on the part co-purchase graph: Resource-Allocation "
        "index (Zhou/Lu/Zhang 2009 — the integer-exact cousin of "
        "Adamic-Adar: common neighbours weighted 1/deg instead of 1/log "
        "deg) over non-adjacent pairs, top-25 predicted edges"
    ),
    bench=True,
)
def link_prediction_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wedge-join shape, never |parts|^2: the graph keeps only ties
    co-purchased in >= 2 orders (incidental single-order co-occurrence
    is noise for prediction AND the densifier — the threshold keeps the
    edge set ~constant across SFs here), then candidate pairs come from
    the 2-path join (edges x edges on the middle vertex, Sum deg(v)^2
    pair mass — the same bound ``cooccurrence_triangles`` lives with), scored
    by the integer RA weight SCALE div deg(v) so both engines agree
    bit-for-bit, and existing edges are removed with a left-anti join
    (no NOT-IN materialization). Degrees are |parts|-sized; at 100 TB
    the wedge mass is the intrinsic cost of the measure, and skewed hub
    vertices are exactly what AQE's skew-join split is enabled for
    (session defaults)."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    edges = _tie_graph(lineitem)
    degs = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("src").alias("v"), "deg"
    )
    e1 = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    # attach the RA weight to the |edges|-sized side BEFORE the wedge
    # join so the wedge-mass rows carry a ready integer, and aggregate
    # to candidate pairs BEFORE the anti-join so the existing-edge
    # removal runs on the (much smaller) pair set, not the wedge set
    e2 = (
        edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        .join(degs, "v")
        .select("v", "w", F.expr(f"{_RA_SCALE} div deg").alias("ra"))
    )
    scored = (
        e1.join(e2, "v")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(
            F.sum("ra").cast("bigint").alias("score_u"),
            F.count(F.lit(1)).cast("bigint").alias("common_n"),
        )
        .join(
            edges.select(F.col("src").alias("u"), F.col("dst").alias("w")),
            ["u", "w"],
            "left_anti",
        )
    )
    return (
        scored.select(
            F.col("u").alias("part_a"), F.col("w").alias("part_b"),
            "score_u", "common_n",
        )
        .orderBy(F.desc("score_u"), "part_a", "part_b")
        .limit(_RA_TOPK)
    )


# ---------------------------------------------------------------------------
# harmonic centrality — bounded-hop BFS, exactly verifiable
# ---------------------------------------------------------------------------

_HC_HOPS = 4
_HC_SCALE = 1_000_000
_HC_TOPK = 25


def _hc_duck_iter(k: int) -> str:
    """One unrolled BFS relaxation: dist{k} = min(dist{k-1}, one more hop)."""
    return f"""
    dist{k} AS MATERIALIZED (
      SELECT src, dst, min(d) AS d FROM (
        SELECT src, dst, d FROM dist{k - 1}
        UNION ALL
        SELECT p.src, e.dst, p.d + 1 AS d
        FROM dist{k - 1} p JOIN edges e ON e.src = p.dst
        WHERE e.dst <> p.src
      ) GROUP BY src, dst
    )"""


@query(
    "harmonic_centrality_parts",
    oracle=f"""
    WITH {_duck_tie_graph()},
    dist1 AS MATERIALIZED (SELECT src, dst, 1 AS d FROM edges),
    {",".join(_hc_duck_iter(k) for k in range(2, _HC_HOPS + 1))}
    SELECT src AS l_partkey,
           CAST(sum({_HC_SCALE} // d) AS BIGINT) AS harmonic_u,
           CAST(count(*) AS BIGINT) AS n_reached
    FROM dist{_HC_HOPS}
    GROUP BY src
    ORDER BY harmonic_u DESC, l_partkey
    LIMIT {_HC_TOPK}
    """,
    description=(
        f"Harmonic centrality within {_HC_HOPS} hops on the tie-strength "
        "co-purchase graph (Boldi-Vigna 2014's harmonic variant of "
        "closeness, the one defined on disconnected graphs) — integer "
        "1/d micro-weights, bit-exact unrolled-CTE BFS oracle"
    ),
)
def harmonic_centrality_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS as {_HC_HOPS} min-plus relaxation rounds: each
    round is one dist⋈edges hash join plus a (src, dst) min-groupBy with
    map-side combine — the Pregel SSSP step writ as DataFrame ops. The
    hop bound caps the pair mass at Sum |B_4(v)| (4-hop neighborhoods),
    which is what makes all-sources centrality tractable on a sparse
    tie-strength graph — the full-closeness variant is |V| BFS traversals
    and is exactly what this operator deliberately is NOT. localCheckpoint
    per round keeps the plan linear (NOTES.md sharp edge #10)."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    edges = _tie_graph(lineitem)
    dist = edges.select("src", "dst", F.lit(1).alias("d"))
    hop = edges.select(F.col("src").alias("dst"), F.col("dst").alias("w"))
    for _ in range(_HC_HOPS - 1):
        expanded = (
            dist.join(hop, "dst")
            .where(F.col("w") != F.col("src"))
            .select("src", F.col("w").alias("dst"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionByName(expanded)
            .groupBy("src", "dst")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
    return (
        dist.groupBy("src")
        .agg(
            F.sum(F.expr(f"{_HC_SCALE} div d")).cast("bigint").alias("harmonic_u"),
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
        )
        .select(F.col("src").alias("l_partkey"), "harmonic_u", "n_reached")
        .orderBy(F.desc("harmonic_u"), "l_partkey")
        .limit(_HC_TOPK)
    )


# ---------------------------------------------------------------------------
# local clustering coefficient — the per-node cohesion readout
# ---------------------------------------------------------------------------

_CC_SCALE = 1_000_000
_CC_TOPK = 25


@query(
    "clustering_coefficient_parts",
    oracle=f"""
    WITH {_duck_tie_graph()},
    degs AS (SELECT src AS part, count(*) AS deg FROM edges GROUP BY src),
    tri AS (
      SELECT e1.dst AS v, count(*) AS t
      FROM edges e1
      JOIN edges e2 ON e1.dst = e2.src
      WHERE e1.src < e2.dst
        AND EXISTS (
          SELECT 1 FROM edges e
          WHERE e.src = e1.src AND e.dst = e2.dst
        )
      GROUP BY e1.dst
    )
    SELECT d.part AS l_partkey,
           CAST(d.deg AS BIGINT) AS degree,
           CAST(coalesce(t.t, 0) AS BIGINT) AS n_triangles,
           CAST(coalesce(t.t, 0) * {_CC_SCALE} * 2 // (d.deg * (d.deg - 1))
                AS BIGINT) AS clustering_u
    FROM degs d LEFT JOIN tri t ON t.v = d.part
    WHERE d.deg >= 2
    ORDER BY clustering_u DESC, l_partkey
    LIMIT {_CC_TOPK}
    """,
    description=(
        "Local clustering coefficient (Watts-Strogatz 1998) per part on "
        "the tie-strength co-purchase graph: closed wedges at the "
        "middle vertex over deg-choose-2, integer micro-units, top-25 "
        "most clustered parts"
    ),
)
def clustering_coefficient_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same wedge join as ``link_prediction_parts`` with the
    anti-join flipped to a LeftSemi (closed wedges instead of open
    ones): pair mass Sum deg(v)^2 on the ~constant thresholded graph,
    per-v counts with map-side combine, coefficient as a truncating
    integer division both engines share."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    edges = _tie_graph(lineitem)
    degs = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("src").alias("part"), "deg"
    )
    e1 = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = (
        e1.join(e2, "v")
        .where(F.col("u") < F.col("w"))
        .join(
            edges.select(F.col("src").alias("u"), F.col("dst").alias("w")),
            ["u", "w"],
            "left_semi",
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return (
        degs.where(F.col("deg") >= 2)
        .join(tri.select(F.col("v").alias("part"), "t"), "part", "left")
        .select(
            F.col("part").alias("l_partkey"),
            F.col("deg").cast("bigint").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("bigint").alias("n_triangles"),
            F.expr(
                f"CAST(coalesce(t, 0) * {_CC_SCALE} * 2"
                f" div (deg * (deg - 1)) AS BIGINT)"
            ).alias("clustering_u"),
        )
        .orderBy(F.desc("clustering_u"), "l_partkey")
        .limit(_CC_TOPK)
    )
