"""Principal-component analytics over the embedding corpus — an
ITERATIVE linear-algebra operator with a bit-exact cross-engine oracle.

Power iteration (Mises-Geiringer 1929; the standard distributed top-PC
method) is usually written in floats, which makes cross-engine
verification impossible: partition-order float sums drift. Here the
whole computation lives in integers:

- embedding components round to 1e-4 micro-units (BIGINT),
- the per-dim mean is a truncating integer division (Spark ``div``,
  DuckDB ``//`` and a sign*abs//d mirror in the driver all truncate
  toward zero — verified, see NOTES.md),
- each iteration is w = C^T (C v) with v an integer vector renormalized
  to max-abs ~1000 by another truncating division,

so Spark's 4-round loop and a DuckDB query with the same four rounds
unrolled as MATERIALIZED CTEs produce identical BIGINTs. Magnitude
audit at sf0.1 (n=2000, |x|<=0.58): |c| <= ~1.2e4, |d| <= 7.4e8,
|w| <= 1.7e16 — an order of magnitude inside BIGINT; the U_SCALE knob
drops a decade per 100x more rows.

Scale shape: each iteration is ONE corpus pass (the d fold is a per-row
JVM ``aggregate`` over the 64-dim array; the w reduction is a
posexplode + 64-group sum with map-side combine) plus a 64-value
driver collect — the classic distributed power-iteration layout. The
corpus never shuffles; ``c`` is localCheckpointed once and re-scanned.

Output: per-label projection stats along PC1 (the class-separation
readout a curation pipeline uses to sanity-check an embedding space)
plus the argmax loading and the Rayleigh-numerator variance along the
component.

Reference framing: the reference's multilingual feeds
(sample-data/reddit.value.json) imply embedding-space curation at
corpus scale; PCA screening is the standard first look.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_D = 64
_U_SCALE = 10_000  # embedding value -> micro-units (4dp)
_ITERS = 4
_V_NORM = 1_000  # per-iteration max-abs renormalization target


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — Python's // floors, but
    Spark ``div`` and DuckDB ``//`` truncate; this mirrors them."""
    return -((-a) // b) if a < 0 else a // b


def _arr(xs: list[int]) -> str:
    return "array(" + ",".join(f"{x}L" for x in xs) + ")"


def _dot_col(v: list[int]):
    """d = c . v as a sequential JVM array fold (order-fixed, integer)."""
    return F.expr(
        f"aggregate(zip_with(c, {_arr(v)}, (x, y) -> x * y),"
        f" 0L, (a, x) -> a + x)"
    )


def _centered(spark: SparkSession, sf_dir: str):
    """(vec_id, label, c) with c the micro-unit centered embedding."""
    (emb,) = load(spark, sf_dir, "embeddings")
    u = emb.select(
        "vec_id",
        "label",
        F.expr(
            f"transform(embedding,"
            f" x -> CAST(round(CAST(x AS DOUBLE) * {_U_SCALE}) AS BIGINT))"
        ).alias("u"),
    )
    stats = (
        u.select(F.posexplode("u").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    n = int(stats[0]["cnt"])
    s = [0] * _D
    for r in stats:
        s[r["i"]] = int(r["s"])
    m = [_tdiv(x, n) for x in s]
    return u.select(
        "vec_id",
        "label",
        F.expr(f"zip_with(u, {_arr(m)}, (x, y) -> x - y)").alias("c"),
    ).localCheckpoint()


def _power_iterate(c_df, iters: int = _ITERS) -> list[int]:
    """The distributed power loop: per round one corpus pass + a
    64-value collect + integer renormalization in the driver."""
    v = [_V_NORM] * _D
    for _ in range(iters):
        w_rows = (
            c_df.select(F.posexplode("c").alias("i", "ci"), _dot_col(v).alias("d"))
            .groupBy("i")
            .agg(F.sum(F.col("ci") * F.col("d")).alias("w"))
            .collect()
        )
        w = [0] * _D
        for r in w_rows:
            w[r["i"]] = int(r["w"])
        dv = max(1, max(abs(x) for x in w) // _V_NORM)
        v = [_tdiv(x, dv) for x in w]
    return v


def _terms(fmt: str, sep: str = ", ") -> str:
    return sep.join(fmt.format(i=i, i1=i + 1) for i in range(_D))


def _duck_iter(k: int, tbl: str = "c", pfx: str = "") -> str:
    """One unrolled power-iteration round over centered table ``tbl``
    (columns c0..c63): {pfx}p{k} (projections) from tbl and {pfx}v{k-1};
    {pfx}w{k} (C^T C v); {pfx}v{k} (renormalized integer direction)."""
    if k == 1:
        proj = _terms(f"c{{i}} * {_V_NORM}", " + ")
        src = f"{tbl} c"
    else:
        proj = _terms("c.c{i} * v.v{i}", " + ")
        src = f"{tbl} c CROSS JOIN {pfx}v{k - 1} v"
    return f"""
    {pfx}p{k} AS MATERIALIZED (
      SELECT c.*, ({proj}) AS d FROM {src}
    ),
    {pfx}w{k} AS MATERIALIZED (
      SELECT {_terms("CAST(sum(c{i} * d) AS BIGINT) AS w{i}")} FROM {pfx}p{k}
    ),
    {pfx}v{k} AS MATERIALIZED (
      SELECT {_terms("w{i} // dv AS v{i}")}
      FROM (
        SELECT *,
               greatest(1, greatest({_terms("abs(w{i})")}) // {_V_NORM}) AS dv
        FROM {pfx}w{k}
      )
    )"""


def _duck_top(pfx: str = "", suffix: str = "") -> str:
    mx = f"greatest({_terms('abs(v{i})')})"
    dim_cases = " ".join(
        f"WHEN abs(v{i}) = mx THEN {i}" for i in range(_D)
    )
    load_cases = " ".join(
        f"WHEN abs(v{i}) = mx THEN v{i}" for i in range(_D)
    )
    return f"""
    {pfx}top AS MATERIALIZED (
      SELECT CAST(CASE {dim_cases} END AS INT) AS top_dim{suffix},
             CAST(CASE {load_cases} END AS BIGINT) AS top_loading{suffix}
      FROM (SELECT *, {mx} AS mx FROM {pfx}v{_ITERS})
    )"""


@query(
    "pca_embeddings",
    oracle=f"""
    WITH u AS MATERIALIZED (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {_U_SCALE}) AS BIGINT)) AS u
      FROM embeddings
    ),
    s AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {_terms("CAST(sum(u[{i1}]) AS BIGINT) AS s{i}")}
      FROM u
    ),
    m AS MATERIALIZED (
      SELECT n, {_terms("s{i} // n AS m{i}")} FROM s
    ),
    c AS MATERIALIZED (
      SELECT vec_id, label, {_terms("u.u[{i1}] - m.m{i} AS c{i}")}
      FROM u CROSS JOIN m
    ),
    {",".join(_duck_iter(k) for k in range(1, _ITERS + 1))},
    pf AS MATERIALIZED (
      SELECT c.label, ({_terms("c.c{i} * v.v{i}", " + ")}) AS d
      FROM c CROSS JOIN v{_ITERS} v
    ),
    lab AS (
      SELECT label,
             CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(d) AS BIGINT) AS sum_proj_u,
             CAST(min(d) AS BIGINT) AS min_proj_u,
             CAST(max(d) AS BIGINT) AS max_proj_u
      FROM pf GROUP BY label
    ),
    var AS (
      SELECT CAST(sum((abs(d) // {_V_NORM}) * (abs(d) // {_V_NORM}))
                  AS BIGINT) AS var_u
      FROM pf
    ),
    {_duck_top()}
    SELECT lab.label, lab.n_vecs, lab.sum_proj_u, lab.min_proj_u,
           lab.max_proj_u, top.top_dim, top.top_loading, var.var_u
    FROM lab CROSS JOIN var CROSS JOIN top
    ORDER BY lab.label
    """,
    description=(
        f"Top principal component of the embedding corpus by {_ITERS}-round "
        "integer power iteration (micro-unit arithmetic, truncating "
        "renormalization) — per-label projection stats along PC1, argmax "
        "loading, and the Rayleigh variance numerator; bit-exact "
        "unrolled-MATERIALIZED-CTE DuckDB twin"
    ),
)
def pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. Per round: one corpus pass computing
    d = c . v as a JVM array fold, then C^T d as posexplode + 64-group
    integer sums (map-side combined), then a 64-value collect and an
    integer renormalization in the driver (exactly mirrored by the
    oracle's v{k} CTE). localCheckpoint on c keeps the plan linear in
    rounds (NOTES.md sharp edge #10)."""
    c_df = _centered(spark, sf_dir)
    v = _power_iterate(c_df)
    d_col = _dot_col(v)
    proj = c_df.select("label", d_col.alias("d"))
    lab = proj.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("d").cast("bigint").alias("sum_proj_u"),
        F.min("d").cast("bigint").alias("min_proj_u"),
        F.max("d").cast("bigint").alias("max_proj_u"),
    )
    var_df = proj.agg(
        F.sum(
            F.expr(f"(abs(d) div {_V_NORM}) * (abs(d) div {_V_NORM})")
        )
        .cast("bigint")
        .alias("var_u")
    )
    mxv = max(abs(x) for x in v)
    top_dim = min(i for i in range(_D) if abs(v[i]) == mxv)
    return (
        lab.crossJoin(F.broadcast(var_df))
        .select(
            "label",
            "n_vecs",
            "sum_proj_u",
            "min_proj_u",
            "max_proj_u",
            F.lit(top_dim).cast("int").alias("top_dim"),
            F.lit(v[top_dim]).cast("bigint").alias("top_loading"),
            "var_u",
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# two-component PCA — exact integer deflation, then a second power loop
# ---------------------------------------------------------------------------

_SHIFT = 1 << 26  # post-deflation rescale (keeps stage-2 sums inside BIGINT)


@query(
    "pca2_embeddings",
    oracle=f"""
    WITH u AS MATERIALIZED (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {_U_SCALE}) AS BIGINT)) AS u
      FROM embeddings
    ),
    s AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {_terms("CAST(sum(u[{i1}]) AS BIGINT) AS s{i}")}
      FROM u
    ),
    m AS MATERIALIZED (
      SELECT n, {_terms("s{i} // n AS m{i}")} FROM s
    ),
    c AS MATERIALIZED (
      SELECT vec_id, label, {_terms("u.u[{i1}] - m.m{i} AS c{i}")}
      FROM u CROSS JOIN m
    ),
    {",".join(_duck_iter(k) for k in range(1, _ITERS + 1))},
    pf1 AS MATERIALIZED (
      SELECT c.*, ({_terms("c.c{i} * v.v{i}", " + ")}) AS d
      FROM c c CROSS JOIN v{_ITERS} v
    ),
    vn AS MATERIALIZED (
      SELECT ({_terms("v{i} * v{i}", " + ")}) AS vn FROM v{_ITERS}
    ),
    c2s AS MATERIALIZED (
      SELECT p.vec_id, p.label, p.d AS d1,
             {_terms(f"(vn.vn * p.c{{i}} - p.d * v.v{{i}}) // {_SHIFT} AS c{{i}}")}
      FROM pf1 p CROSS JOIN v{_ITERS} v CROSS JOIN vn
    ),
    {",".join(_duck_iter(k, tbl="c2s", pfx="q") for k in range(1, _ITERS + 1))},
    pf2 AS MATERIALIZED (
      SELECT c.label, c.d1, ({_terms("c.c{i} * v.v{i}", " + ")}) AS d2
      FROM c2s c CROSS JOIN qv{_ITERS} v
    ),
    lab AS (
      SELECT label,
             CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(d1) AS BIGINT) AS sum_p1_u,
             CAST(sum(d2) AS BIGINT) AS sum_p2_u
      FROM pf2 GROUP BY label
    ),
    var AS (
      SELECT CAST(sum((abs(d1) // {_V_NORM}) * (abs(d1) // {_V_NORM}))
                  AS BIGINT) AS var1_u,
             CAST(sum((abs(d2) // {_V_NORM}) * (abs(d2) // {_V_NORM}))
                  AS BIGINT) AS var2_u
      FROM pf2
    ),
    {_duck_top(suffix="1")},
    {_duck_top(pfx="q", suffix="2")}
    SELECT lab.label, lab.n_vecs, lab.sum_p1_u, lab.sum_p2_u,
           top.top_dim1, qtop.top_dim2, var.var1_u, var.var2_u
    FROM lab CROSS JOIN var CROSS JOIN top CROSS JOIN qtop
    ORDER BY lab.label
    """,
    description=(
        "Two-component PCA: after the PC1 power loop, the corpus is "
        "deflated EXACTLY in integers (c2 = |v|^2 * c - (c.v) v, which is "
        "orthogonal to v with zero rounding), rescaled by a fixed "
        "truncating shift, and a second power loop extracts PC2 — "
        "per-label projections onto both components, argmax dims, and "
        "both Rayleigh variance numerators; same bit-exact unrolled "
        "oracle discipline as pca_embeddings"
    ),
)
def pca2_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic deflation trick made integer-exact: c2 = vn*c - d*v
    satisfies c2 . v = vn*(c.v) - (c.v)*vn = 0 identically, so no
    orthogonalization error accumulates before the fixed ``div`` rescale
    (truncation consistent across Spark/DuckDB/driver). Stage 2 is the
    same one-pass-per-round loop as stage 1, on the deflated corpus
    (localCheckpointed once). Two iterations' worth of corpus passes,
    still zero corpus shuffles."""
    c_df = _centered(spark, sf_dir)
    v1 = _power_iterate(c_df)
    vn = sum(x * x for x in v1)
    c2_df = (
        c_df.select("vec_id", "label", "c", _dot_col(v1).alias("d1"))
        .select(
            "vec_id",
            "label",
            "d1",
            F.expr(
                f"zip_with(c, {_arr(v1)},"
                f" (x, y) -> ({vn}L * x - d1 * y) div {_SHIFT})"
            ).alias("c"),
        )
        .localCheckpoint()
    )
    v2 = _power_iterate(c2_df)
    pf = c2_df.select("label", "d1", _dot_col(v2).alias("d2"))
    lab = pf.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("d1").cast("bigint").alias("sum_p1_u"),
        F.sum("d2").cast("bigint").alias("sum_p2_u"),
    )
    var_df = pf.agg(
        F.sum(F.expr(f"(abs(d1) div {_V_NORM}) * (abs(d1) div {_V_NORM})"))
        .cast("bigint")
        .alias("var1_u"),
        F.sum(F.expr(f"(abs(d2) div {_V_NORM}) * (abs(d2) div {_V_NORM})"))
        .cast("bigint")
        .alias("var2_u"),
    )

    def _top(v: list[int]) -> int:
        mx = max(abs(x) for x in v)
        return min(i for i in range(_D) if abs(v[i]) == mx)

    return (
        lab.crossJoin(F.broadcast(var_df))
        .select(
            "label",
            "n_vecs",
            "sum_p1_u",
            "sum_p2_u",
            F.lit(_top(v1)).cast("int").alias("top_dim1"),
            F.lit(_top(v2)).cast("int").alias("top_dim2"),
            "var1_u",
            "var2_u",
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Embedding drift by source — centroid shift monitoring
# ---------------------------------------------------------------------------


@query(
    "embedding_drift_by_source",
    oracle="""
    WITH v AS (
      SELECT d.source, e.embedding::DOUBLE[] AS e
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    ),
    expl AS (
      SELECT source, i, e[i] AS x
      FROM v CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    ),
    sc AS (
      SELECT source, array_agg(cx ORDER BY i) AS c, any_value(n) AS n_vecs
      FROM (SELECT source, i, avg(x) AS cx, count(*) AS n
            FROM expl GROUP BY source, i)
      GROUP BY source
    ),
    gc AS (
      SELECT array_agg(cx ORDER BY i) AS g
      FROM (SELECT i, avg(x) AS cx FROM expl GROUP BY i)
    )
    SELECT sc.source,
           CAST(sc.n_vecs AS BIGINT) AS n_vecs,
           round(list_inner_product(sc.c, gc.g)
                 / (sqrt(list_inner_product(sc.c, sc.c))
                    * sqrt(list_inner_product(gc.g, gc.g))), 6) AS cos_to_corpus,
           round(sqrt(list_inner_product(
                   list_transform(range(1, 65), i -> sc.c[i] - gc.g[i]),
                   list_transform(range(1, 65), i -> sc.c[i] - gc.g[i]))), 6)
             AS l2_dist
    FROM sc CROSS JOIN gc
    ORDER BY sc.source
    """,
    description=(
        "Embedding-distribution drift monitor: per-source centroid vs "
        "the corpus centroid (cosine + L2) — catches a source whose "
        "embedding space shifted after a scraper or model change"
    ),
)
def embedding_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The monitoring twin of the PCA family: one groupBy builds each
    source's mean vector (64 x |sources| rows after the map-side
    combine), the corpus centroid is one more row, and the drift math
    runs on centroids only — the corpus-sized work is a single scan
    regardless of how many sources report. Drift in cos/L2 per source
    is the standing data-quality alarm for embedding pipelines."""
    emb, documents = load(spark, sf_dir, "embeddings", "documents")
    v = emb.join(
        documents.select(F.col("doc_id").alias("vec_id"), "source"), "vec_id"
    ).select(
        "source", F.expr("transform(embedding, x -> cast(x as double))").alias("e")
    )
    expl = v.select("source", F.posexplode("e").alias("pos", "x"))
    sc = (
        expl.groupBy("source", "pos")
        .agg(F.avg("x").alias("cx"), F.count(F.lit(1)).alias("n"))
        .groupBy("source")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s["cx"],
            ).alias("c"),
            F.first("n").cast("bigint").alias("n_vecs"),
        )
    )
    gc = (
        expl.groupBy("pos")
        .agg(F.avg("x").alias("cx"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s["cx"],
            ).alias("g")
        )
    )
    dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )
    diff = "zip_with(c, g, (x, y) -> x - y)"
    return (
        sc.crossJoin(F.broadcast(gc))
        .select(
            "source",
            "n_vecs",
            F.round(
                F.expr(
                    f"{dot.format(a='c', b='g')} / (sqrt({dot.format(a='c', b='c')})"
                    f" * sqrt({dot.format(a='g', b='g')}))"
                ),
                6,
            ).alias("cos_to_corpus"),
            F.round(
                F.expr(f"sqrt({dot.format(a=diff, b=diff)})"), 6
            ).alias("l2_dist"),
        )
        .orderBy("source")
    )


@query(
    "embedding_cluster_silhouette",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    expl AS (
      SELECT label, i, e[i] AS x
      FROM v CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    ),
    cent AS (
      SELECT label, list(cx ORDER BY i) AS c
      FROM (SELECT label, i, round(avg(x), 6) AS cx FROM expl GROUP BY label, i)
      GROUP BY label
    ),
    d AS (
      SELECT v.vec_id, v.label, cent.label AS clabel,
             round(sqrt(list_sum(list_transform(generate_series(1, 64),
                   i -> (v.e[i] - cent.c[i]) * (v.e[i] - cent.c[i])))), 6) AS dist
      FROM v CROSS JOIN cent
    ),
    ab AS (
      SELECT vec_id, label,
             min(CASE WHEN clabel = label THEN dist END) AS a,
             min(CASE WHEN clabel <> label THEN dist END) AS b
      FROM d GROUP BY vec_id, label
    ),
    u AS (  -- 6dp micro-units: integer sums are order-independent
      SELECT label,
             CAST(round(round((b - a) / greatest(a, b), 6) * 1000000) AS BIGINT) AS su,
             CAST(round(a * 1000000) AS BIGINT) AS au,
             CAST(round(b * 1000000) AS BIGINT) AS bu
      FROM ab
    )
    SELECT label, count(*) AS n,
           round(sum(su) / count(*) / 1000000, 6) AS avg_silhouette,
           round(sum(au) / count(*) / 1000000, 6) AS avg_intra,
           round(sum(bu) / count(*) / 1000000, 6) AS avg_inter
    FROM u GROUP BY label ORDER BY label
    """,
    description=(
        "Simplified (centroid-based) silhouette per cluster — the "
        "clustering-quality readout for an embedding space (Rousseeuw "
        "1987's s=(b-a)/max(a,b) with centroid distances; the O(n*k) "
        "form used at corpus scale instead of O(n^2) pairwise)"
    ),
    bench=True,
)
def embedding_cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster silhouette on label centroids (k=|labels| centroids).

    Scale shape: the k centroids collapse to ONE collect_list row that
    broadcasts onto the corpus, so a(x)/b(x) are pure map-side array
    math over each vector — the corpus never shuffles; the only
    exchanges are the centroid aggregate and the final per-label
    aggregate (both k-bounded). Reference framing: the reference's
    multilingual feeds imply embedding-space curation; silhouette is
    the standard accept/reject gate on a clustering before it is used
    for IVF bucketing or SemDeDup pruning.
    """
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "label",
        F.expr("transform(embedding, x -> cast(x AS double))").alias("e"),
    )
    expl = v.select("label", F.posexplode("e").alias("pos", "x"))
    cent = (
        expl.groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s["cx"],
            ).alias("c")
        )
    )
    cents = cent.agg(
        F.collect_list(F.struct(F.col("label").alias("clabel"), "c")).alias("cs")
    )
    d2 = "aggregate(zip_with(e, s.c, (x, y) -> (x - y) * (x - y)), 0D, (acc, t) -> acc + t)"
    scored = (
        v.crossJoin(F.broadcast(cents))
        .withColumn(
            "ds",
            F.expr(
                f"transform(cs, s -> struct(s.clabel AS clabel, round(sqrt({d2}), 6) AS dist))"
            ),
        )
        .select(
            "label",
            F.expr("filter(ds, s -> s.clabel = label)[0].dist").alias("a"),
            F.expr(
                "array_min(transform(filter(ds, s -> s.clabel <> label), s -> s.dist))"
            ).alias("b"),
        )
    )
    # 6dp micro-unit BIGINTs before the average: integer sums are
    # associative, so the cross-engine value is partition-order-proof
    # (the repo's standard float-determinism move, NOTES.md rule 3)
    u = scored.select(
        "label",
        F.round(F.round((F.col("b") - F.col("a")) / F.greatest("a", "b"), 6) * 1e6)
        .cast("bigint")
        .alias("su"),
        F.round(F.col("a") * 1e6).cast("bigint").alias("au"),
        F.round(F.col("b") * 1e6).cast("bigint").alias("bu"),
    )
    n = F.count(F.lit(1))
    return (
        u.groupBy("label")
        .agg(
            n.alias("n"),
            F.round(F.sum("su") / n / 1e6, 6).alias("avg_silhouette"),
            F.round(F.sum("au") / n / 1e6, 6).alias("avg_intra"),
            F.round(F.sum("bu") / n / 1e6, 6).alias("avg_inter"),
        )
        .orderBy("label")
    )
