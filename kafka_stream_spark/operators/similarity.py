"""Similarity search over embedding columns (north-star M6).

``embeddings.embedding`` is ``array<float>`` (64-dim). The baseline is
brute-force cosine top-k — expressed entirely with JVM-side higher-order
functions (``zip_with`` + ``aggregate``), no Python in the hot path.

Scale path: brute force is O(|queries| × |corpus|) but embarrassingly
parallel — the corpus stays partitioned, the (small) query set broadcasts,
so there is NO shuffle of the corpus. An IVF-style variant (cluster-id
bucketing to prune the corpus per query) lives in
``kafka_stream_spark.operators.similarity_ivf`` patterns; with the
testdata's coarse ``label`` as the bucket key it becomes a bucket-equi-join.

Determinism: cosines are computed in double and rounded to 6dp before the
threshold/ranking comparisons, with ``vec_id`` tie-breaks, so Spark and
DuckDB agree bit-for-bit despite float summation-order differences.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

# dot(a, b) over array<double> via zip_with + aggregate (whole-stage codegen,
# sequential accumulation — same order DuckDB's list_inner_product uses)
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"


def _cosine_expr(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def _to_double(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def _unit_vectors(emb: DataFrame) -> DataFrame:
    """(vec_id, e): embeddings unit-normalized in double — the PQ coding
    space (on the unit sphere L2² = 2 − 2·cos, so L2 ranking ≡ cosine)."""
    norm = f"sqrt({_DOT.format(a='e0', b='e0')})"
    return emb.select("vec_id", F.expr(_to_double("embedding")).alias("e0")).select(
        "vec_id", F.expr(f"transform(e0, x -> x / ({norm}))").alias("e")
    )


# --- cross-engine oracles for the iteratively-TRAINED ANN/MMR queries ----
#
# k-means / PQ / OPQ training loops are not expressible as one SQL
# statement, so the trained ARTIFACTS (centroids / codebooks / rotation)
# are frozen into per-SF parquet by tools/make_ann_goldens.py and the
# oracles in _ann_oracles.py recompute the FULL search (assignment,
# probing, PQ encoding, ADC, shortlist, exact re-rank) in DuckDB from
# them — the selection is decided cross-engine, nothing pins the engine's
# own row choices. Greedy MMR is fixed-length, so its oracle unrolls the
# whole loop in SQL with no artifacts. tests/test_ann_artifacts.py
# asserts inline retraining reproduces the frozen artifacts.

from kafka_stream_spark.operators import _ann_oracles


@query(
    "ann_cosine_topk",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
    scored AS (
      SELECT query_id, vec_id,
             round(list_inner_product(qe, e)
                   / (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(e, e))),
                   6) AS cosine
      FROM q CROSS JOIN v
      WHERE vec_id <> query_id
    )
    SELECT query_id, vec_id, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= 10
    ORDER BY query_id, cosine DESC, vec_id
    """,
    description="Brute-force cosine top-10 for 5 query vectors (broadcast queries, no corpus shuffle)",
    bench=True,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )


# (embedding_near_dup is registered BELOW the banded-LSH machinery it
# defaults to — see the definition after _BSIGNS.)


@query(
    "ann_ivf_topk",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    expl AS (
      SELECT label, i, e[i] AS x
      FROM v CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    ),
    cent AS (  -- IVF coarse quantizer: per-label centroid
      SELECT label, array_agg(cx ORDER BY i) AS c
      FROM (SELECT label, i, avg(x) AS cx FROM expl GROUP BY label, i)
      GROUP BY label
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
    probe AS (  -- rank buckets per query by rounded centroid cosine
      SELECT query_id, label, row_number() OVER (
               PARTITION BY query_id ORDER BY
               round(list_inner_product(qe, c)
                     / (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(c, c))), 6) DESC,
               label) AS brank
      FROM q CROSS JOIN cent
    ),
    scored AS (  -- search only the 3 nearest buckets
      SELECT p.query_id, v.vec_id,
             round(list_inner_product(q.qe, v.e)
                   / (sqrt(list_inner_product(q.qe, q.qe)) * sqrt(list_inner_product(v.e, v.e))), 6) AS cosine
      FROM probe p JOIN q ON p.query_id = q.query_id
                   JOIN v ON v.label = p.label AND v.vec_id <> p.query_id
      WHERE p.brank <= 3
    )
    SELECT query_id, vec_id, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= 10
    ORDER BY query_id, cosine DESC, vec_id
    """,
    description="IVF-style ANN: centroid-pruned bucket search (the 100 TB scale path; ~bucket_frac of brute-force cost)",
    bench=True,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "label", F.expr(_to_double("embedding")).alias("e"))
    # coarse quantizer: per-label mean vector (explode → avg → re-assemble)
    expl = v.select("label", F.posexplode("e").alias("pos", "x"))
    cent = (
        expl.groupBy("label", "pos")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))), lambda s: s["cx"]
            ).alias("c")
        )
    )
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    # probe: rank buckets by rounded centroid cosine (round-before-rank keeps
    # bucket choice identical across engines despite fp summation order)
    probe = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "label", "qe",
            F.round(F.expr(_cosine_expr("qe", "c")), 6).alias("cdist"),
        )
        .withColumn(
            "brank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cdist"), F.asc("label"))
            ),
        )
        .filter(F.col("brank") <= 3)
        .select("query_id", "label", "qe")
    )
    # search only the selected buckets: corpus filtered by (query, label) join
    scored = (
        v.join(F.broadcast(probe), ["label"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )


# hyperplane signs for (plane j, dim i): low bit of md5("j-i") — a
# deterministic stand-in for a seeded gaussian. Precomputed HERE (hashlib
# md5 == both engines' md5) and embedded as literal ±1 vectors, so the
# signature is 12 plain dot products — no per-row hashing in either engine.
_N_PLANES = 12
_DIMS = 64


def _plane_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{j}-{i}".encode()).hexdigest()[:8], 16) % 2) * 2 - 1
            for i in range(1, _DIMS + 1)
        ]
        for j in range(_N_PLANES)
    ]


_SIGNS = _plane_signs()


def _signs_spark(j: int) -> str:
    return "array(" + ", ".join(f"cast({s} as double)" for s in _SIGNS[j]) + ")"


def _signs_duck(j: int) -> str:
    return "[" + ", ".join(f"{s}.0" for s in _SIGNS[j]) + "]::DOUBLE[]"


@query(
    "embedding_lsh_near_dup",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sig AS (  -- {_N_PLANES}-bit signature: sign bit per hyperplane projection
      SELECT vec_id,
             {" + ".join(
                 f"(CASE WHEN round(list_inner_product(e, {_signs_duck(j)}), 9) > 0"
                 f" THEN {1 << j}::BIGINT ELSE 0 END)"
                 for j in range(_N_PLANES)
             )} AS s
      FROM v
    ),
    cand AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM sig a JOIN sig b ON a.s = b.s AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           round(list_inner_product(x.e, y.e)
                 / (sqrt(list_inner_product(x.e, x.e)) * sqrt(list_inner_product(y.e, y.e))), 6) AS cosine
    FROM cand JOIN v x ON x.vec_id = vec_a JOIN v y ON y.vec_id = vec_b
    WHERE round(list_inner_product(x.e, y.e)
                / (sqrt(list_inner_product(x.e, x.e)) * sqrt(list_inner_product(y.e, y.e))), 6) >= 0.2
    ORDER BY vec_a, vec_b
    """,
    description="Random-hyperplane LSH near-dup: signature buckets then exact verify — O(collisions), not O(N²)",
)
def embedding_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall note (measured): exact 12-bit-bucket collision probability is
    (1 - θ/π)^12 — ~70% at cos≥0.9 (the near-dup regime this targets), but
    ~0.1% at cos 0.2. The 0.2 verify threshold here only ensures nonempty
    verified output on the synthetic corpus (max pairwise cos ≈ 0.51); for
    recall at lower similarity, band the signature like dedup_minhash_lsh
    (b bands of r bits, candidates on any band match)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e")).cache()
    # 12 literal-vector dot products per row — no explode, no hashing
    bits = " + ".join(
        f"(CASE WHEN round({_DOT.format(a='e', b=_signs_spark(j))}, 9) > 0"
        f" THEN cast({1 << j} as bigint) ELSE cast(0 as bigint) END)"
        for j in range(_N_PLANES)
    )
    sig = v.select("vec_id", F.expr(bits).alias("s"))
    cand = (
        sig.alias("a")
        .join(sig.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    )
    x = v.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    y = v.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
    cos = F.round(F.expr(_cosine_expr("ea", "eb")), 6)
    return (
        cand.join(x, ["vec_a"]).join(y, ["vec_b"])
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.2)
        .orderBy("vec_a", "vec_b")
    )


# banded variant: 24 planes = 4 bands × 6 bits; candidate if ANY band
# matches (the minhash banding trick applied to hyperplane signatures) —
# collision prob 1-(1-p^6)^4 with p = 1-θ/π, vs p^12 for the single bucket
_B_PLANES = 24
_B_BANDS = 4
_B_BITS = _B_PLANES // _B_BANDS


def _b_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            (int(hashlib.md5(f"b{j}-{i}".encode()).hexdigest()[:8], 16) % 2) * 2 - 1
            for i in range(1, _DIMS + 1)
        ]
        for j in range(_B_PLANES)
    ]


_BSIGNS = _b_signs()


def _bsigns_spark(j: int) -> str:
    return "array(" + ", ".join(f"cast({s} as double)" for s in _BSIGNS[j]) + ")"


def _bsigns_duck(j: int) -> str:
    return "[" + ", ".join(f"{s}.0" for s in _BSIGNS[j]) + "]::DOUBLE[]"


def banded_sig_spark(e: str = "e") -> str:
    """Spark SQL expr: 24-bit banded hyperplane signature of array column `e`."""
    return " + ".join(
        f"(CASE WHEN round({_DOT.format(a=e, b=_bsigns_spark(j))}, 9) > 0"
        f" THEN cast({1 << j} as bigint) ELSE cast(0 as bigint) END)"
        for j in range(_B_PLANES)
    )


def banded_sig_duck(e: str = "e") -> str:
    """DuckDB expr computing the identical signature (md5-derived ±1 planes)."""
    return " + ".join(
        f"(CASE WHEN round(list_inner_product({e}, {_bsigns_duck(j)}), 9) > 0"
        f" THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(_B_PLANES)
    )


def banded_bands(sig: DataFrame, id_col: str, *extra_cols: str) -> DataFrame:
    """(id, s[, extra]) → one row per (id, band, bval[, extra]). The band
    value is the state that makes near-dup candidate generation an
    EQUI-JOIN: collide on any band → candidate. O(bands) rows per vector."""
    mask = (1 << _B_BITS) - 1
    return sig.select(
        id_col,
        *extra_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"shiftright(s, {b * _B_BITS}) & {mask}").alias("bval"),
                    )
                    for b in range(_B_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(id_col, *extra_cols, "bb.band", "bb.bval")


_BANDS_DUCK = (
    f"SELECT vec_id, b.band, (s >> (b.band * {_B_BITS})) & {(1 << _B_BITS) - 1} AS bval "
    f"FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {_B_BANDS - 1})) AS band) b"
)


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sig AS (SELECT vec_id, {banded_sig_duck()} AS s FROM v),
    bands AS ({_BANDS_DUCK}),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           round(list_inner_product(x.e, y.e)
                 / (sqrt(list_inner_product(x.e, x.e)) * sqrt(list_inner_product(y.e, y.e))), 6) AS cosine
    FROM cand JOIN v x ON x.vec_id = vec_a JOIN v y ON y.vec_id = vec_b
    WHERE round(list_inner_product(x.e, y.e)
                / (sqrt(list_inner_product(x.e, x.e)) * sqrt(list_inner_product(y.e, y.e))), 6) >= 0.35
    ORDER BY vec_a, vec_b
    """,
    description=(
        "Embedding-cosine near-duplicate pairs (threshold 0.35): banded "
        "hyperplane-LSH candidates + exact re-scoring by DEFAULT (the 100 TB "
        "plan — equi-join on band values, collision-bounded); exact=True "
        "keeps the all-pairs baseline for recall audits"
    ),
)
def embedding_near_dup(
    spark: SparkSession, sf_dir: str, exact: bool = False
) -> DataFrame:
    """Default plan: candidates from the 4x6-bit banded hyperplane LSH
    (`_BSIGNS`, the same family as `embedding_lsh_banded`), then exact
    cosine re-scoring of candidates only — no BroadcastNestedLoopJoin /
    crossJoin over two corpus-sized sides anywhere (plan-asserted in
    tests/test_plan_regressions.py). Collision probability for a pair at
    angle θ is 1-(1-p^6)^4 with p = 1-θ/π: ~0.98 in the cos≥0.9 regime
    near-dup targets, deliberately low for merely-similar pairs (tune
    bands/bits at scale — production corpora use longer bands to bound
    candidate mass). ``exact=True`` restores the all-pairs baseline; a
    pytest cross-checks default ⊆ exact on the same threshold.
    """
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))
    x = v.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    y = v.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
    cos = F.round(F.expr(_cosine_expr("ea", "eb")), 6)
    if exact:
        pairs = x.join(y, F.col("vec_a") < F.col("vec_b"))
    else:
        v = v.cache()
        sig = v.select("vec_id", F.expr(banded_sig_spark()).alias("s"))
        # cache: the self-join's broadcast build and streamed sides never
        # share work, so the 24-plane signature expression would run
        # twice (r8, same fix as bitext/_mh_band_candidates)
        bands = banded_bands(sig, "vec_id").cache()
        cand = (
            bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bval") == F.col("b.bval"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
            .distinct()
        )
        pairs = cand.join(x, ["vec_a"]).join(y, ["vec_b"])
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
        .orderBy("vec_a", "vec_b")
    )


@query(
    "embedding_lsh_banded",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sig AS (
      SELECT vec_id,
             {" + ".join(
                 f"(CASE WHEN round(list_inner_product(e, "
                 + "[" + ", ".join(f"{s}.0" for s in _BSIGNS[j]) + "]::DOUBLE[]"
                 + f"), 9) > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
                 for j in range(_B_PLANES)
             )} AS s
      FROM v
    ),
    bands AS (
      SELECT vec_id, b.band, (s >> (b.band * {_B_BITS})) & {(1 << _B_BITS) - 1} AS bval
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {_B_BANDS - 1})) AS band) b
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           round(list_inner_product(x.e, y.e)
                 / (sqrt(list_inner_product(x.e, x.e)) * sqrt(list_inner_product(y.e, y.e))), 6) AS cosine
    FROM cand JOIN v x ON x.vec_id = vec_a JOIN v y ON y.vec_id = vec_b
    WHERE round(list_inner_product(x.e, y.e)
                / (sqrt(list_inner_product(x.e, x.e)) * sqrt(list_inner_product(y.e, y.e))), 6) >= 0.3
    ORDER BY vec_a, vec_b
    """,
    description="Banded hyperplane LSH (4x6 bits): OR-of-bands candidates, exact verify — the recall-bearing embedding dedup",
)
def embedding_lsh_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e")).cache()
    sig = v.select("vec_id", F.expr(banded_sig_spark()).alias("s"))
    # cache: same self-join no-reuse fix as embedding_near_dup (r8)
    bands = banded_bands(sig, "vec_id").cache()
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    x = v.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    y = v.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
    cos = F.round(F.expr(_cosine_expr("ea", "eb")), 6)
    return (
        cand.join(x, ["vec_a"]).join(y, ["vec_b"])
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.3)
        .orderBy("vec_a", "vec_b")
    )


@query(
    "knn_label_centroids",
    oracle="""
    WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
    expl AS (
      SELECT label, i, e[i] AS x
      FROM v CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    )
    SELECT label, i AS dim, round(avg(x), 6) AS centroid
    FROM expl
    GROUP BY label, i
    HAVING i <= 4
    ORDER BY label, dim
    """,
    description="Per-label centroid (IVF coarse-quantizer build step), first 4 dims",
)
def knn_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    # posexplode is 0-based; oracle list index is 1-based → use pos+1
    return (
        emb.select("label", F.posexplode(F.expr(_to_double("embedding"))).alias("pos", "x"))
        .withColumn("dim", F.col("pos") + 1)
        .filter(F.col("dim") <= 4)
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("centroid"))
        .orderBy("label", "dim")
    )


# ---------------------------------------------------------------------------
# k-means-trained IVF — the production coarse quantizer
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 3


def kmeans_codebook(v: DataFrame, k: int = _KM_K, iters: int = _KM_ITERS) -> DataFrame:
    """Lloyd's k-means over (vec_id, e) with DETERMINISTIC init (the k
    lowest vec_ids seed the centroids) and a fixed iteration count — no
    RNG, reproducible across runs.

    Each round: broadcast the k×dim centroids, assign by min rounded
    distance (6dp + centroid-id tie-break → stable under fp reordering),
    recompute centroids per dim (posexplode → avg). All data-side work is
    partition-parallel; only k×dim floats ever reach the driver loop
    boundary (localCheckpoint). Iterative ⇒ registered rows-only (brief:
    iterative algorithms are exempt from the SQL oracle).
    """
    spark = v.sparkSession
    cent = (
        v.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("e").alias("c"))
        .withColumn("cid", F.row_number().over(Window.orderBy("cid")) - 1)
        .localCheckpoint()
    )
    dist2 = """aggregate(zip_with(e, c, (x, y) -> (x - y) * (x - y)),
                         cast(0.0 as double), (acc, d) -> acc + d)"""
    for _ in range(iters):
        assigned = (
            v.crossJoin(F.broadcast(cent))
            .select(
                "vec_id", "e", "cid",
                F.round(F.expr(dist2), 6).alias("d2"),
            )
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy("d2", "cid")
                ),
            )
            .filter(F.col("rn") == 1)
            .select("vec_id", "e", "cid")
        )
        cent = (
            assigned.select("cid", F.posexplode("e").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("cx"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                    lambda s: s["cx"],
                ).alias("c")
            )
        ).localCheckpoint()
    return cent


@query(
    "ann_ivf_kmeans_topk",
    oracle=_ann_oracles.ivf_kmeans_oracle(),  # full search recomputed from frozen artifacts
    description=(
        "IVF ANN with a k-means-TRAINED coarse quantizer (deterministic "
        "init, 3 Lloyd rounds): buckets align with cosine geometry, "
        "recovering the recall the class-label quantizer loses "
        "(measured 0.46 -> 0.94 top-10 recall at sf0.01)"
    ),
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e")).cache()
    cent = kmeans_codebook(v)
    assigned = (
        v.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "e", "cid",
            F.round(
                F.expr(
                    """aggregate(zip_with(e, c, (x, y) -> (x - y) * (x - y)),
                                 cast(0.0 as double), (acc, d) -> acc + d)"""
                ),
                6,
            ).alias("d2"),
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id").orderBy("d2", "cid")),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "e", "cid")
    )
    q = assigned.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    probe = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "cid", "qe",
            F.round(F.expr(_cosine_expr("qe", "c")), 6).alias("cdist"),
        )
        .withColumn(
            "brank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cdist"), F.asc("cid"))
            ),
        )
        .filter(F.col("brank") <= 3)
        .select("query_id", "cid", "qe")
    )
    scored = (
        assigned.join(F.broadcast(probe), ["cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )


# ---------------------------------------------------------------------------
# product quantization — M subspace codebooks + ADC scoring
# ---------------------------------------------------------------------------

_PQ_M = 8        # subspaces (64 dims -> 8 x 8)
_PQ_SUB = _DIMS // _PQ_M
_PQ_K = 16       # centroids per subspace -> 4 bits/code, 8 bytes/vector
_PQ_ITERS = 3
_PQ_SHORTLIST = 50  # ADC candidates per query re-ranked exactly

_SQDIST = """aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),
                       cast(0.0 as double), (acc, d) -> acc + d)"""


def _pq_subvectors(v: DataFrame, keys: tuple[str, ...] = ("vec_id",)) -> DataFrame:
    """(*keys, m, sub): one row per vector per subspace, JVM-side slice."""
    subs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("m"),
                    F.slice("e", m * _PQ_SUB + 1, _PQ_SUB).alias("sub"),
                )
                for m in range(_PQ_M)
            ]
        )
    ).alias("s")
    return v.select(*keys, subs).select(*keys, "s.m", "s.sub")


def pq_codebooks(v: DataFrame, iters: int = _PQ_ITERS) -> DataFrame:
    """Joint Lloyd training of all M subspace codebooks in ONE loop:
    rows are (vec_id, m, sub), centroids are (m, cid, c) — each round is
    a single broadcast join + argmin + per-(m, cid, dim) average, so the
    driver loop stays M-independent (same 2 jobs/round as plain k-means).
    Deterministic: init from the K lowest vec_ids' subvectors, distances
    rounded to 6dp with cid tie-break."""
    subs = _pq_subvectors(v).localCheckpoint()
    cent = (
        subs.filter(F.col("vec_id") < _PQ_K)
        .select("m", F.col("vec_id").alias("cid"), F.col("sub").alias("c"))
        .localCheckpoint()
    )
    d2 = _SQDIST.format(a="sub", b="c")
    for _ in range(iters):
        assigned = (
            subs.join(F.broadcast(cent), "m")
            .select("vec_id", "m", "sub", "cid", F.round(F.expr(d2), 6).alias("d2"))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("vec_id", "m").orderBy("d2", "cid")
                ),
            )
            .filter(F.col("rn") == 1)
        )
        cent = (
            assigned.select("m", "cid", F.posexplode("sub").alias("pos", "x"))
            .groupBy("m", "cid", "pos")
            .agg(F.avg("x").alias("cx"))
            .groupBy("m", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                    lambda s: s["cx"],
                ).alias("c")
            )
        ).localCheckpoint()
    return cent


@query(
    "ann_pq_topk",
    oracle=_ann_oracles.pq_oracle(),  # full ADC search recomputed from frozen codebooks
    description=(
        "Product-quantization ANN: 8x8-dim codebooks (16 centroids each = "
        "8 bytes/vector, 32x memory cut) + asymmetric-distance scoring "
        "(per-query distance tables, one broadcast join) + exact re-rank "
        "of the 50-deep ADC shortlist — the billion-vector index layout; "
        "recall 0.78 and determinism pytest-probed"
    ),
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC search: the corpus is stored ONLY as (vec_id, m, cid) codes —
    scoring joins codes to the query's per-subspace distance table
    (broadcast: 5 queries × 8 subspaces × 16 centroids) and sums, a
    map-side-combinable groupBy(query, vec). No raw vectors touched at
    query time: that's the 32× memory win that makes brute-force viable
    at billions of vectors.

    Vectors are unit-normalized before coding: the exact baseline ranks
    by cosine, and on the unit sphere L2² = 2 − 2·cos — identical
    ordering — while raw-magnitude L2 would rank differently (measured:
    recall 0.32 unnormalized → 0.82 normalized).
    """
    (emb,) = load(spark, sf_dir, "embeddings")
    raw = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))
    v = _unit_vectors(emb).cache()
    return _pq_adc_search(v, raw)


def _pq_adc_search(v: DataFrame, raw: DataFrame) -> DataFrame:
    """Shared PQ pipeline: train codebooks on ``v`` (vec_id, e unit
    vectors), encode, ADC-score queries vec_id<5, exact-re-rank the
    shortlist. Factored out so the OPQ variant can rotate ``v`` first
    and reuse the identical search path.

    The exact re-rank computes cosine over ``raw`` (the ORIGINAL
    embedding doubles, not the normalized/rotated coding space): cosine
    is scale-invariant and rotation preserves inner products, so the
    ranking is the same, and the emitted values are reproducible by any
    engine straight from the parquet — which is what lets the golden
    oracle recompute them in DuckDB."""
    cent = pq_codebooks(v)
    subs = _pq_subvectors(v)
    d2 = _SQDIST.format(a="sub", b="c")
    codes = (
        subs.join(F.broadcast(cent), "m")
        .select("vec_id", "m", "cid", F.round(F.expr(d2), 6).alias("d2"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id", "m").orderBy("d2", "cid")),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "cid")
    )
    qsubs = _pq_subvectors(v.filter(F.col("vec_id") < 5)).select(
        F.col("vec_id").alias("query_id"), "m", F.col("sub").alias("qsub")
    )
    dtab = (
        qsubs.join(F.broadcast(cent), "m")
        .select(
            "query_id", "m", "cid",
            F.round(F.expr(_SQDIST.format(a="qsub", b="c")), 6).alias("dq"),
        )
    )
    scored = (
        codes.join(F.broadcast(dtab), ["m", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("dq"), 6).alias("adc_dist"))
    )
    # shortlist by ADC, then EXACT re-rank of the shortlist — the
    # production PQ architecture: codes prune 500->50, raw vectors are
    # touched only for the shortlist (measured: top-10 recall 0.32 by
    # raw ADC rank -> 0.78 with the 50-deep shortlist re-ranked exactly)
    w_adc = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= _PQ_SHORTLIST)
        .select("query_id", "vec_id")
    )
    q = raw.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    exact = (
        shortlist.join(raw, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "vec_id",
            F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )


# ---------------------------------------------------------------------------
# IVF-PQ — residual-encoded inverted lists, the billion-vector composition
# ---------------------------------------------------------------------------

_IVFPQ_NPROBE = 3


def _ivfpq_residuals(v: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cid, e): assign each vector to its nearest coarse
    centroid (6dp-rounded L2², cid tie-break) and emit the RESIDUAL
    vector — the space the fine PQ codebooks are trained/encoded in.
    Shared by the query and tools/make_ann_goldens.py so the frozen
    artifacts can never drift from the query's own glue."""
    d2 = _SQDIST.format(a="e", b="c")
    return (
        v.crossJoin(F.broadcast(cent))
        .select("vec_id", "e", "cid", F.round(F.expr(d2), 6).alias("d2"), "c")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id").orderBy("d2", "cid")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "vec_id", "cid",
            F.expr("zip_with(e, c, (x, y) -> x - y)").alias("e"),  # residual
        )
        .localCheckpoint()
    )


@query(
    "ann_ivfpq_topk",
    oracle=_ann_oracles.ivfpq_oracle(),  # full probe+ADC search recomputed from frozen artifacts
    description=(
        "IVF-PQ ANN: k-means coarse quantizer partitions the corpus into "
        "inverted lists; RESIDUALS (vector minus list centroid) are "
        "product-quantized to 8 bytes; queries probe the 3 nearest lists "
        "and score codes by per-list ADC tables, then exact-re-rank a "
        "50-deep shortlist — probing replaces the full-corpus ADC scan "
        "with nprobe/k of it, the memory layout stays 16 bytes/vector"
    ),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composition of `kmeans_codebook` (coarse) and `pq_codebooks`
    (fine, trained on residuals — residuals are near-zero-mean so the 16
    centroids/subspace spend their resolution where the data is, the
    reason FAISS IVFPQ encodes residuals rather than raw vectors).

    Scale shape: the corpus persists ONLY as (vec_id, cid, 8 PQ codes);
    at 1e9 vectors that's ~16 GB, bucketable by `cid` so a probe touches
    nprobe/k of the partitions (partition pruning on the list id). Query
    time is: tiny broadcast of per-(query, probed-list) distance tables
    (nprobe × M × K doubles per query), one map-side-combinable sum, and
    an exact re-rank that reads raw vectors for only `shortlist` ids.
    No corpus shuffle at any step.
    """
    (emb,) = load(spark, sf_dir, "embeddings")
    v = _unit_vectors(emb).cache()
    cent = kmeans_codebook(v)
    assigned = _ivfpq_residuals(v, cent)
    pqc = pq_codebooks(assigned.select("vec_id", "e")).select(
        "m", F.col("cid").alias("pcid"), "c"
    )
    subs = _pq_subvectors(assigned, keys=("vec_id", "cid"))
    dsub = _SQDIST.format(a="sub", b="c")
    codes = (
        subs.join(F.broadcast(pqc), "m")
        .select("vec_id", "cid", "m", "pcid", F.round(F.expr(dsub), 6).alias("d2"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id", "m").orderBy("d2", "pcid")),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "m", "pcid")
    )
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    probe = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "cid", "qe", "c",
            F.round(F.expr(_SQDIST.format(a="qe", b="c")), 6).alias("d2"),
        )
        .withColumn(
            "brank",
            F.row_number().over(Window.partitionBy("query_id").orderBy("d2", "cid")),
        )
        .filter(F.col("brank") <= _IVFPQ_NPROBE)
        .select(
            "query_id", "cid",
            F.expr("zip_with(qe, c, (x, y) -> x - y)").alias("e"),  # query residual
        )
    )
    dtab = (
        _pq_subvectors(probe, keys=("query_id", "cid"))
        .join(F.broadcast(pqc), "m")
        .select(
            "query_id", "cid", "m", "pcid",
            F.round(F.expr(dsub), 6).alias("dq"),
        )
    )
    scored = (
        codes.join(F.broadcast(dtab), ["cid", "m", "pcid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("dq"), 6).alias("adc_dist"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= _PQ_SHORTLIST)
        .select("query_id", "vec_id")
    )
    raw = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))
    qx = raw.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    exact = (
        shortlist.join(raw, "vec_id")
        .join(F.broadcast(qx), "query_id")
        .select(
            "query_id", "vec_id",
            F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )


# ---------------------------------------------------------------------------
# embedding outlier filter — centroid-distance quality screening
# ---------------------------------------------------------------------------

_OUTLIER_BOTTOM_K = 5


@query(
    "embedding_outliers",
    oracle=f"""
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
    scored AS (
      SELECT v.vec_id, v.label,
             round(list_inner_product(v.e, cent.c)
                   / (sqrt(list_inner_product(v.e, v.e))
                      * sqrt(list_inner_product(cent.c, cent.c))), 6)
               AS centroid_cos
      FROM v JOIN cent USING (label)
    )
    SELECT vec_id, label, centroid_cos,
           CASE WHEN rnk <= {_OUTLIER_BOTTOM_K} THEN 1 ELSE 0 END AS is_outlier
    FROM (SELECT *, row_number() OVER (PARTITION BY label
                                       ORDER BY centroid_cos, vec_id) AS rnk
          FROM scored)
    ORDER BY vec_id
    """,
    description=(
        "Embedding-based quality screening: cosine of each vector to its "
        "label centroid; bottom-5 per label flagged as outliers (the "
        "SemDeDup/CLIP-score-filter shape for curation)"
    ),
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid pass is one map-side-combinable agg (|labels|×dims rows);
    centroids broadcast back so the corpus never shuffles for scoring.
    The per-label bottom-k window shuffles |corpus| once on the label —
    replaceable by a threshold filter (no window) when labels are huge.
    Centroid coords are rounded to 6dp in BOTH engines before the cosine
    so cross-engine float-avg summation-order drift can't move a rank.
    """
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "label", F.expr(_to_double("embedding")).alias("e"))
    cent = (
        v.select("label", F.posexplode("e").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s["cx"],
            ).alias("c")
        )
    )
    scored = v.join(F.broadcast(cent), "label").select(
        "vec_id", "label",
        F.round(F.expr(_cosine_expr("e", "c")), 6).alias("centroid_cos"),
    )
    w = Window.partitionBy("label").orderBy(F.asc("centroid_cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .select(
            "vec_id", "label", "centroid_cos",
            F.when(F.col("rnk") <= _OUTLIER_BOTTOM_K, 1).otherwise(0).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# OPQ — optimized product quantization (learned rotation before coding)
# ---------------------------------------------------------------------------

_OPQ_ITERS = 3      # alternations of (train codebooks | solve rotation)
_OPQ_SAMPLE = 2048  # rotation trains on a bounded sample; applies to all


def _opq_rotation(x):
    """Train an orthogonal rotation R minimizing PQ reconstruction error
    (Ge et al., "Optimized Product Quantization", CVPR 2013 — the
    non-parametric alternation): repeat [deterministic per-subspace
    Lloyd on R·x  →  orthogonal Procrustes R = U·Vᵀ of (Yᵀ X)].
    Pure numpy on a driver-side sample (R is d×d = 64×64 regardless of
    corpus size); deterministic — k-means inits from the first K rows,
    LAPACK SVD is deterministic for identical input.
    """
    n, d = x.shape
    r = np.eye(d)
    for _ in range(_OPQ_ITERS):
        xr = x @ r.T
        y = np.empty_like(xr)
        for m in range(_PQ_M):
            s = xr[:, m * _PQ_SUB : (m + 1) * _PQ_SUB]
            c = s[: _PQ_K].copy()
            for _ in range(_PQ_ITERS):
                d2 = ((s[:, None, :] - c[None, :, :]) ** 2).sum(-1)
                a = d2.argmin(1)
                for j in range(_PQ_K):
                    pts = s[a == j]
                    if len(pts):
                        c[j] = pts.mean(0)
            d2 = ((s[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            y[:, m * _PQ_SUB : (m + 1) * _PQ_SUB] = c[d2.argmin(1)]
        u, _, vt = np.linalg.svd(y.T @ x)
        r = u @ vt
    return r


@query(
    "ann_opq_topk",
    oracle=_ann_oracles.opq_oracle(),  # rotation applied + full ADC search from frozen artifacts
    description=(
        "OPQ ANN: PQ behind a learned orthogonal rotation (alternating "
        "Lloyd/Procrustes on a bounded sample) — rotation balances "
        "variance across the 8 subspaces before coding; identical ADC + "
        "exact-re-rank search path as ann_pq_topk — measured top-10 "
        "recall 0.84 vs plain PQ's 0.78 at sf0.01"
    ),
)
def ann_opq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rotation fixes PQ's blind spot: PQ quantizes axis-aligned
    subspaces independently, so correlated/unbalanced dimensions waste
    code bits; an orthogonal R decorrelates across subspace boundaries.
    Training is driver-side on ≤ _OPQ_SAMPLE vectors (R is 64×64 — its
    size is corpus-independent, the canonical train-small/apply-big
    split); application is one Arrow-batched matmul pandas_udf, a pure
    map — no shuffle added to the PQ pipeline. Rotation preserves inner
    products, so the exact shortlist re-rank still emits TRUE cosines
    (invariance test-asserted)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    v = _unit_vectors(emb).cache()
    r = _opq_train_rotation(v)
    raw = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))
    vr = _opq_apply(v, r)
    return _pq_adc_search(vr, raw)


def _opq_train_rotation(v: DataFrame):
    """Driver-side OPQ rotation training on the bounded id-ordered sample."""
    sample = v.orderBy("vec_id").limit(_OPQ_SAMPLE).collect()
    return _opq_rotation(np.array([row.e for row in sample]))


def _opq_apply(v: DataFrame, r) -> DataFrame:
    """Apply the 64×64 rotation as one Arrow-batched matmul — a pure map."""
    rb = v.sparkSession.sparkContext.broadcast(r)

    @F.pandas_udf("array<double>")
    def rotate(col: pd.Series) -> pd.Series:
        mat = np.vstack(col.to_numpy())
        out = mat @ rb.value.T
        return pd.Series(list(out))

    return v.select("vec_id", rotate("e").alias("e"))


# ---------------------------------------------------------------------------
# MMR diversity selection (rows-only: greedy selection is inherently
# sequential — no SQL-expressible oracle; reference-scored in tests)
# ---------------------------------------------------------------------------

_MMR_QUERY_VEC = 0
_MMR_LAMBDA = 0.7
_MMR_CANDIDATES = 50
_MMR_SELECT = 10


def _mmr_greedy(cands: list, lam: float, n_select: int) -> list:
    """Pure greedy MMR over (vec_id, relevance, vector) triples.

    Deterministic: scores rounded 6dp, ties broken by vec_id. Runs on
    the driver over the CANDIDATE set only (n_cand × dim floats), never
    the corpus — the same driver-merge budget as a TakeOrdered top-k.
    """
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    selected: list = []
    remaining = {c[0]: c for c in cands}
    while remaining and len(selected) < n_select:
        best = None
        for vid in sorted(remaining):
            _, rel, vec = remaining[vid]
            max_sim = max(
                (cos(vec, s[2]) for s in selected), default=0.0
            )
            score = round(lam * rel - (1 - lam) * max_sim, 6)
            if best is None or score > best[0] or (score == best[0] and vid < best[1]):
                best = (score, vid)
        vid = best[1]
        c = remaining.pop(vid)
        selected.append((c[0], c[1], c[2], best[0]))
    return selected


@query(
    "mmr_diverse_topk",
    oracle=_ann_oracles.mmr_oracle(),  # fully-unrolled greedy in SQL, no artifacts
    description=(
        "Maximal-marginal-relevance selection: top-50 cosine candidates "
        "reduced to 10 results balancing query relevance against "
        "redundancy (lambda=0.7) — the diverse-retrieval/diverse-few-shot "
        "selection shape"
    ),
)
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate generation is the distributed part (broadcast query
    vector, TakeOrderedAndProject top-50 — identical plan shape to
    ann_cosine_topk); the greedy re-selection runs over just those 50
    on the driver, which is the standard MMR deployment at any corpus
    size (greedy MMR is sequential by definition — each pick depends on
    all previous picks). Emitted scores are 6dp-rounded, ties by id, so
    the selection is engine- and partitioning-independent.
    """
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))
    q = v.filter(F.col("vec_id") == _MMR_QUERY_VEC).select(F.col("e").alias("qe"))
    scored = (
        v.filter(F.col("vec_id") != _MMR_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("relevance"),
            "e",
        )
        .orderBy(F.col("relevance").desc(), "vec_id")
        .limit(_MMR_CANDIDATES)
    )
    cands = [(r.vec_id, r.relevance, list(r.e)) for r in scored.collect()]
    picked = _mmr_greedy(cands, _MMR_LAMBDA, _MMR_SELECT)
    rows = [
        (i + 1, vid, rel, score) for i, (vid, rel, _, score) in enumerate(picked)
    ]
    return spark.createDataFrame(
        rows, "rank INT, vec_id LONG, relevance DOUBLE, mmr_score DOUBLE"
    )


# Shared oracle CTE block: exact cosine ground truth (top-10 per query)
# and the IVF candidate list, exactly as ann_cosine_topk / ann_ivf_topk
# compute them.  Used by both ann_eval_metrics and ndcg_eval_retrieval.
_EVAL_CTES = """v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
    exact AS (
      SELECT query_id, vec_id, rn FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rn
        FROM (
          SELECT query_id, vec_id,
                 round(list_inner_product(qe, e)
                       / (sqrt(list_inner_product(qe, qe))
                          * sqrt(list_inner_product(e, e))), 6) AS cosine
          FROM q CROSS JOIN v WHERE vec_id <> query_id
        )
      ) WHERE rn <= 10
    ),
    expl AS (
      SELECT label, i, e[i] AS x
      FROM v CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    ),
    cent AS (
      SELECT label, array_agg(cx ORDER BY i) AS c
      FROM (SELECT label, i, avg(x) AS cx FROM expl GROUP BY label, i)
      GROUP BY label
    ),
    probe AS (
      SELECT query_id, label, row_number() OVER (
               PARTITION BY query_id ORDER BY
               round(list_inner_product(qe, c)
                     / (sqrt(list_inner_product(qe, qe))
                        * sqrt(list_inner_product(c, c))), 6) DESC,
               label) AS brank
      FROM q CROSS JOIN cent
    ),
    ivf AS (
      SELECT query_id, vec_id, rn FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rn
        FROM (
          SELECT p.query_id, v.vec_id,
                 round(list_inner_product(q.qe, v.e)
                       / (sqrt(list_inner_product(q.qe, q.qe))
                          * sqrt(list_inner_product(v.e, v.e))), 6) AS cosine
          FROM probe p JOIN q ON p.query_id = q.query_id
                       JOIN v ON v.label = p.label AND v.vec_id <> p.query_id
          WHERE p.brank <= 3
        )
      ) WHERE rn <= 10
    )"""


@query(
    "ann_eval_metrics",
    oracle=f"""
    WITH {_EVAL_CTES},
    hits AS (
      SELECT e.query_id, count(i.vec_id) AS n_hits
      FROM exact e LEFT JOIN ivf i
        ON e.query_id = i.query_id AND e.vec_id = i.vec_id
      GROUP BY e.query_id
    ),
    top1 AS (SELECT query_id, vec_id FROM exact WHERE rn = 1),
    rr AS (
      SELECT t.query_id,
             coalesce(round(1.0 / min(i.rn), 6), 0.0) AS reciprocal_rank
      FROM top1 t LEFT JOIN ivf i
        ON t.query_id = i.query_id AND t.vec_id = i.vec_id
      GROUP BY t.query_id
    )
    SELECT h.query_id, h.n_hits,
           round(h.n_hits / 10.0, 6) AS recall_at_10,
           rr.reciprocal_rank
    FROM hits h JOIN rr USING (query_id)
    ORDER BY h.query_id
    """,
    description=(
        "ANN quality evaluation as a query: recall@10 and reciprocal "
        "rank of the IVF search against the exact cosine ground truth, "
        "per query vector"
    ),
)
def ann_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-eval harness expressed as a join of two existing
    operators' outputs — the pattern for continuously monitoring ANN
    index quality in production: ground truth on a small query sample
    (exact search over the sample is cheap even at 100 TB), candidate
    lists from the index path, metrics from a rank-preserving join.
    Composes ann_cosine_topk and ann_ivf_topk verbatim so any plan
    improvement there is inherited here.
    """
    exact = ann_cosine_topk(spark, sf_dir).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
        ),
    )
    ivf = ann_ivf_topk(spark, sf_dir).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
        ),
    )
    hits = (
        exact.select("query_id", "vec_id")
        .join(
            ivf.select("query_id", "vec_id", F.col("rn").alias("ivf_rn")),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("ivf_rn").alias("n_hits"))
    )
    top1 = exact.where(F.col("rn") == 1).select("query_id", "vec_id")
    rr = (
        top1.join(
            ivf.select("query_id", "vec_id", F.col("rn").alias("ivf_rn")),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.coalesce(F.round(1.0 / F.min("ivf_rn"), 6), F.lit(0.0)).alias(
                "reciprocal_rank"
            )
        )
    )
    return (
        hits.join(rr, "query_id")
        .select(
            "query_id",
            "n_hits",
            F.round(F.col("n_hits") / 10.0, 6).alias("recall_at_10"),
            "reciprocal_rank",
        )
        .orderBy("query_id")
    )


# nDCG@10: integer per-position micro-weights round(1e6/log2(pos+1))
# computed ONCE in Python and embedded as literals in BOTH engines, so
# DCG is pure integer arithmetic (bit-exact cross-engine); only the final
# normalization divides.  Graded relevance comes from the exact ranking:
# ground-truth top-3 -> grade 3, ranks 4-10 -> grade 1, else 0.
_NDCG_K = 10
_DCG_W = [round(1_000_000 / math.log2(i + 1)) for i in range(1, _NDCG_K + 1)]
_NDCG_IDEAL = [3, 3, 3, 1, 1, 1, 1, 1, 1, 1]
_IDCG_MICRO = sum(g * w for g, w in zip(_NDCG_IDEAL, _DCG_W))
_DCG_W_SQL = "[" + ", ".join(str(w) for w in _DCG_W) + "]"


@query(
    "ndcg_eval_retrieval",
    oracle=f"""
    WITH {_EVAL_CTES},
    graded AS (
      SELECT i.query_id, i.rn AS pos,
             CASE WHEN e.rn <= 3 THEN 3
                  WHEN e.rn IS NOT NULL THEN 1
                  ELSE 0 END AS rel
      FROM ivf i LEFT JOIN exact e
        ON e.query_id = i.query_id AND e.vec_id = i.vec_id
    )
    SELECT query_id,
           CAST(sum(rel * ({_DCG_W_SQL})[pos]) AS BIGINT) AS dcg_micro,
           round(sum(rel * ({_DCG_W_SQL})[pos]) * 1.0 / {_IDCG_MICRO}, 6)
             AS ndcg_at_10
    FROM graded
    GROUP BY query_id
    ORDER BY query_id
    """,
    description=(
        "nDCG@10 of the IVF ranking against graded relevance derived "
        "from the exact cosine ground truth (top-3 -> grade 3, top-10 -> "
        "grade 1) — integer micro-weight DCG, engine-exact"
    ),
)
def ndcg_eval_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-discounted retrieval eval (the metric ann_eval_metrics'
    flat recall/MRR can't see: WHERE in the list the good hits sit).

    Same composition shape as ann_eval_metrics — exact ground truth over
    the query sample joined to the index's candidate list — so the whole
    thing stays a few-row join at any corpus size: both inputs are
    |queries| x k rows regardless of corpus scale.  The log2 discount
    table is k integers embedded as literals (no float transcendentals
    at query time in either engine).
    """
    rank_w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    exact = ann_cosine_topk(spark, sf_dir).withColumn("rn", F.row_number().over(rank_w))
    ivf = ann_ivf_topk(spark, sf_dir).withColumn("pos", F.row_number().over(rank_w))
    graded = (
        ivf.select("query_id", "vec_id", "pos")
        .join(
            exact.select("query_id", "vec_id", F.col("rn").alias("exact_rn")),
            ["query_id", "vec_id"],
            "left",
        )
        .select(
            "query_id",
            "pos",
            F.when(F.col("exact_rn") <= 3, 3)
            .when(F.col("exact_rn").isNotNull(), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    w = F.element_at(F.array(*[F.lit(x) for x in _DCG_W]), F.col("pos"))
    return (
        graded.groupBy("query_id")
        .agg(F.sum(F.col("rel") * w).cast("bigint").alias("dcg_micro"))
        .select(
            "query_id",
            "dcg_micro",
            F.round(F.col("dcg_micro") * 1.0 / _IDCG_MICRO, 6).alias("ndcg_at_10"),
        )
        .orderBy("query_id")
    )


@query(
    "hard_negative_mining",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS gold, e AS qe FROM v WHERE vec_id < 5),
    scored AS (
      SELECT query_id, vec_id, label,
             round(list_inner_product(qe, e)
                   / (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(e, e))),
                   6) AS cosine
      FROM q CROSS JOIN v
      WHERE label <> gold
    )
    SELECT query_id, CAST(rn AS INTEGER) AS rank, vec_id, label, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= 8
    ORDER BY query_id, rank
    """,
    description=(
        "Hard-negative mining for retrieval training: per query, the "
        "top-k most similar WRONG-class vectors (broadcast queries, "
        "corpus unshuffled — the contrastive-pair generation pass)"
    ),
    bench=True,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training data (DPR / SimCSE style, public recipes):
    the negatives that matter are the near-misses — semantically close
    vectors with a DIFFERENT label. Same plan shape as
    ``ann_cosine_topk``: queries broadcast against the unshuffled
    corpus, label-mismatch as a pre-ranking filter, per-query top-k via
    window — O(|queries| x corpus) map-side work, zero corpus shuffle."""
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "label", F.expr(_to_double("embedding")).alias("e"))
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("gold"),
        F.col("e").alias("qe"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("gold"))
        .select(
            "query_id", "vec_id", "label",
            F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 8)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "vec_id", "label", "cosine")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss projection + distortion audit
# ---------------------------------------------------------------------------

_JL_OUT = 16  # 64 -> 16 dims


def _jl_signs() -> list[list[int]]:
    """±1 Achlioptas-style projection rows, md5-derived (deterministic,
    identical literals in both engines — same recipe as the LSH planes)."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"jl{j}-{i}".encode()).hexdigest()[:8], 16) % 2) * 2 - 1
            for i in range(1, _DIMS + 1)
        ]
        for j in range(_JL_OUT)
    ]


_JLSIGNS = _jl_signs()


def _jl_duck_proj() -> str:
    rows = ", ".join(
        "round(list_inner_product(e, "
        + "[" + ", ".join(f"{s}.0" for s in row) + "]::DOUBLE[]"
        + f") / sqrt({_JL_OUT}), 6)"
        for row in _JLSIGNS
    )
    return f"[{rows}]"


@query(
    "jl_projection_distortion",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    p AS (SELECT vec_id, {_jl_duck_proj()} AS pe FROM v),
    pairs AS (  -- audit pairs: each vector vs the next 3 ids (bounded)
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             sqrt(list_aggregate(list_transform(list_zip(a.e, b.e),
                    t -> (t[1] - t[2]) * (t[1] - t[2])), 'sum')) AS d_orig,
             sqrt(list_aggregate(list_transform(list_zip(a.pe, b.pe),
                    t -> (t[1] - t[2]) * (t[1] - t[2])), 'sum')) AS d_proj
      FROM (SELECT * FROM v JOIN p USING (vec_id)) a
      JOIN (SELECT * FROM v JOIN p USING (vec_id)) b
        ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 3
      WHERE a.vec_id < 100
    )
    SELECT vec_a, vec_b,
           round(d_orig, 6) AS d_orig,
           round(d_proj, 6) AS d_proj,
           round(d_proj / d_orig, 6) AS distortion
    FROM pairs WHERE d_orig > 0
    ORDER BY vec_a, vec_b
    """,
    description=(
        "Johnson–Lindenstrauss 64→16 random projection (±1 md5-derived "
        "matrix, map-only) with a bounded pairwise distance-distortion "
        "audit — the dimensionality-reduction step that makes downstream "
        "ANN 4x cheaper"
    ),
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL lemma (public): a random ±1/sqrt(k) projection preserves
    pairwise distances to (1±ε). The projection itself is ONE map-only
    expression per vector (16 dot products against literal rows — no
    shuffle, no training); the audit joins each vector to a bounded id
    window (≤3 neighbours, first 100 ids) so the check costs O(1) per
    vector, not pairs². Distortion ≈ 1 is what licenses running ANN on
    the 16-dim column at a quarter of the bandwidth."""
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))

    def row_lit(row) -> str:
        return "array(" + ", ".join(f"cast({s} as double)" for s in row) + ")"

    proj = "array(" + ", ".join(
        f"round({_DOT.format(a='e', b=row_lit(row))} / sqrt({_JL_OUT}), 6)"
        for row in _JLSIGNS
    ) + ")"
    p = v.select("vec_id", "e", F.expr(proj).alias("pe"))
    a = p.select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"), F.col("pe").alias("pa")
    )
    b = p.select(
        F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"), F.col("pe").alias("pb")
    )
    sq = (
        "sqrt(aggregate(zip_with({x}, {y}, (p, q) -> (p - q) * (p - q)),"
        " cast(0.0 as double), (acc, v) -> acc + v))"
    )
    d_orig = F.expr(sq.format(x="ea", y="eb"))
    d_proj = F.expr(sq.format(x="pa", y="pb"))
    return (
        a.filter(F.col("vec_a") < 100)
        .join(
            b,
            (F.col("vec_b") > F.col("vec_a")) & (F.col("vec_b") <= F.col("vec_a") + 3),
        )
        .select(
            "vec_a",
            "vec_b",
            F.round(d_orig, 6).alias("d_orig"),
            F.round(d_proj, 6).alias("d_proj"),
            F.round(d_proj / d_orig, 6).alias("distortion"),
        )
        .filter(F.col("d_orig") > 0)
        .orderBy("vec_a", "vec_b")
    )


@query(
    "ann_jl_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    p AS (SELECT vec_id, e, {_jl_duck_proj()} AS pe FROM v),
    q AS (SELECT vec_id AS query_id, e AS qe, pe AS qpe FROM p WHERE vec_id < 5),
    coarse AS (  -- shortlist 50 by projected cosine (16-dim: 4x cheaper)
      SELECT query_id, vec_id, qe, e FROM (
        SELECT q.query_id, p.vec_id, q.qe, p.e,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_inner_product(qpe, pe)
                       / (sqrt(list_inner_product(qpe, qpe))
                          * sqrt(list_inner_product(pe, pe))), 6) DESC,
                 p.vec_id) AS rn
        FROM q CROSS JOIN p
        WHERE p.vec_id <> q.query_id)
      WHERE rn <= 50
    )
    SELECT query_id, vec_id,
           round(list_inner_product(qe, e)
                 / (sqrt(list_inner_product(qe, qe))
                    * sqrt(list_inner_product(e, e))), 6) AS cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY
            round(list_inner_product(qe, e)
                  / (sqrt(list_inner_product(qe, qe))
                     * sqrt(list_inner_product(e, e))), 6) DESC, vec_id) AS rn2
          FROM coarse)
    WHERE rn2 <= 10
    ORDER BY query_id, cosine DESC, vec_id
    """,
    description=(
        "Coarse-to-fine ANN: shortlist in the 16-dim JL space (4x "
        "cheaper dot products, corpus unshuffled), exact re-rank of the "
        "top-50 in full dimension"
    ),
)
def ann_jl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard two-stage retrieval: score EVERY vector cheaply in
    the projected space, then re-rank only the shortlist exactly. Same
    no-corpus-shuffle contract as ``ann_cosine_topk``; the win at scale
    is bandwidth — the coarse pass streams 16 doubles/vector instead of
    64 (store ``pe`` as its own column and the scan reads a quarter of
    the bytes)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))

    def row_lit(row) -> str:
        return "array(" + ", ".join(f"cast({s} as double)" for s in row) + ")"

    proj = "array(" + ", ".join(
        f"round({_DOT.format(a='e', b=row_lit(row))} / sqrt({_JL_OUT}), 6)"
        for row in _JLSIGNS
    ) + ")"
    p = v.select("vec_id", "e", F.expr(proj).alias("pe")).cache()
    q = p.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("pe").alias("qpe"),
    )
    coarse = (
        p.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", "qe", "e",
            F.round(F.expr(_cosine_expr("qpe", "pe")), 6).alias("pcos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("pcos"), F.asc("vec_id"))
            ),
        )
        .filter(F.col("rn") <= 50)
    )
    exact = coarse.select(
        "query_id", "vec_id",
        F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("cosine"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        exact.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= 10)
        .select("query_id", "vec_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )


# ---------------------------------------------------------------------------
# trained-artifact export — the train-once/search-many production split
# ---------------------------------------------------------------------------


def train_ann_artifacts(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Run every deterministic ANN training the queries perform inline and
    return the artifacts: the exact DataFrames whose frozen parquet copies
    (tools/make_ann_goldens.py → operators/ann_artifacts/<sf-tag>/) the
    DuckDB oracles in _ann_oracles.py recompute the full search from.
    Reuses the queries' own trainers and glue (kmeans_codebook,
    pq_codebooks, _ivfpq_residuals, _opq_train_rotation/_opq_apply) so the
    artifacts can never drift from what a query would train inline —
    tests/test_ann_artifacts.py enforces that equivalence."""
    (emb,) = load(spark, sf_dir, "embeddings")
    raw = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e")).cache()
    nv = _unit_vectors(emb).cache()
    ivf_cent = kmeans_codebook(raw)
    pq = pq_codebooks(nv)
    coarse = kmeans_codebook(nv)
    resid = _ivfpq_residuals(nv, coarse)
    ivfpq_pq = pq_codebooks(resid.select("vec_id", "e"))
    r = _opq_train_rotation(nv)
    opq_pq = pq_codebooks(_opq_apply(nv, r))
    rot = spark.createDataFrame(
        [(i, [float(x) for x in r[i]]) for i in range(r.shape[0])],
        "i int, r array<double>",
    )
    return {
        "ivf_centroids": ivf_cent,   # (cid, c) — ann_ivf_kmeans_topk
        "pq_codebooks": pq,          # (m, cid, c) — ann_pq_topk
        "ivfpq_coarse": coarse,      # (cid, c) — ann_ivfpq_topk coarse lists
        "ivfpq_pq": ivfpq_pq,        # (m, cid, c) — residual codebooks
        "opq_rotation": rot,         # (i, r) — row i of the 64×64 R
        "opq_pq": opq_pq,            # (m, cid, c) — rotated-space codebooks
    }


# ---------------------------------------------------------------------------
# Contrastive triplet mining — anchor / positive / hard negative + margin
# ---------------------------------------------------------------------------

_TRIP_NEGS = 2


@query(
    "contrastive_triplets",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS gold, e AS qe FROM v WHERE vec_id < 5),
    scored AS (
      SELECT query_id, gold, vec_id, label,
             round(list_inner_product(qe, e)
                   / (sqrt(list_inner_product(qe, qe))
                      * sqrt(list_inner_product(e, e))), 6) AS cosine
      FROM q CROSS JOIN v
      WHERE vec_id <> query_id
    ),
    pos AS (
      SELECT query_id, vec_id AS pos_id, cosine AS pos_cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS rn
        FROM scored WHERE label = gold
      ) WHERE rn = 1
    ),
    neg AS (
      SELECT query_id, CAST(rn AS INT) AS neg_rank,
             vec_id AS neg_id, cosine AS neg_cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS rn
        FROM scored WHERE label <> gold
      ) WHERE rn <= {_TRIP_NEGS}
    )
    SELECT p.query_id, p.pos_id, p.pos_cosine,
           n.neg_rank, n.neg_id, n.neg_cosine,
           round(p.pos_cosine - n.neg_cosine, 6) AS margin
    FROM pos p JOIN neg n USING (query_id)
    ORDER BY query_id, neg_rank
    """,
    description=(
        "Contrastive triplet mining: per anchor, the nearest same-label "
        "positive and the top hard wrong-label negatives with cosine "
        "margins — the embedding-training pair generator"
    ),
)
def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, hard negative, margin) rows ready for a
    triplet/InfoNCE loss — hard_negative_mining's output completed with
    the positive side and the actual margin the loss would see (small
    or negative margins are the pairs worth training on).

    Same scale shape as the rest of the eval family: anchors broadcast,
    corpus scanned once and never shuffled; the per-anchor argmax rows
    ride the same window."""
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "label", F.expr(_to_double("embedding")).alias("e"))
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("gold"),
        F.col("e").alias("qe"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "gold",
            "vec_id",
            "label",
            F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    pos = (
        scored.where(F.col("label") == F.col("gold"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", F.col("vec_id").alias("pos_id"),
                F.col("cosine").alias("pos_cosine"))
    )
    neg = (
        scored.where(F.col("label") != F.col("gold"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TRIP_NEGS)
        .select("query_id", F.col("rn").cast("int").alias("neg_rank"),
                F.col("vec_id").alias("neg_id"),
                F.col("cosine").alias("neg_cosine"))
    )
    return (
        pos.join(neg, "query_id")
        .select(
            "query_id", "pos_id", "pos_cosine", "neg_rank", "neg_id",
            "neg_cosine",
            F.round(F.col("pos_cosine") - F.col("neg_cosine"), 6).alias("margin"),
        )
        .orderBy("query_id", "neg_rank")
    )
