"""SemDeDup-style semantic deduplication over the embedding corpus.

Semantic dedup (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023 — public arXiv paper)
removes documents that are *semantically* redundant even when their text
differs: embed, cluster, and prune near-identical vectors **within each
cluster** so the pairwise work is O(Σ cluster_size²), never corpus².

Reference framing: the reference stack (FireMonkey69/kafka-stream) exposes
its data through streaming SQL (README.md:41-43); this operator extends
that query surface with the curation op an LLM-data pipeline needs.

Spark-first design, 100 TB shape:

- The coarse quantizer is the per-label centroid table (k × 64 doubles),
  the same geometry ``ann_ivf_topk`` uses — tiny, **broadcast**; the
  corpus is never shuffled for assignment (map-only cross join against
  the broadcast centroids + one per-vector window).
- Within-cluster pairing shuffles on ``cid`` only; each task's work is
  bounded by its cluster's size². At 100 TB you grow k with the corpus
  (SemDeDup's own scale story: k ≈ N / target_cluster_size), keeping the
  per-task quadratic term constant; skewed clusters are handled by AQE
  skew-join splitting on the self-join.
- The keep rule is **lowest-vec_id wins**: vector b is dropped iff some
  a < b in the same cluster has round(cos(a, b), 6) ≥ τ. Unlike greedy
  scan-order pruning this is order-independent (a set predicate), so the
  result is deterministic under any partitioning — and expressible in
  one SQL statement, which is what makes the DuckDB oracle exact.

Determinism across engines: assignment ranks clusters by cosine rounded
to 6dp (tie-break cid), the dup threshold compares a 6dp-rounded cosine —
the same round-before-compare recipe every oracle-green ANN query here
uses, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.similarity import _to_double
from kafka_stream_spark.registry import query

#: within-cluster cosine at or above this is a semantic duplicate
_TAU = 0.30

_DUCK_COS = (
    "list_inner_product({a}, {b}) / (sqrt(list_inner_product({a}, {a}))"
    " * sqrt(list_inner_product({b}, {b})))"
)

def _dropped_in_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Within ONE group (a cluster, or an LSH band bucket): blocked Gram
    matmul over unit vectors `u`; emit the HIGHER vec_id of every pair
    whose rounded dot clears τ (lowest-id-wins keep rule). Row-blocking
    bounds task memory at BLOCK x n no matter how skewed the group."""
    order = pdf["vec_id"].to_numpy().argsort()
    ids = pdf["vec_id"].to_numpy()[order]
    u = np.stack(pdf["u"].to_numpy()[order])  # (n, dims)
    n = len(ids)
    block = 1024
    out: list[np.ndarray] = []
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        g = np.round(u[lo:hi] @ u.T, 6)  # (block, n)
        rows, cols = np.nonzero(g >= _TAU)
        # keep only upper-triangle hits: global row index < col index
        mask = (rows + lo) < cols
        out.append(cols[mask])
    dropped = np.unique(np.concatenate(out)) if out else np.array([], dtype=int)
    return pd.DataFrame({"vec_id": ids[dropped.astype(int)]})


_SEMDEDUP_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
expl AS (
  SELECT label, i, e[i] AS x
  FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings)
  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
),
cent AS (  -- per-label centroid: the broadcastable coarse quantizer
  SELECT label AS cid, array_agg(cx ORDER BY i) AS c
  FROM (SELECT label, i, avg(x) AS cx FROM expl GROUP BY label, i)
  GROUP BY label
),
vu AS (  -- unit-normalize ONCE (the same normalize-then-dot path the
         -- engine's Arrow assignment computes)
  SELECT vec_id,
         list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS u
  FROM v
),
cu AS (
  SELECT cid,
         list_transform(c, x -> x / sqrt(list_inner_product(c, c))) AS cn
  FROM cent
),
assigned AS (  -- nearest centroid by rounded unit cosine, tie-break cid
  SELECT vec_id, u, cid, ccos FROM (
    SELECT vec_id, u, cid,
           round(list_inner_product(u, cn), 6) AS ccos,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             round(list_inner_product(u, cn), 6) DESC, cid) AS rn
    FROM vu CROSS JOIN cu) WHERE rn = 1
),
normed AS (SELECT vec_id, cid, u FROM assigned),
dropped AS (  -- b loses to any lower-id near-duplicate in its cluster
  SELECT DISTINCT b.vec_id
  FROM normed a JOIN normed b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round(list_inner_product(a.u, b.u), 6) >= {_TAU}
)
SELECT CAST(s.vec_id AS BIGINT) AS vec_id,
       CAST(s.cid AS INTEGER) AS cid,
       s.ccos AS centroid_cosine
FROM assigned s ANTI JOIN dropped d ON s.vec_id = d.vec_id
ORDER BY s.vec_id
"""


@query(
    "semdedup_embeddings",
    oracle=_SEMDEDUP_ORACLE,
    description=(
        "SemDeDup semantic dedup: broadcast-centroid cluster assignment, "
        "within-cluster cosine pruning (lowest-id wins), pairwise work "
        "bounded by cluster size — never corpus-quadratic"
    ),
    bench=True,
)
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "label", F.expr(_to_double("embedding")).alias("e"))

    # coarse quantizer: per-label mean vector (k x 64 doubles -> collect).
    # posexplode -> (label, pos) avg -> re-assemble: the one-groupBy
    # 64-avg-buffer formulation falls off Spark 4.1's codegen fast path
    # (the r7 wide-aggregate cliff measured on ann_ivf_topk/dedup_simhash)
    # — the row blowup is 64x
    # |corpus| NARROW rows into a partial-aggregating shuffle of k x 64
    # partials, cheaper than interpreted-mode 64-buffer updates.
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
        .select(F.col("label").alias("cid"), "c")
    )

    # Assignment is MAP-ONLY: the k centroids (k x 64 doubles, bounded —
    # the same driver-side footprint kmeans_codebook already accepts)
    # are collected once; the corpus is never shuffled, cross-joined, or
    # window-ranked to be assigned — the property that matters at 100 TB.
    cent_rows = sorted(cent.collect(), key=lambda r: r["cid"])
    cids_sorted = np.array([int(r["cid"]) for r in cent_rows], dtype=np.int64)
    cmat = np.array([[float(x) for x in r["c"]] for r in cent_rows])  # (k, 64)
    cunit = cmat / np.sqrt((cmat * cmat).sum(axis=1))[:, None]

    # Assignment + unit-normalize in ONE Arrow pass: an (n x 64)@(64 x k)
    # matmul per batch; argmax over 6dp-rounded cosines with min-cid
    # tie-break (np.argmax returns the FIRST max and cids are sorted
    # ascending). Same round-before-compare determinism as the previous
    # expression formulation, without its O(k x 64) codegen cost.
    def _assign_gen(batches):
        for pdf in batches:
            x = np.stack(pdf["e"].to_numpy())  # (n, 64)
            u = x / np.sqrt((x * x).sum(axis=1))[:, None]
            ccos = np.round(u @ cunit.T, 6)  # (n, k)
            best = ccos.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "u": list(u),
                    "cid": cids_sorted[best],
                    "ccos": ccos[np.arange(len(best)), best],
                }
            )

    # both the pair stage and the kept-output anti-join consume this;
    # cache() materializes the scan+assignment once. At scale this is
    # the corpus x (id, unit vec, cid) — the working set any IVF index
    # stores.
    assigned = v.mapInPandas(
        _assign_gen, "vec_id long, u array<double>, cid int, ccos double"
    ).cache()
    normed = assigned.select("vec_id", "cid", "u")

    # Pair stage: per-cluster BLOCKED Gram matmul via applyInPandas.
    # The within-cluster all-pairs dot is pure dense linear algebra; a
    # Catalyst higher-order-function formulation pays per-element lambda
    # cost (~3x slower measured at sf0.1), while one BLAS matmul per
    # cluster is near-memory-bandwidth. Row-blocking bounds memory at
    # BLOCK x n per task no matter how large a skewed cluster gets; only
    # the dropped ids (a shrinking set) leave the task.
    dropped = normed.groupBy("cid").applyInPandas(
        _dropped_in_group, "vec_id long"
    ).distinct()

    return (
        assigned.join(dropped, "vec_id", "left_anti")
        .select("vec_id", "cid", F.col("ccos").alias("centroid_cosine"))
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# the 100 TB path: banded-LSH semantic dedup (never cluster-quadratic)
# ---------------------------------------------------------------------------


def _lsh_semdedup_oracle() -> str:
    """Mirror of ``embedding_lsh_banded``'s signature SQL + the
    lowest-id-wins keep rule."""
    from kafka_stream_spark.operators.similarity import _BSIGNS, _B_PLANES, _B_BANDS, _B_BITS

    sig_sum = " + ".join(
        "(CASE WHEN round(list_inner_product(e, "
        + "[" + ", ".join(f"{s}.0" for s in _BSIGNS[j]) + "]::DOUBLE[]"
        + f"), 9) > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(_B_PLANES)
    )
    mask = (1 << _B_BITS) - 1
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sig AS (SELECT vec_id, e, {sig_sum} AS s FROM v),
    bands AS (
      SELECT vec_id, b.band, (s >> (b.band * {_B_BITS})) & {mask} AS bval
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {_B_BANDS - 1})) AS band) b
    ),
    normed AS (
      SELECT vec_id,
             list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS u
      FROM v
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
    ),
    dropped AS (  -- verify on unit vectors (same normalize-then-dot path
                  -- the engine's per-bucket matmul computes)
      SELECT DISTINCT c.vec_b AS vec_id
      FROM cand c JOIN normed x ON x.vec_id = c.vec_a
                  JOIN normed y ON y.vec_id = c.vec_b
      WHERE round(list_inner_product(x.u, y.u), 6) >= {_TAU}
    )
    SELECT CAST(s.vec_id AS BIGINT) AS vec_id, CAST(s.s AS BIGINT) AS lsh_sig
    FROM sig s ANTI JOIN dropped d ON s.vec_id = d.vec_id
    ORDER BY s.vec_id
    """


@query(
    "semdedup_lsh",
    oracle=_lsh_semdedup_oracle(),
    description=(
        "Semantic dedup, 100 TB path: banded hyperplane-LSH candidates "
        "(equi-join on band buckets, NEVER cluster- or corpus-quadratic), "
        "exact cosine verify, lowest-id-wins keep"
    ),
    bench=True,
)
def semdedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The companion to ``semdedup_embeddings`` for when clusters can't
    be kept small: candidate pairs come from band-bucket collisions
    (collision mass is bounded by bucket occupancy, tunable via
    bands×bits), each candidate is verified with one exact cosine, and
    b drops iff a verified near-dup with a lower id exists. Work is
    O(corpus) for signatures + O(collisions) for verification — the
    linear-ish envelope ``streaming/semantic_dedup.py`` runs online.
    Same 24-plane/4-band md5-derived hyperplane family as
    ``embedding_lsh_banded``, so all three surfaces agree on "close"."""
    from kafka_stream_spark.operators.similarity import (
        _BSIGNS,
        _B_PLANES,
        _B_BANDS,
        _B_BITS,
    )

    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))

    # Signature + unit-normalize in ONE Arrow pass: a (n x 64) @ (64 x 24)
    # matmul per batch replaces a 24-higher-order-function expression
    # whose codegen alone costs ~2s — the same JVM-vs-BLAS tradeoff the
    # pair stage makes, with the same round-before-compare determinism
    # (round(dot, 9) > 0, matching the oracle's sign rule).
    planes = np.array(_BSIGNS, dtype=np.float64)  # (24, 64)

    def _sig_gen(batches):
        for pdf in batches:
            x = np.stack(pdf["e"].to_numpy())  # (n, 64)
            u = x / np.sqrt((x * x).sum(axis=1))[:, None]
            bits_ = (np.round(x @ planes.T, 9) > 0).astype(np.int64)
            s = (bits_ << np.arange(_B_PLANES, dtype=np.int64)).sum(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "u": list(u), "s": s}
            )

    sig = v.mapInPandas(
        _sig_gen, "vec_id long, u array<double>, s long"
    ).cache()
    mask = (1 << _B_BITS) - 1
    bands = sig.select(
        "vec_id",
        "u",
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
    ).select("vec_id", "u", "bb.band", "bb.bval")
    # Candidate generation AND verification fused: one blocked Gram
    # matmul per (band, bucket) group emits verified higher-id drops
    # directly — no 100k-row candidate materialization, no per-pair
    # higher-order-function cosine (measured 3.5s -> ~0.3s at sf0.1).
    # A pair sharing several bands is dropped by each; distinct() after.
    dropped = (
        bands.groupBy("band", "bval")
        .applyInPandas(_dropped_in_group, "vec_id long")
        .distinct()
    )
    return (
        sig.join(dropped, "vec_id", "left_anti")
        .select("vec_id", F.col("s").cast("bigint").alias("lsh_sig"))
        .orderBy("vec_id")
    )
