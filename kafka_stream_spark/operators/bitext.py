"""Margin-based bitext mining over the embeddings table.

The parallel-corpus mining shape from Artetxe & Schwenk 2019
("Margin-based Parallel Corpus Mining with Multilingual Sentence
Embeddings" — public) used by LASER/CCMatrix to pair sentences across
languages: raw cosine is miscalibrated across hubness regions, so each
candidate pair (x, y) is scored by its cosine RATIO to the mean cosine
of each side's k nearest neighbours:

    margin(x, y) = cos(x, y) / ((avg_kNN(x, Y) + avg_kNN(y, X)) / 2)

and x keeps its best-margin y when the margin clears a threshold.

Here label 0 plays the source-language pool and label 1 the target
pool (the synthetic embeddings table has no language column; labels
are its cluster structure, which is exactly the hubness structure the
margin exists to correct).

Scale shape (the DEFAULT): candidate pairs come from the banded
hyperplane-LSH family (`similarity.banded_sig_spark`, 4 bands x 6
bits) — an EQUI-join on band values, collision-bounded, never
|X|x|Y| — and the kNN statistics in the margin denominator are
computed over the same candidate set. That mirrors the paper's own
practice: LASER/CCMatrix compute the denominator from approximate-kNN
(FAISS) neighbours, not exact ones. ``exact=True`` restores the
all-pairs baseline (crossJoin) for recall audits; at sf0.01 the banded
default keeps 39 of the 43 exact mined pairs. The margin
normalization, both windowed kNN sums, and the best-match selection
are identical in both modes. Determinism: cosines round to 6dp then
convert to exact integer micro-units, so both kNN sums are integer
arithmetic and the final margin is one double division of identical
integers in both engines.

Reference anchor: the reference curates multilingual text feeds
(reddit bodies, ``sample-data/reddit.value.json:75-78``) — pairing
them across languages is a corpus-level operator its Lenses/Connect
layer has no answer for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.similarity import (
    _BANDS_DUCK,
    _cosine_expr,
    _to_double,
    banded_bands,
    banded_sig_duck,
    banded_sig_spark,
)
from kafka_stream_spark.registry import query

_K = 4  # neighbours per side in the margin denominator
_THRESHOLD = 1.05

# margin pipeline over a (src_id, tgt_id, cos_u) pair set — shared by the
# banded default and the exact baseline; DuckDB twin below.
_MARGIN_SQL = f"""
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY cos_u DESC, tgt_id) AS rx,
             row_number() OVER (PARTITION BY tgt_id
                                ORDER BY cos_u DESC, src_id) AS ry
      FROM p
    ),
    s AS (
      SELECT *,
             sum(CASE WHEN rx <= {_K} THEN cos_u ELSE 0 END)
               OVER (PARTITION BY src_id) AS sx,
             sum(CASE WHEN ry <= {_K} THEN cos_u ELSE 0 END)
               OVER (PARTITION BY tgt_id) AS sy
      FROM r
    ),
    m AS (
      SELECT src_id, tgt_id, cos_u,
             round(cos_u * {2 * _K}.0 / (sx + sy), 6) AS margin
      FROM s WHERE cos_u > 0 AND sx + sy > 0
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY src_id
                                   ORDER BY margin DESC, tgt_id) AS rn
      FROM m
    )
    SELECT CAST(src_id AS BIGINT) AS src_id,
           CAST(tgt_id AS BIGINT) AS tgt_id,
           round(cos_u / 1000000.0, 6) AS cosine,
           margin
    FROM best WHERE rn = 1 AND margin >= {_THRESHOLD}
    ORDER BY src_id
"""


@query(
    "bitext_margin_mining",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    pool AS (SELECT vec_id, label, e FROM v WHERE label IN (0, 1)),
    sig AS (SELECT vec_id, label, {banded_sig_duck()} AS s
            FROM pool),
    lbands AS (SELECT vec_id, label, band, bval FROM ({_BANDS_DUCK.replace("SELECT vec_id,", "SELECT vec_id, label,")})),
    cand AS (
      SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS tgt_id
      FROM lbands a JOIN lbands b ON a.band = b.band AND a.bval = b.bval
      WHERE a.label = 0 AND b.label = 1
    ),
    p AS (
      SELECT src_id, tgt_id,
             CAST(round(round(list_inner_product(x.e, y.e)
                   / (sqrt(list_inner_product(x.e, x.e))
                      * sqrt(list_inner_product(y.e, y.e))), 6)
                   * 1000000, 0) AS BIGINT) AS cos_u
      FROM cand JOIN v x ON x.vec_id = src_id JOIN v y ON y.vec_id = tgt_id
    ),
    {_MARGIN_SQL}
    """,
    description=(
        "Artetxe-Schwenk margin-based bitext mining between the label-0 "
        "and label-1 embedding pools: banded hyperplane-LSH candidate "
        "pairs (equi-join on band values — the paper's approximate-kNN "
        "practice), ratio margin over both sides' top-4 candidate-"
        "neighbour means (integer micro-unit kNN sums), best-match-per-"
        "source above a 1.05 margin"
    ),
    bench=True,
)
def bitext_margin_mining(
    spark: SparkSession, sf_dir: str, exact: bool = False
) -> DataFrame:
    """Default plan: banded-LSH candidate generation (one equi-join on
    (band, bval) — hash join, collision-bounded) followed by three
    shuffles of the CANDIDATE pair set, never more: one per windowed kNN
    direction (partition by src / by tgt) and one for the final per-src
    best-match rank. No BroadcastNestedLoopJoin/crossJoin over two
    corpus-sized sides (plan-asserted in tests/test_plan_regressions.py).
    ``exact=True`` restores the all-pairs baseline pair stage.
    """
    (emb,) = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "label", F.expr(_to_double("embedding")).alias("e"))
    return mine_bitext(v, exact=exact)


def mine_bitext(v: DataFrame, exact: bool = False) -> DataFrame:
    """Margin mining over any (vec_id, label, e) frame: label 0 = source
    pool, label 1 = target pool. Core shared by the registered query and
    the planted-pair recall tests."""
    x = v.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("src_id"), F.col("e").alias("xe")
    )
    y = v.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("e").alias("ye")
    )
    cos_u = (
        F.round(F.round(F.expr(_cosine_expr("xe", "ye")), 6) * 1_000_000, 0)
        .cast("bigint")
        .alias("cos_u")
    )
    if exact:
        p = x.crossJoin(F.broadcast(y)).select("src_id", "tgt_id", cos_u)
    else:
        pool = v.filter(F.col("label").isin(0, 1)).cache()
        sig = pool.select(
            "vec_id", "label", F.expr(banded_sig_spark()).alias("s")
        )
        # cache: the src/tgt band join consumes bands on BOTH sides
        # (broadcast build + streamed scan — different node types, no
        # reuse), so the 24-plane signature expression would evaluate
        # twice over the pool (r8, same fix as dedup._mh_band_candidates)
        bands = banded_bands(sig, "vec_id", "label").cache()
        cand = (
            bands.filter(F.col("label") == 0)
            .alias("a")
            .join(
                bands.filter(F.col("label") == 1).alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bval") == F.col("b.bval")),
            )
            .select(
                F.col("a.vec_id").alias("src_id"), F.col("b.vec_id").alias("tgt_id")
            )
            .distinct()
        )
        p = cand.join(x, ["src_id"]).join(y, ["tgt_id"]).select(
            "src_id", "tgt_id", cos_u
        )
    # Window evaluation order groups SAME-KEY windows together (guide
    # §2.4: consecutive windows over one partitioning share its exchange
    # and sort): rx+sx both run under the src_id partitioning, then
    # ry+sy under tgt_id, then the best-match rank re-enters src_id. The
    # round-6 formulation alternated src/tgt/src/tgt/src and paid five
    # exchanges of the candidate pair set; this one pays three for
    # bit-identical results (sx depends only on rx, sy only on ry).
    wx = Window.partitionBy("src_id").orderBy(F.desc("cos_u"), F.asc("tgt_id"))
    wy = Window.partitionBy("tgt_id").orderBy(F.desc("cos_u"), F.asc("src_id"))
    top = lambda rank_col: F.when(F.col(rank_col) <= _K, F.col("cos_u")).otherwise(
        F.lit(0)
    )
    r = p.withColumn("rx", F.row_number().over(wx)).withColumn(
        "sx", F.sum(top("rx")).over(Window.partitionBy("src_id"))
    )
    s = r.withColumn("ry", F.row_number().over(wy)).withColumn(
        "sy", F.sum(top("ry")).over(Window.partitionBy("tgt_id"))
    )
    m = s.filter((F.col("cos_u") > 0) & (F.col("sx") + F.col("sy") > 0)).select(
        "src_id",
        "tgt_id",
        "cos_u",
        F.round(
            F.col("cos_u") * float(2 * _K) / (F.col("sx") + F.col("sy")), 6
        ).alias("margin"),
    )
    wbest = Window.partitionBy("src_id").orderBy(F.desc("margin"), F.asc("tgt_id"))
    return (
        m.withColumn("rn", F.row_number().over(wbest))
        .filter((F.col("rn") == 1) & (F.col("margin") >= _THRESHOLD))
        .select(
            F.col("src_id").cast("bigint").alias("src_id"),
            F.col("tgt_id").cast("bigint").alias("tgt_id"),
            F.round(F.col("cos_u") / 1_000_000.0, 6).alias("cosine"),
            "margin",
        )
        .orderBy("src_id")
    )
