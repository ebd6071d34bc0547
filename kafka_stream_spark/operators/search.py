"""Full-text relevance scoring over the documents table (north-star text
analysis family — the retrieval-side complement of `tfidf_top_terms`).

`bm25_search_documents` ranks the corpus for a fixed query-term set with
Okapi BM25 (k1=1.2, b=0.75): classic tf saturation + document-length
normalization, idf in the non-negative Lucene form
``ln(1 + (N - df + 0.5)/(df + 0.5))``.

Everything is computed distributed: tf is a map-side-combinable
groupBy(doc, term) restricted to query terms BEFORE the shuffle (the
exchange carries ≤ |docs|×|query terms| rows, not the corpus token
stream); df and avgdl/N are tiny aggregates broadcast back; the final
per-doc sum is one more map-side-combinable groupBy. Round-before-rank
(house rule) keeps the top-k stable across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_QUERY_TERMS = ["spark", "window", "join"]
_K1 = 1.2
_B = 0.75
_TOPK = 20

_TERMS_SQL = ", ".join(f"'{t}'" for t in _QUERY_TERMS)


@query(
    "bm25_search_documents",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (
      SELECT avg(dl) AS avgdl, count(*) AS n FROM dl
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      ) WHERE term IN ({_TERMS_SQL})
      GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    contrib AS (
      SELECT tf.doc_id,
             ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({_K1} + 1)
               / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl)) AS w
      FROM tf JOIN df USING (term)
              JOIN dl USING (doc_id)
              CROSS JOIN stats s
    ),
    scored AS (
      SELECT doc_id, round(sum(w), 6) AS score FROM contrib GROUP BY doc_id
    )
    SELECT rank, doc_id, score FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {_TOPK}
    ORDER BY rank
    """,
    description=(
        "Okapi BM25 top-20 for query terms ['spark','window','join'] "
        "(k1=1.2, b=0.75, Lucene-form idf), round-before-rank"
    ),
    bench=True,
)
def bm25_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-sized work is two map-side-combinable aggregates (tf
    restricted to query terms pre-shuffle; the per-doc score sum). df
    (|terms| rows) and N/avgdl (1 row) broadcast back — the corpus never
    shuffles to be scored. The final top-k is a TakeOrderedAndProject
    over |matching docs| scored rows. At 100 TB nothing here grows
    beyond |docs(matching)| except the linear token scan."""
    (documents,) = load(spark, sf_dir, "documents")
    toks = documents.select("doc_id", F.split("text", " ").alias("toks"))
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n")
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    w = (
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    # top-k FIRST via orderBy+limit → TakeOrderedAndProject (per-partition
    # top-k + driver merge of k×partitions rows); the rank window then
    # runs over k rows, never over the full scored set.
    topk = scored.orderBy(F.col("score").desc(), "doc_id").limit(_TOPK)
    rank_w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(rank_w))
        .select("rank", "doc_id", "score")
        .orderBy("rank")
    )


# Reciprocal-rank-fusion hybrid retrieval: fuse the lexical (BM25) and
# vector (cosine) rankings for the same information need. Embeddings are
# id-aligned with documents (vec_id == doc_id in the driver's testdata).
_RRF_K = 60       # standard RRF dampening constant
_RRF_DEPTH = 100  # per-leg candidate depth (top-k lists, not full rankings)
_RRF_QUERY_VEC = 0  # the query's embedding = vector of vec_id 0


@query(
    "hybrid_search_rrf",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      ) WHERE term IN ({_TERMS_SQL})
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bscored AS (
      SELECT tf.doc_id,
             round(sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * ({_K1} + 1)
                       / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl))),
                   6) AS score
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
      GROUP BY tf.doc_id
    ),
    brank AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM bscored
      ) WHERE rank <= {_RRF_DEPTH}
    ),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT e AS qe FROM v WHERE vec_id = {_RRF_QUERY_VEC}),
    cscored AS (
      SELECT vec_id AS doc_id,
             round(list_inner_product(qe, e)
                   / (sqrt(list_inner_product(qe, qe))
                      * sqrt(list_inner_product(e, e))), 6) AS cosine
      FROM v CROSS JOIN q WHERE vec_id <> {_RRF_QUERY_VEC}
    ),
    crank AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank
        FROM cscored
      ) WHERE rank <= {_RRF_DEPTH}
    ),
    fused AS (
      SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
             b.rank AS bm25_rank, c.rank AS cos_rank,
             round(coalesce(1.0 / ({_RRF_K} + b.rank), 0)
                   + coalesce(1.0 / ({_RRF_K} + c.rank), 0), 6) AS rrf_score
      FROM brank b FULL OUTER JOIN crank c ON b.doc_id = c.doc_id
    )
    SELECT doc_id, bm25_rank, cos_rank, rrf_score FROM fused
    ORDER BY rrf_score DESC, doc_id LIMIT {_TOPK}
    """,
    description=(
        "Hybrid retrieval: BM25 and embedding-cosine top-100 lists fused "
        "by reciprocal-rank fusion (k=60), top-20 overall"
    ),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of the two retrieval legs. Each leg reduces to a
    top-DEPTH list before anything joins: BM25 via the same restricted
    tf/df aggregates as bm25_search_documents, the vector leg via
    orderBy+limit (TakeOrderedAndProject — per-partition top-k, no full
    sort). The fusion join then touches 2×DEPTH rows regardless of
    corpus size; at 100 TB the cosine leg's full scan would be replaced
    by ann_ivf_kmeans_topk feeding the same (doc_id, rank) contract.
    Scores are rounded 6dp BEFORE ranking so both engines rank
    identical values (round-before-rank).
    """
    from kafka_stream_spark.operators.similarity import _cosine_expr, _to_double

    (documents, emb) = load(spark, sf_dir, "documents", "embeddings")
    toks = documents.select("doc_id", F.split("text", " ").alias("toks"))
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n"))
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    w = (
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    bscored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    btop = bscored.orderBy(F.col("score").desc(), "doc_id").limit(_RRF_DEPTH)
    brank = btop.withColumn(
        "bm25_rank",
        F.row_number().over(Window.orderBy(F.col("score").desc(), F.col("doc_id"))),
    ).select("doc_id", "bm25_rank")

    v = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))
    q = v.filter(F.col("vec_id") == _RRF_QUERY_VEC).select(F.col("e").alias("qe"))
    cscored = (
        v.filter(F.col("vec_id") != _RRF_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(F.expr(_cosine_expr("qe", "e")), 6).alias("cosine"),
        )
    )
    ctop = cscored.orderBy(F.col("cosine").desc(), "doc_id").limit(_RRF_DEPTH)
    crank = ctop.withColumn(
        "cos_rank",
        F.row_number().over(Window.orderBy(F.col("cosine").desc(), F.col("doc_id"))),
    ).select("doc_id", "cos_rank")

    rrf = F.round(
        F.coalesce(1.0 / (_RRF_K + F.col("bm25_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (_RRF_K + F.col("cos_rank")), F.lit(0.0)),
        6,
    )
    return (
        brank.join(crank, "doc_id", "full_outer")
        .select("doc_id", "bm25_rank", "cos_rank", rrf.alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(_TOPK)
    )


_KWIC_TERM = "spark"
_KWIC_WIN = 3  # tokens of context on each side
_KWIC_LIMIT = 50


@query(
    "kwic_concordance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    hit AS (
      SELECT doc_id, i AS pos,
             coalesce(array_to_string(toks[greatest(1, i - {_KWIC_WIN}):i - 1],
                                      ' '), '') AS left_ctx,
             coalesce(array_to_string(toks[i + 1:least(len(toks),
                                                       i + {_KWIC_WIN})], ' '),
                      '') AS right_ctx
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i)
      WHERE i <= len(toks) AND toks[i] = '{_KWIC_TERM}'
    )
    SELECT doc_id, pos, left_ctx, right_ctx
    FROM hit ORDER BY doc_id, pos LIMIT {_KWIC_LIMIT}
    """,
    description=(
        f"Keyword-in-context concordance for '{_KWIC_TERM}': every "
        f"occurrence with +/-{_KWIC_WIN} tokens of context, corpus order"
    ),
)
def kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-linguistics KWIC view (and the debug view behind any
    search result snippet). posexplode gives positions; contexts are
    pure slice arithmetic on the cached token arrays — no joins, no
    re-tokenization (cache barrier as usual), and the global LIMIT is a
    TakeOrdered merge. Case-sensitive exact-token match; swap in a
    normalizer upstream for folded matching.
    """
    from kafka_stream_spark.operators.sequence_stats import _doc_tokens

    toks = _doc_tokens(spark, sf_dir)
    hit = (
        toks.select("doc_id", "toks", F.posexplode("toks").alias("p0", "tok"))
        .where(F.col("tok") == _KWIC_TERM)
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("pos"),
            F.concat_ws(
                " ",
                F.expr(f"slice(toks, greatest(1, p0 + 1 - {_KWIC_WIN}), "
                       f"least({_KWIC_WIN}, p0))"),
            ).alias("left_ctx"),
            F.concat_ws(
                " ",
                F.expr(f"slice(toks, p0 + 2, "
                       f"least({_KWIC_WIN}, size(toks) - p0 - 1))"),
            ).alias("right_ctx"),
        )
    )
    return hit.orderBy("doc_id", "pos").limit(_KWIC_LIMIT)


# ---------------------------------------------------------------------------
# nDCG@20 of the BM25 ranking — term-coverage graded relevance
# ---------------------------------------------------------------------------

import math as _math

from kafka_stream_spark.registry import QUERIES as _QUERIES

_NDCG20_K = 20
_DCG_W20 = [round(1_000_000 / _math.log2(i + 1)) for i in range(1, _NDCG20_K + 1)]
_W20_SQL = "[" + ", ".join(str(w) for w in _DCG_W20) + "]"
_BM25_ORACLE = _QUERIES["bm25_search_documents"].oracle


@query(
    "bm25_ndcg_eval",
    oracle=f"""
    WITH ranked AS ({_BM25_ORACLE}),
    g AS (
      SELECT doc_id, CAST(count(DISTINCT term) AS BIGINT) AS grade FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      ) WHERE term IN ({_TERMS_SQL})
      GROUP BY doc_id
    ),
    dcg AS (
      SELECT CAST(sum(g.grade * ({_W20_SQL})[r.rank]) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS n_ranked
      FROM ranked r JOIN g USING (doc_id)
    ),
    ideal AS (
      SELECT CAST(sum(grade * ({_W20_SQL})[rn]) AS BIGINT) AS i FROM (
        SELECT grade, row_number() OVER (ORDER BY grade DESC, doc_id) AS rn
        FROM g
      ) WHERE rn <= {_NDCG20_K}
    )
    SELECT n_ranked, d AS dcg_micro, i AS idcg_micro,
           round(d * 1.0 / i, 6) AS ndcg_at_20
    FROM dcg CROSS JOIN ideal
    """,
    description=(
        "nDCG@20 of the BM25 ranking against term-coverage graded "
        "relevance (grade = distinct query terms present) — integer "
        "micro-weight DCG vs the corpus-wide ideal ordering"
    ),
)
def bm25_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality readout for the lexical retriever: does BM25's
    length/tf weighting put the docs covering MORE query terms first?
    Graded relevance needs no labels — it is derived from term coverage,
    so the metric runs as a standing data-quality probe on any corpus.
    Composes bm25_search_documents verbatim; the grade table is the same
    pre-shuffle term-restricted aggregate BM25 itself uses, and the DCG
    weights are Python-minted integer literals in both engines (no
    query-time transcendentals)."""
    (documents,) = load(spark, sf_dir, "documents")
    ranked = bm25_search_documents(spark, sf_dir)
    g = (
        documents.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term").isin(_QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").cast("bigint").alias("grade"))
    )
    warr = F.array(*[F.lit(x) for x in _DCG_W20])
    dcg = ranked.join(g, "doc_id").agg(
        F.sum(F.col("grade") * F.element_at(warr, F.col("rank")))
        .cast("bigint")
        .alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("n_ranked"),
    )
    ideal = (
        g.select(
            "grade",
            F.row_number()
            .over(Window.orderBy(F.desc("grade"), "doc_id"))
            .alias("rn"),
        )
        .where(F.col("rn") <= _NDCG20_K)
        .agg(
            F.sum(F.col("grade") * F.element_at(warr, F.col("rn")))
            .cast("bigint")
            .alias("i")
        )
    )
    return dcg.crossJoin(F.broadcast(ideal)).select(
        "n_ranked",
        F.col("d").alias("dcg_micro"),
        F.col("i").alias("idcg_micro"),
        F.round(F.col("d") * 1.0 / F.col("i"), 6).alias("ndcg_at_20"),
    )
