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
