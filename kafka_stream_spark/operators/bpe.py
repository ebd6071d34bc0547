"""Distributed BPE vocabulary learning — byte-pair-encoding merges
(Sennrich et al. 2016, the tokenizer-training algorithm behind GPT/BERT
vocabularies; public paper) learned over the corpus with an EXACT
unrolled-CTE oracle.

BPE is the canonical "iterative + data-dependent" pipeline step people
assume can't be cross-engine verified: each round counts adjacent symbol
pairs (weighted by word frequency), merges the argmax, and the merge
CHANGES the next round's pair distribution. Everything here is integer
counts with total (count DESC, pair ASC) tie-breaks, so a fixed number
of rounds is a pure function of the corpus — Spark's loop and DuckDB's
unrolled CTEs agree exactly (same trick as ``pagerank_parts`` /
``label_prop_communities``).

Merge application uses the classic sentinel-spaced representation: a
word is ``' h e l l o '``; applying merge ``l l`` is
``replace(s, ' l l ', ' ll ')``. The leading/trailing spaces make
symbol boundaries explicit (``'bc b'`` can never match pair ``'c b'``),
and both engines' ``replace`` scan left-to-right without overlap —
exactly BPE's greedy application order.

Scale shape: the corpus-sized work is ONE tokenize+groupBy building the
word-frequency table; every BPE round then runs over the VOCABULARY
(|distinct words|, with frequencies carrying corpus mass) — pair counts
are a groupBy with map-side combine, the argmax is a 1-row TakeOrdered,
and the merge is a broadcast crossJoin + map-only replace. This is why
production BPE trainers (HuggingFace tokenizers) work from word counts,
not the raw corpus; at 100 TB the vocab table is millions of rows, not
billions of tokens. localCheckpoint per round keeps plans linear
(sharp edge #10).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_BPE_ROUNDS = 3
#: oracle-side bound on symbols per word; fixtures assert words ≤ 8 chars
#: (tests/test_fixtures_parity.py), so 40 is safely above any real word
_MAX_SYMS = 40


def _duck_round(i: int) -> str:
    return f"""
    pairs{i} AS (
      SELECT concat(arr[i], ' ', arr[i+1]) AS pair, sum(freq) AS cnt
      FROM (SELECT freq, string_split(trim(s), ' ') AS arr FROM words{i - 1})
      CROSS JOIN (SELECT unnest(generate_series(1, {_MAX_SYMS})) AS i)
      WHERE i < len(arr)
      GROUP BY 1
    ),
    best{i} AS (
      SELECT pair, cnt FROM pairs{i} ORDER BY cnt DESC, pair LIMIT 1
    ),
    words{i} AS (
      SELECT w, freq,
             replace(s, concat(' ', b.pair, ' '),
                     concat(' ', replace(b.pair, ' ', ''), ' ')) AS s
      FROM words{i - 1} CROSS JOIN best{i} b
    )"""


@query(
    "bpe_learned_merges",
    oracle=f"""
    WITH wf AS (
      SELECT w, count(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ),
    words0 AS (
      SELECT w, freq,
             concat(' ', array_to_string(string_split(w, ''), ' '), ' ') AS s
      FROM wf
    ),
    {",".join(_duck_round(i) for i in range(1, _BPE_ROUNDS + 1))}
    SELECT 1 AS round, pair, replace(pair, ' ', '') AS merged,
           CAST(cnt AS BIGINT) AS support FROM best1
    UNION ALL SELECT 2, pair, replace(pair, ' ', ''), CAST(cnt AS BIGINT) FROM best2
    UNION ALL SELECT 3, pair, replace(pair, ' ', ''), CAST(cnt AS BIGINT) FROM best3
    ORDER BY round
    """,
    description=(
        f"BPE tokenizer-vocabulary learning ({_BPE_ROUNDS} merge rounds "
        "over word frequencies, exact integer argmax per round) — the "
        "iterative data-dependent pipeline step, cross-engine verified "
        "via unrolled CTEs"
    ),
)
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    wf = (
        documents.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    words = wf.select(
        "w",
        "freq",
        F.expr(
            "concat(' ', array_join(transform(sequence(1, length(w)),"
            " i -> substr(w, i, 1)), ' '), ' ')"
        ).alias("s"),
    ).localCheckpoint()
    bests = []
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            words.select("freq", F.split(F.trim("s"), " ").alias("arr"))
            .where(F.size("arr") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(arr) - 1),"
                        " i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.desc("cnt"), F.asc("pair")).limit(1).localCheckpoint()
        )
        bests.append(best.select(F.lit(r).alias("round"), "pair", "cnt"))
        words = (
            words.crossJoin(F.broadcast(best.select("pair")))
            .select(
                "w",
                "freq",
                F.expr(
                    "replace(s, concat(' ', pair, ' '),"
                    " concat(' ', replace(pair, ' ', ''), ' '))"
                ).alias("s"),
            )
            .localCheckpoint()
        )
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out.select(
        "round",
        "pair",
        F.expr("replace(pair, ' ', '')").alias("merged"),
        F.col("cnt").cast("bigint").alias("support"),
    ).orderBy("round")


@query(
    "bpe_compression_by_source",
    oracle=f"""
    WITH wf AS (
      SELECT w, count(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ),
    words0 AS (
      SELECT w, freq,
             concat(' ', array_to_string(string_split(w, ''), ' '), ' ') AS s
      FROM wf
    ),
    {",".join(_duck_round(i) for i in range(1, _BPE_ROUNDS + 1))},
    sym AS (
      SELECT w, len(string_split(trim(s), ' ')) AS n_sym, length(w) AS n_chars
      FROM words{_BPE_ROUNDS}
    ),
    docw AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    )
    SELECT source,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_sym) AS BIGINT) AS total_bpe_tokens,
           round(sum(n_chars) / sum(n_sym), 6) AS compression
    FROM docw JOIN sym USING (w)
    GROUP BY source ORDER BY source
    """,
    description=(
        "BPE APPLY path: encode the corpus with the learned merges and "
        "report per-source token compression — the tokenizer-throughput "
        "side of vocabulary training"
    ),
)
def bpe_compression_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Applying BPE at scale is a broadcast join: the (vocab-sized)
    symbol-count table joins the exploded corpus words — the corpus
    never shuffles; per-source sums partial-aggregate map-side. The
    learned merges come from the same 3-round loop as
    ``bpe_learned_merges`` (deterministic, so both queries agree on the
    vocabulary)."""
    (documents,) = load(spark, sf_dir, "documents")
    wf = (
        documents.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    words = wf.select(
        "w",
        "freq",
        F.expr(
            "concat(' ', array_join(transform(sequence(1, length(w)),"
            " i -> substr(w, i, 1)), ' '), ' ')"
        ).alias("s"),
    ).localCheckpoint()
    for _ in range(_BPE_ROUNDS):
        pairs = (
            words.select("freq", F.split(F.trim("s"), " ").alias("arr"))
            .where(F.size("arr") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(arr) - 1),"
                        " i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("pair")).limit(1)
        words = (
            words.crossJoin(F.broadcast(best.select("pair")))
            .select(
                "w",
                "freq",
                F.expr(
                    "replace(s, concat(' ', pair, ' '),"
                    " concat(' ', replace(pair, ' ', ''), ' '))"
                ).alias("s"),
            )
            .localCheckpoint()
        )
    sym = words.select(
        "w",
        F.size(F.split(F.trim("s"), " ")).alias("n_sym"),
        F.length("w").alias("n_chars"),
    )
    docw = documents.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    return (
        docw.join(F.broadcast(sym), "w")
        .groupBy("source")
        .agg(
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_sym").cast("bigint").alias("total_bpe_tokens"),
            F.round(F.sum("n_chars") / F.sum("n_sym"), 6).alias("compression"),
        )
        .orderBy("source")
    )
