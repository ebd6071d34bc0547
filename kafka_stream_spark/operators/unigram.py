"""Unigram-LM tokenizer segmentation — the SentencePiece objective
(Kudo 2018, public paper) as a distributed, cross-engine-verified query.

Where ``bpe.py`` learns merges bottom-up, the unigram model scores every
candidate piece by corpus log-likelihood and segments each word with
Viterbi dynamic programming (the E-step of SentencePiece's EM loop).
The DP has sequential structure people assume needs a per-word UDF; it
doesn't:

- word lengths are bounded (fixtures assert <= 8 chars;
  ``_UG_MAX_WL`` is the explicit contract), so the DP unrolls into a
  FIXED number of rounds — each round is one equi-join of the
  distinct-word table against the piece-score table, exactly the
  unrolled-iteration pattern of ``harmonic_centrality_parts`` /
  ``bpe_learned_merges``;
- all DP comparisons are on integer micro-log scores with a total
  (score DESC, piece-length ASC) tie-break, so the chosen segmentation
  is a pure function of the corpus and both engines agree bit-for-bit.
  The ONLY float op is the one ln() per vocabulary piece that mints the
  micro-score, rounded to 1e-6 — the same pinning discipline as
  ``mix_sources_temperature``'s pow().

Scale shape: corpus-sized work is ONE tokenize+groupBy building word
frequencies; everything after runs over |distinct words| x |pieces|
(the production shape — SentencePiece trainers also operate on word
counts, not raw tokens). Each DP round localCheckpoints a tiny state
table, keeping plans linear (sharp edge #10).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_UG_MAX_PIECE = 4   # candidate pieces: substrings of length 1..4
_UG_MAX_WL = 8      # DP depth bound == max word length (fixture contract)
_UG_TOPK = 30


def _duck_forward(i: int) -> str:
    """One unrolled Viterbi round: best(i) over k in 1..min(4, i)."""
    branches = []
    for k in range(1, min(_UG_MAX_PIECE, i) + 1):
        branches.append(f"""
        SELECT p.w, p.cnt, p.best + s.s AS cand, {k} AS bk
        FROM v{i - k} p JOIN sc s ON s.p = substr(p.w, {i - k + 1}, {k})
        WHERE len(p.w) >= {i}""")
    un = " UNION ALL ".join(branches)
    return f"""
    v{i} AS MATERIALIZED (
      SELECT w, cnt, cand AS best, bk FROM (
        SELECT w, cnt, cand, bk,
               row_number() OVER (PARTITION BY w
                                  ORDER BY cand DESC, bk) AS rn
        FROM ({un})
      ) WHERE rn = 1
    )"""


def _duck_backtrack(s: int) -> str:
    """One backtrack hop: consume the chosen piece ending at pos."""
    return f"""
    t{s} AS MATERIALIZED (
      SELECT t.w, t.cnt, t.pos - v.bk AS pos,
             substr(t.w, t.pos - v.bk + 1, v.bk) AS piece
      FROM t{s - 1} t JOIN vall v ON v.w = t.w AND v.i = t.pos
      WHERE t.pos > 0
    )"""


_VALL = " UNION ALL ".join(
    f"SELECT w, {i} AS i, bk FROM v{i}" for i in range(1, _UG_MAX_WL + 1)
)
_PIECES = " UNION ALL ".join(
    f"SELECT w, cnt, piece FROM t{s}" for s in range(1, _UG_MAX_WL + 1)
)


@query(
    "unigram_tokenizer_pieces",
    oracle=f"""
    WITH words AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
      GROUP BY w
      HAVING len(w) <= {_UG_MAX_WL}
    ),
    freq AS MATERIALIZED (
      SELECT p, CAST(sum(cnt) AS BIGINT) AS f
      FROM (
        SELECT unnest(flatten(list_transform(range(1, len(w) + 1), i ->
                 list_transform(range(1, least({_UG_MAX_PIECE},
                                               len(w) - i + 1) + 1), k ->
                   substr(w, i, k))))) AS p,
               cnt
        FROM words
      )
      GROUP BY p
    ),
    tot AS (SELECT CAST(sum(f) AS BIGINT) AS t FROM freq),
    sc AS MATERIALIZED (
      SELECT p, CAST(round(1000000.0 * ln(f * 1.0 / t)) AS BIGINT) AS s
      FROM freq CROSS JOIN tot
    ),
    v0 AS (SELECT w, cnt, CAST(0 AS BIGINT) AS best FROM words),
    {",".join(_duck_forward(i) for i in range(1, _UG_MAX_WL + 1))},
    vall AS MATERIALIZED ({_VALL}),
    t0 AS (SELECT w, cnt, len(w) AS pos FROM words),
    {",".join(_duck_backtrack(s) for s in range(1, _UG_MAX_WL + 1))},
    pieces AS ({_PIECES})
    SELECT p.piece,
           CAST(sum(p.cnt) AS BIGINT) AS usage,
           CAST(count(DISTINCT p.w) AS BIGINT) AS n_words,
           any_value(s.s) AS score_micro
    FROM pieces p JOIN sc s ON s.p = p.piece
    GROUP BY p.piece
    ORDER BY usage DESC, p.piece
    LIMIT {_UG_TOPK}
    """,
    description=(
        "Unigram-LM (SentencePiece) tokenizer segmentation: substring "
        "vocabulary scored by corpus log-likelihood, per-word Viterbi "
        "DP unrolled as bounded equi-join rounds, top pieces by "
        "corpus-weighted usage — integer-exact DP, engine-verified"
    ),
)
def unigram_tokenizer_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment every distinct word with the unigram-LM Viterbi pass and
    report the corpus-weighted piece usage (the E-step statistics a
    SentencePiece trainer prunes against).

    DP state per round is (word, best-score); round i considers the
    pieces of length 1..4 ending at position i via one equi-join on the
    literal substring. Ties break (score DESC, shorter-piece-first) —
    identical to the oracle's row_number ordering.
    """
    (documents,) = load(spark, sf_dir, "documents")
    pieces, scores = _segment_words(documents)
    return (
        pieces.join(scores.select(F.col("p").alias("piece"), "s"), "piece")
        .groupBy("piece")
        .agg(
            F.sum("cnt").cast("bigint").alias("usage"),
            F.countDistinct("w").cast("bigint").alias("n_words"),
            F.first("s").alias("score_micro"),
        )
        .orderBy(F.desc("usage"), "piece")
        .limit(_UG_TOPK)
    )


def _segment_words(documents: DataFrame):
    """Viterbi-segment every distinct word of the corpus.

    Returns ``(pieces, scores)``: pieces is (w, cnt, piece, j) where j
    counts pieces from the END of the word (the backtrack emit order —
    the word is the j-DESC concatenation of its pieces); scores is the
    (p, s) integer micro-log piece table.
    """
    words = (
        documents.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .where(F.length("w") <= _UG_MAX_WL)
        .localCheckpoint()  # the distinct-word table every stage reuses
    )
    freq = (
        words.select(
            "cnt",
            F.explode(
                F.expr(
                    f"""flatten(transform(sequence(1, length(w)), i ->
                         transform(sequence(1, least({_UG_MAX_PIECE},
                                                     length(w) - i + 1)), k ->
                           substring(w, i, k))))"""
                )
            ).alias("p"),
        )
        .groupBy("p")
        .agg(F.sum("cnt").cast("bigint").alias("f"))
    )
    tot = freq.agg(F.sum("f").cast("bigint").alias("t"))
    scores = (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "p",
            F.round(F.lit(1_000_000.0) * F.log(F.col("f") * 1.0 / F.col("t")))
            .cast("bigint")
            .alias("s"),
        )
        .localCheckpoint()  # piece-score table, joined by every DP round
    )
    # forward Viterbi: best(0) = 0; best(i) = max over k of
    # best(i-k) + score(substr(i-k+1, k)), ties to the SMALLER k
    frontier = {
        0: words.select("w", "cnt", F.lit(0).cast("bigint").alias("best"))
    }
    back = []
    for i in range(1, _UG_MAX_WL + 1):
        cands = None
        for k in range(1, min(_UG_MAX_PIECE, i) + 1):
            c = (
                frontier[i - k]
                .where(F.length("w") >= i)
                .select(
                    "w",
                    "cnt",
                    F.substring("w", i - k + 1, k).alias("p"),
                    F.col("best").alias("pb"),
                    F.lit(k).alias("bk"),
                )
                .join(scores, "p")
                .select("w", "cnt", (F.col("pb") + F.col("s")).alias("cand"), "bk")
            )
            cands = c if cands is None else cands.unionByName(c)
        step = (
            cands.groupBy("w", "cnt")
            .agg(F.max(F.struct(F.col("cand"), (-F.col("bk")).alias("nk"))).alias("m"))
            .select(
                "w",
                "cnt",
                F.col("m.cand").alias("best"),
                (-F.col("m.nk")).cast("int").alias("bk"),
            )
            .localCheckpoint()  # tiny (|words| rows); keeps round plans flat
        )
        frontier[i] = step.select("w", "cnt", "best")
        back.append(step.select("w", F.lit(i).alias("i"), "bk"))
    vall = back[0]
    for b in back[1:]:
        vall = vall.unionByName(b)
    vall = vall.localCheckpoint()
    # backtrack: consume the chosen piece ending at pos until pos = 0
    states = words.select("w", "cnt", F.length("w").cast("int").alias("pos"))
    pieces = None
    for j in range(_UG_MAX_WL):
        cur = (
            states.where(F.col("pos") > 0)
            .join(vall, ["w"])
            .where(F.col("i") == F.col("pos"))
            .select(
                "w",
                "cnt",
                F.expr("substring(w, pos - bk + 1, bk)").alias("piece"),
                (F.col("pos") - F.col("bk")).alias("npos"),
            )
        )
        p = cur.select("w", "cnt", "piece", F.lit(j).alias("j"))
        pieces = p if pieces is None else pieces.unionByName(p)
        states = cur.select("w", "cnt", F.col("npos").cast("int").alias("pos"))
    return pieces, scores
