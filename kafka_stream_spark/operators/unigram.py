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

Reference framing: the tokenizer family serves the reference's
multilingual text feeds (sample-data/reddit.value.json:75-78) the way
``bpe.py`` does — corpus-statistics training over the bulk text
surface a downstream LLM pipeline consumes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_UG_MAX_PIECE = 4   # candidate pieces: substrings of length 1..4
_UG_MAX_WL = 8      # DP depth bound == max word length (fixture contract)
_UG_TOPK = 30


def _duck_forward(i: int, tag: str = "", sc: str = "sc") -> str:
    """One unrolled Viterbi round: best(i) over k in 1..min(4, i)."""
    branches = []
    for k in range(1, min(_UG_MAX_PIECE, i) + 1):
        branches.append(f"""
        SELECT p.w, p.cnt, p.best + s.s AS cand, {k} AS bk
        FROM v{tag}{i - k} p
        JOIN {sc} s ON s.p = substr(p.w, {i - k + 1}, {k})
        WHERE len(p.w) >= {i}""")
    un = " UNION ALL ".join(branches)
    return f"""
    v{tag}{i} AS MATERIALIZED (
      SELECT w, cnt, cand AS best, bk FROM (
        SELECT w, cnt, cand, bk,
               row_number() OVER (PARTITION BY w
                                  ORDER BY cand DESC, bk) AS rn
        FROM ({un})
      ) WHERE rn = 1
    )"""


def _duck_backtrack(s: int, tag: str = "") -> str:
    """One backtrack hop: consume the chosen piece ending at pos."""
    return f"""
    t{tag}{s} AS MATERIALIZED (
      SELECT t.w, t.cnt, t.pos - v.bk AS pos,
             substr(t.w, t.pos - v.bk + 1, v.bk) AS piece
      FROM t{tag}{s - 1} t
      JOIN vall{tag} v ON v.w = t.w AND v.i = t.pos
      WHERE t.pos > 0
    )"""


def _duck_dp_chain(tag: str = "", sc: str = "sc") -> str:
    """The full forward + backtrack CTE chain for one Viterbi pass.

    Expects ``words`` to exist; defines v{tag}0..N, vall{tag},
    t{tag}0..N and pieces{tag}.
    """
    fw = ",".join(
        _duck_forward(i, tag, sc) for i in range(1, _UG_MAX_WL + 1)
    )
    vall = " UNION ALL ".join(
        f"SELECT w, {i} AS i, bk FROM v{tag}{i}"
        for i in range(1, _UG_MAX_WL + 1)
    )
    bt = ",".join(_duck_backtrack(s, tag) for s in range(1, _UG_MAX_WL + 1))
    pieces = " UNION ALL ".join(
        f"SELECT w, cnt, piece FROM t{tag}{s}"
        for s in range(1, _UG_MAX_WL + 1)
    )
    return f"""
    v{tag}0 AS (SELECT w, cnt, CAST(0 AS BIGINT) AS best FROM words),
    {fw},
    vall{tag} AS MATERIALIZED ({vall}),
    t{tag}0 AS (SELECT w, cnt, len(w) AS pos FROM words),
    {bt},
    pieces{tag} AS ({pieces})"""


# shared corpus-side CTE prefix: distinct bounded words, substring
# frequencies, seed micro-log scores
_DUCK_PREFIX = f"""words AS MATERIALIZED (
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
    )"""


@query(
    "unigram_tokenizer_pieces",
    oracle=f"""
    WITH {_DUCK_PREFIX},
    {_duck_dp_chain()}
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
    words = _word_table(documents)
    scores = _seed_scores(words)
    return _viterbi(words, scores), scores


def _word_table(documents: DataFrame) -> DataFrame:
    return (
        documents.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .where(F.length("w") <= _UG_MAX_WL)
        .localCheckpoint()  # the distinct-word table every stage reuses
    )


def _seed_scores(words: DataFrame) -> DataFrame:
    """Integer micro-log score for every substring piece (length 1..4)."""
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
    return (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "p",
            F.round(F.lit(1_000_000.0) * F.log(F.col("f") * 1.0 / F.col("t")))
            .cast("bigint")
            .alias("s"),
        )
        .localCheckpoint()  # piece-score table, joined by every DP round
    )


def _viterbi(words: DataFrame, scores: DataFrame) -> DataFrame:
    """One Viterbi segmentation pass against an arbitrary (p, s) vocab.

    Every vocabulary must contain all single characters of the corpus
    (the coverage anchor), or some position has no incoming piece and
    the word silently drops out of the forward table.
    """
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
    return pieces


# ---------------------------------------------------------------------------
# One full EM round: E-step usage -> re-estimated scores -> re-segment
# ---------------------------------------------------------------------------


@query(
    "unigram_em_round",
    oracle=f"""
    WITH {_DUCK_PREFIX},
    {_duck_dp_chain()},
    u1 AS MATERIALIZED (
      SELECT piece AS p, CAST(sum(cnt) AS BIGINT) AS u
      FROM pieces GROUP BY piece
    ),
    numer AS MATERIALIZED (
      SELECT s.p,
             coalesce(u.u, 0)
               + CASE WHEN len(s.p) = 1 THEN 1 ELSE 0 END AS m
      FROM sc s LEFT JOIN u1 u ON u.p = s.p
    ),
    d2 AS (SELECT CAST(sum(m) AS BIGINT) AS d FROM numer WHERE m > 0),
    sc2 AS MATERIALIZED (
      SELECT p, CAST(round(1000000.0 * ln(m * 1.0 / d)) AS BIGINT) AS s
      FROM numer CROSS JOIN d2 WHERE m > 0
    ),
    {_duck_dp_chain("e", "sc2")}
    SELECT p2.piece,
           CAST(sum(p2.cnt) AS BIGINT) AS usage_em,
           CAST(count(DISTINCT p2.w) AS BIGINT) AS n_words,
           CAST(any_value(coalesce(u1.u, 0)) AS BIGINT) AS usage_seed,
           any_value(s2.s) AS score_micro
    FROM piecese p2
    JOIN sc2 s2 ON s2.p = p2.piece
    LEFT JOIN u1 ON u1.p = p2.piece
    GROUP BY p2.piece
    ORDER BY usage_em DESC, p2.piece
    LIMIT {_UG_TOPK}
    """,
    description=(
        "One full unigram-LM EM round: seed Viterbi usage re-estimates "
        "piece likelihoods (unused pieces pruned, single-char anchors "
        "add-one smoothed), then the corpus re-segments against the "
        "shrunk vocabulary — double-unrolled DP, engine-verified"
    ),
)
def unigram_em_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The M-step + second E-step SentencePiece iterates: piece
    probabilities re-estimated from observed Viterbi usage (maximum
    likelihood over the hard assignments), the vocabulary pruned to
    pieces that earned usage — with every single character kept as an
    add-one-smoothed coverage anchor so re-segmentation stays total —
    and the word table segmented again under the new scores.

    Same scale shape as the seed pass run twice: corpus touched once
    for word counts, every other stage is |distinct words| x |pieces|.
    """
    (documents,) = load(spark, sf_dir, "documents")
    words = _word_table(documents)
    sc1 = _seed_scores(words)
    usage1 = (
        _viterbi(words, sc1)
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("u"))
        .select(F.col("piece").alias("p"), "u")
    )
    numer = (
        sc1.select("p")
        .join(usage1, "p", "left")
        .select(
            "p",
            (
                F.coalesce(F.col("u"), F.lit(0))
                + F.when(F.length("p") == 1, 1).otherwise(0)
            ).alias("m"),
        )
        .where(F.col("m") > 0)
    )
    d2 = numer.agg(F.sum("m").cast("bigint").alias("d"))
    sc2 = (
        numer.crossJoin(F.broadcast(d2))
        .select(
            "p",
            F.round(F.lit(1_000_000.0) * F.log(F.col("m") * 1.0 / F.col("d")))
            .cast("bigint")
            .alias("s"),
        )
        .localCheckpoint()
    )
    p2 = _viterbi(words, sc2)
    return (
        p2.join(sc2.select(F.col("p").alias("piece"), "s"), "piece")
        .join(usage1.select(F.col("p").alias("piece"), "u"), "piece", "left")
        .groupBy("piece")
        .agg(
            F.sum("cnt").cast("bigint").alias("usage_em"),
            F.countDistinct("w").cast("bigint").alias("n_words"),
            F.first(F.coalesce(F.col("u"), F.lit(0))).cast("bigint").alias("usage_seed"),
            F.first("s").alias("score_micro"),
        )
        .orderBy(F.desc("usage_em"), "piece")
        .limit(_UG_TOPK)
    )
