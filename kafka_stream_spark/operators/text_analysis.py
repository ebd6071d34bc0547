"""Text-analysis operators for training-data pipelines (north-star M6).

Language-ID (stopword-marker heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and content fingerprinting — all pure
Catalyst expressions (split/regexp/md5/array ops), no Python UDFs, so they
run inside whole-stage codegen and scale linearly with no shuffle except
the final ordering.

The reference's text surface is the multilingual reddit corpus
(``reddit.value.json:75-78``, UTF-8 bodies; SURVEY.md §2.8 F9); these
operators are its analysis layer rebuilt for bulk data curation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

# simple English marker set (deterministic; accuracy is secondary to
# plumbing here — the synthetic corpus shares one vocabulary)
_EN_MARKERS = ("the", "a", "of", "and", "to", "in", "is", "it")
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _markers_sql_list() -> str:
    return ", ".join(f"'{m}'" for m in _EN_MARKERS)


@query(
    "text_token_count",
    oracle=rf"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '{_BPE_ISH}')) AS bpe_ish_tokens,
           n_chars
    FROM documents
    ORDER BY doc_id
    """,
    description="Token counting: whitespace + BPE-ish regex tokenizer",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        # F.lit pattern (not an SQL string literal — Spark SQL literals eat '\s')
        F.size(F.regexp_extract_all("text", F.lit(_BPE_ISH), F.lit(0))).alias("bpe_ish_tokens"),
        "n_chars",
    ).orderBy("doc_id")


@query(
    "text_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks, n_chars FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           round(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS distinct_ratio,
           round(n_chars * 1.0 / len(toks), 6) AS avg_token_len,
           round(0.5 * (len(list_distinct(toks)) * 1.0 / len(toks))
                 + 0.5 * least(len(toks) / 100.0, 1.0), 6) AS quality
    FROM t
    ORDER BY doc_id
    """,
    description="Quality scoring: length/diversity ratios -> composite score",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    t = documents.select("doc_id", F.split("text", " ").alias("toks"), "n_chars")
    n_tokens = F.size("toks")
    n_distinct = F.size(F.array_distinct("toks"))
    distinct_ratio = n_distinct / n_tokens
    return t.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(F.col("n_chars") / n_tokens, 6).alias("avg_token_len"),
        F.round(
            0.5 * distinct_ratio + 0.5 * F.least(n_tokens / F.lit(100.0), F.lit(1.0)), 6
        ).alias("quality"),
    ).orderBy("doc_id")


@query(
    "text_lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> x IN ({_markers_sql_list()}))) * 1.0
               / len(toks) AS marker_ratio
      FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN marker_ratio >= 0.05 THEN 'en' ELSE 'und' END AS pred_lang,
           round(marker_ratio, 6) AS marker_ratio
    FROM scored
    ORDER BY doc_id
    """,
    description="Language-ID heuristic via stopword-marker ratio",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    marker_ratio = (
        F.size(F.filter(toks, lambda x: x.isin(list(_EN_MARKERS)))) / F.size(toks)
    )
    return documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(marker_ratio >= 0.05, F.lit("en")).otherwise(F.lit("und")).alias("pred_lang"),
        F.round(marker_ratio, 6).alias("marker_ratio"),
    ).orderBy("doc_id")


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
    description="Content fingerprint: md5 of sorted distinct token set",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(F.split("text", " "))), " "
            ).cast("binary")
        ).alias("fingerprint"),
    ).orderBy("doc_id")


@query(
    "ngram_frequency",
    oracle="""
    WITH tok AS (SELECT string_split(text, ' ') AS toks FROM documents),
    grams AS (
      SELECT toks[i] || ' ' || toks[i+1] AS gram
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 1000)) AS i)
      WHERE i <= len(toks) - 1
    )
    SELECT gram, count(*) AS n
    FROM grams
    GROUP BY gram
    ORDER BY n DESC, gram
    LIMIT 30
    """,
    description="Corpus-wide top-k bigram frequency (vocabulary statistics for tokenizer training)",
)
def ngram_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    # token barrier (cache) as in dedup: stop CollapseProject from inlining
    # split() into the n-gram lambda
    toks = documents.select(F.split("text", " ").alias("toks")).cache()
    grams = toks.select(
        F.explode(
            F.expr(
                """CASE WHEN size(toks) >= 2
                   THEN transform(sequence(1, size(toks) - 1),
                                  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))
                   ELSE array() END"""
            )
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "gram")
        .limit(30)
    )


@query(
    "curation_pipeline",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source, n_chars, string_split(text, ' ') AS toks, text
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, source, n_chars,
             len(list_distinct(toks)) * 1.0 / len(toks) AS distinct_ratio,
             len(toks) AS n_tokens,
             md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
      FROM t
    ),
    quality AS (
      SELECT * FROM scored
      WHERE n_tokens >= 40 AND distinct_ratio >= 0.3 AND lang IN ('en', 'de', 'es')
    ),
    deduped AS (  -- keep the lowest doc_id per content fingerprint
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM quality)
      WHERE rn = 1
    )
    SELECT lang, count(*) AS n_kept, round(avg(n_chars), 6) AS avg_chars,
           round(avg(distinct_ratio), 6) AS avg_distinct_ratio
    FROM deduped
    GROUP BY lang
    ORDER BY lang
    """,
    description="Composed curation flow: quality gate + lang filter + fingerprint dedup + stats (the end-to-end training-data pipeline)",
    bench=True,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = documents.select(
        "doc_id", "lang", "source", "n_chars",
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("distinct_ratio"),
        F.size(toks).alias("n_tokens"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(toks)), " ").cast("binary")
        ).alias("fp"),
    )
    quality = scored.filter(
        (F.col("n_tokens") >= 40)
        & (F.col("distinct_ratio") >= 0.3)
        & F.col("lang").isin("en", "de", "es")
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = quality.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.round(F.avg("distinct_ratio"), 6).alias("avg_distinct_ratio"),
        )
        .orderBy("lang")
    )


@query(
    "curation_decision_log",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, source,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS distinct_ratio,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                                 ' ')) AS fp
      FROM documents
    ),
    ranked AS (
      SELECT s.*, r.rn FROM scored s
      LEFT JOIN (
        SELECT doc_id, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM scored
        WHERE n_tokens >= 40 AND distinct_ratio >= 0.3
          AND lang IN ('en', 'de', 'es')
      ) r ON r.doc_id = s.doc_id
    )
    SELECT doc_id, lang, source, CAST(n_tokens AS INT) AS n_tokens,
           CASE WHEN n_tokens < 40 THEN 'short'
                WHEN distinct_ratio < 0.3 THEN 'low_diversity'
                WHEN lang NOT IN ('en', 'de', 'es') THEN 'lang'
                WHEN rn > 1 THEN 'duplicate'
                ELSE 'kept' END AS decision
    FROM ranked
    ORDER BY doc_id
    """,
    description=(
        "Per-document curation decision log: the first gate each doc "
        "fails in the curation_pipeline flow (short / low_diversity / "
        "lang / duplicate / kept) — the 'why was my doc dropped' audit"
    ),
    bench=True,
)
def curation_decision_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level provenance for curation_pipeline: same gates, same
    thresholds, same dedup rank — but instead of aggregate stats it
    emits each document's fate, which is what an operator debugging a
    pipeline actually asks for. Same scale shape as the pipeline (one
    fingerprint window over the gate survivors; everything else
    map-only), so the log costs no more than the summary."""
    (documents,) = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = documents.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("distinct_ratio"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(toks)), " ").cast("binary")
        ).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    ranked = (
        scored.filter(
            (F.col("n_tokens") >= 40)
            & (F.col("distinct_ratio") >= 0.3)
            & F.col("lang").isin("en", "de", "es")
        )
        .select("doc_id", F.row_number().over(w).alias("rn"))
    )
    return (
        scored.join(ranked, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.when(F.col("n_tokens") < 40, "short")
            .when(F.col("distinct_ratio") < 0.3, "low_diversity")
            .when(~F.col("lang").isin("en", "de", "es"), "lang")
            .when(F.col("rn") > 1, "duplicate")
            .otherwise("kept")
            .alias("decision"),
        )
        .orderBy("doc_id")
    )


@query(
    "scalar_funcs_events",
    oracle="""
    SELECT event_id,
           upper(event_type) AS type_upper,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           base64(encode(event_type)) AS type_b64,
           regexp_extract(event_type, '([a-z]+)', 1) AS type_word,
           concat(event_type, ':', CAST(user_id AS VARCHAR)) AS tagged
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
    description="Scalar function surface: json/regex/base64/string (SURVEY.md §2.8)",
)
def scalar_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_id") < 500)
        .select(
            "event_id",
            F.upper("event_type").alias("type_upper"),
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            F.base64(F.col("event_type").cast("binary")).alias("type_b64"),
            F.regexp_extract("event_type", "([a-z]+)", 1).alias("type_word"),
            F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("tagged"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# dataset_split — deterministic train/val/test assignment
# ---------------------------------------------------------------------------


@query(
    "dataset_split",
    oracle="""
    WITH assigned AS (
      SELECT source,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT source,
                   ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS b
            FROM documents)
    )
    SELECT source, split, count(*) AS n
    FROM assigned
    GROUP BY source, split
    ORDER BY source, split
    """,
    description=(
        "Deterministic 80/10/10 train/val/test split by md5(doc_id) bucket — "
        "the training-pipeline split op: stable under reruns/reshuffles and "
        "across engines, no RNG, stratification audited per source"
    ),
    bench=True,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket split assignment (LLM-pipeline op, brief §north-star).

    Scale: a pure per-row projection (md5 + modulo) — no shuffle to ASSIGN
    splits at any scale; the single groupBy here is only the audit
    aggregation. Writers would partitionBy('split') on the way out.
    """
    (documents,) = load(spark, sf_dir, "documents")
    bucket = (
        F.expr("cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 15), 16, 10) as bigint)")
        % 100
    )
    split = (
        F.when(F.col("b") < 80, "train").when(F.col("b") < 90, "val").otherwise("test")
    )
    return (
        documents.withColumn("b", bucket)
        .withColumn("split", split)
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("source", "split")
    )


# ---------------------------------------------------------------------------
# winnowing fingerprint — rolling k-gram hashes with window-min selection
# ---------------------------------------------------------------------------

_WIN_K = 4   # tokens per k-gram
_WIN_W = 4   # winnowing window (k-gram hashes per window)
_WIN_MOD = 1_000_000_007  # checksum modulus (keeps sums < 2^47, ANSI-safe)


@query(
    "text_winnowing_fingerprint",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= {_WIN_K}
                  THEN [('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' '
                                            || toks[i+2] || ' ' || toks[i+3]), 1, 15))::BIGINT
                        for i in range(1, len(toks) - {_WIN_K - 2})]
                  ELSE [] END AS h
      FROM tok
    ),
    winnowed AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(h) >= {_WIN_W}
                  THEN [list_min(h[j:j + {_WIN_W - 1}])
                        for j in range(1, len(h) - {_WIN_W - 2})]
                  ELSE CASE WHEN len(h) > 0 THEN [list_min(h)] ELSE [] END
             END) AS sel
      FROM grams
    )
    SELECT doc_id,
           len(sel) AS n_fingerprints,
           CAST(list_sum(list_transform(sel, x -> x % {_WIN_MOD})) AS BIGINT)
             AS fp_checksum,
           list_min(sel) AS fp_min
    FROM winnowed
    WHERE len(sel) > 0
    ORDER BY doc_id
    """,
    description=(
        "Winnowing document fingerprint (MOSS): rolling 4-gram md5 hashes, "
        "min-selected per sliding window — position-robust plagiarism/"
        "overlap fingerprints, guaranteed one selection per window"
    ),
)
def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-JVM higher-order-function pipeline: gram hashes via md5+conv,
    window minima via transform-over-sequence + slice + array_min (bigint
    arrays take the primitive fast path), distinct + checksum per doc —
    zero shuffle before the final ordering; linear in tokens per doc
    (w-bounded slice per position).
    """
    (documents,) = load(spark, sf_dir, "documents")
    ncpu = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # cache barrier: CollapseProject would inline split() into every gram
    toks = (
        documents.select("doc_id", F.split("text", " ").alias("toks"))
        .repartition(ncpu, "doc_id")
        .cache()
    )
    gram_hash = (
        f"transform(sequence(1, size(toks) - {_WIN_K - 1}), i -> "
        f"cast(conv(substr(md5(cast(concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), "
        f"element_at(toks, i + 2), element_at(toks, i + 3)) as binary)), 1, 15), 16, 10) as bigint))"
    )
    grams = toks.select(
        "doc_id",
        F.expr(
            f"CASE WHEN size(toks) >= {_WIN_K} THEN {gram_hash} ELSE array() END"
        ).alias("h"),
    )
    winnow = (
        f"CASE WHEN size(h) >= {_WIN_W} THEN "
        f"transform(sequence(1, size(h) - {_WIN_W - 1}), j -> array_min(slice(h, j, {_WIN_W}))) "
        f"WHEN size(h) > 0 THEN array(array_min(h)) ELSE array() END"
    )
    sel = grams.select(
        "doc_id", F.array_distinct(F.expr(winnow)).alias("sel")
    ).filter(F.size("sel") > 0)
    return sel.select(
        "doc_id",
        F.size("sel").alias("n_fingerprints"),
        F.aggregate(
            F.transform("sel", lambda x: x % _WIN_MOD),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("fp_checksum"),
        F.array_min("sel").alias("fp_min"),
    ).orderBy("doc_id")


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * round(ln(n.n_docs * 1.0 / df.df), 6), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rn
          FROM scored)
    WHERE rn <= 3
    ORDER BY doc_id, tfidf DESC, term
    """,
    description=(
        "Per-document top-3 terms by TF-IDF: explode -> two map-side-"
        "combinable aggs -> broadcast idf join -> per-doc top-k window"
    ),
    bench=True,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction for curation reports. Shuffle story: the explode
    is linear and stays in codegen; TF and DF are both partial-agg'd
    before the wire (common terms collapse map-side, the classic word-
    count skew fix); the DF (vocab) table is tiny relative to the corpus
    and broadcasts back, so the only corpus-sized exchange is the
    groupBy(doc_id, term). The idf is rounded to 6dp BEFORE the tf
    multiply in both engines so cross-engine libm ULP drift can't move a
    rounding boundary at rank time.
    """
    (documents,) = load(spark, sf_dir, "documents")
    tok = documents.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.round(F.log(F.col("n_docs") * 1.0 / F.col("df")), 6)
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", F.round(F.col("tf") * idf, 6).alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
        .orderBy("doc_id", F.desc("tfidf"), "term")
    )


# ---------------------------------------------------------------------------
# hashed-feature linear quality classifier (fastText-shaped scoring path)
# ---------------------------------------------------------------------------

# per-token integer weight in [-50, 50] micro-units, derived from md5 so
# both engines compute the identical model. In production the weight
# table is a trained model broadcast to executors; the SCORING path —
# hash token, look up weight, sum — is exactly this expression.
_W_SPARK = (
    "cast(conv(substr(md5(cast(concat('w:', t) as binary)), 1, 8), 16, 10)"
    " as bigint) % 101 - 50"
)
_W_DUCK = "(('0x' || substr(md5('w:' || t), 1, 8))::BIGINT) % 101 - 50"


@query(
    "quality_classifier_score",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(list_sum(list_transform(string_split(text, ' '),
                    t -> {_W_DUCK})) AS BIGINT) AS score_u
      FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           score_u,
           CASE WHEN score_u > 0 THEN 1 ELSE 0 END AS quality_pass
    FROM scored ORDER BY doc_id
    """,
    description=(
        "fastText-shaped quality classifier scoring: hashed bag-of-words "
        "features x integer weights summed per document in ONE map-only "
        "expression — zero shuffle, zero UDF"
    ),
    bench=True,
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear text-quality scoring by the hashing trick (public: fastText,
    Joulin et al. 2016; Vowpal Wabbit feature hashing): each token hashes
    to an integer weight, a document's score is the sum. The whole scorer
    is one JVM-side expression — transform + aggregate over split() — so
    the classifier runs at scan speed with NO shuffle, NO Python, and NO
    per-token row explosion: the right shape for gating a 100 TB corpus.
    Integer micro-unit weights make the sum order-independent and the
    oracle exact."""
    (documents,) = load(spark, sf_dir, "documents")
    score = F.expr(
        f"""aggregate(transform(split(text, ' '), t -> {_W_SPARK}),
                      cast(0 as bigint), (acc, v) -> acc + v)"""
    )
    return (
        documents.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
            score.alias("score_u"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score_u",
            F.when(F.col("score_u") > 0, 1).otherwise(0).alias("quality_pass"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# classifier calibration — reliability diagram as a query
# ---------------------------------------------------------------------------

_CAL_BINS = 10
# per-token mean micro-weight s sits in [-50_000, 50_000] after the
# x1000 scaling; shift+scale maps it onto integer bins 0..9
_CAL_SHIFT = 50_000
_CAL_SPAN = 100_001


@query(
    "calibration_reliability_bins",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(list_sum(list_transform(string_split(text, ' '),
                    t -> {_W_DUCK})) AS BIGINT) * 1000
               // len(string_split(text, ' ')) AS s
      FROM documents
    ),
    binned AS (
      SELECT (s + {_CAL_SHIFT}) * {_CAL_BINS} // {_CAL_SPAN} AS bin,
             s, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
      FROM scored
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_en) AS BIGINT) AS n_en,
           round(sum(is_en) * 1.0 / count(*), 6) AS en_rate,
           CAST(sum(s) AS BIGINT) // count(*) AS mean_score_milli
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
    description=(
        "Classifier calibration audit: reliability-diagram bins of the "
        "hashed quality score vs the lang='en' label — per-bin counts, "
        "empirical positive rate, mean score (integer-exact binning)"
    ),
    bench=True,
)
def calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The threshold-picking companion to quality_classifier_score: bins
    the per-token mean score into a fixed integer grid and reports the
    empirical label rate per bin (a reliability diagram / calibration
    table). Map-only scoring into a ten-row aggregate — the
    corpus is never shuffled, so the audit costs one scan at any size.
    Integer shift-scale binning and truncating division keep every bin
    boundary engine-exact."""
    (documents,) = load(spark, sf_dir, "documents")
    # integer truncating division (matches DuckDB //) via expr div
    scored = documents.select(
        "lang",
        F.expr(
            f"""(aggregate(transform(split(text, ' '), t -> {_W_SPARK}),
                           cast(0 as bigint), (acc, v) -> acc + v) * 1000)
                div size(split(text, ' '))"""
        ).alias("s"),
    )
    binned = scored.select(
        F.expr(f"(s + {_CAL_SHIFT}) * {_CAL_BINS} div {_CAL_SPAN}")
        .cast("int")
        .alias("bin"),
        "s",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("is_en").cast("bigint").alias("n_en"),
            F.round(F.sum("is_en") * 1.0 / F.count(F.lit(1)), 6).alias("en_rate"),
            F.expr("cast(sum(s) as bigint) div count(1)").alias("mean_score_milli"),
        )
        .orderBy("bin")
    )


@query(
    "corpus_stats_by_source",
    oracle="""
    WITH d AS (
      SELECT source, lang, len(string_split(text, ' ')) AS n_toks
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens,
           round(avg(n_toks), 6) AS avg_tokens,
           round(quantile_cont(n_toks, 0.5), 6) AS p50_tokens,
           round(quantile_cont(n_toks, 0.9), 6) AS p90_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM d GROUP BY source ORDER BY source
    """,
    description=(
        "Dataset-card rollup per source: doc/token counts, interpolated "
        "token-length percentiles (Spark percentile == DuckDB "
        "quantile_cont, verified), language spread — ONE groupBy"
    ),
)
def corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The summary table a data card / mixing decision starts from. One
    scan, one groupBy with map-side partials; exact percentiles are the
    one non-mergeable piece (they buffer per-group values), which is
    fine per SOURCE (group count is small); at petabyte scale swap
    percentile -> the mergeable histogram sketch
    (`histogram_quantile_sketch`) with identical output shape."""
    (documents,) = load(spark, sf_dir, "documents")
    d = documents.select(
        "source", "lang", F.size(F.split("text", " ")).alias("n_toks")
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.round(F.avg("n_toks"), 6).alias("avg_tokens"),
            F.round(F.expr("percentile(n_toks, 0.5)"), 6).alias("p50_tokens"),
            F.round(F.expr("percentile(n_toks, 0.9)"), 6).alias("p90_tokens"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Zipf-law fit — the dataset-card power-law audit
# ---------------------------------------------------------------------------

_ZIPF_TOP = 100  # fit over the top-R words per source


@query(
    "zipf_fit_by_source",
    oracle=f"""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
      SELECT source, word, count(*) AS freq FROM w GROUP BY source, word
    ),
    ranked AS (
      SELECT source, word, freq,
             row_number() OVER (PARTITION BY source
                                ORDER BY freq DESC, word) AS rnk
      FROM wc
    ),
    pts AS (
      SELECT source,
             CAST(round(ln(rnk) * 1000000) AS BIGINT) AS x,
             CAST(round(ln(freq) * 1000000) AS BIGINT) AS y,
             CASE WHEN rnk = 1 THEN word END AS top_word
      FROM ranked WHERE rnk <= {_ZIPF_TOP}
    ),
    mom AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS syy,
             max(top_word) AS top_word
      FROM pts GROUP BY source
    )
    SELECT source, n AS n_words, top_word,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6)
             AS zipf_slope,
           round(((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6)
             AS r2
    FROM mom ORDER BY source
    """,
    description=(
        f"Zipf power-law fit per source: OLS slope of ln(freq) vs ln(rank) "
        f"over the top-{_ZIPF_TOP} words (integer micro-unit moments, so "
        "the fit is engine-exact) — the dataset-card check that a text "
        "source has natural-language frequency structure"
    ),
    bench=True,
)
def zipf_fit_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus pass: explode-to-words then a (source, word) groupBy
    with map-side combine (shuffle width = per-source vocabulary, not
    token count); ranking and the fit run over the top-R rows per
    source. ln() lands in integer micro-units before any cross-row sum
    (the ``lm_bigram_logprob`` determinism pattern), and the OLS slope
    comes from the five integer moment sums (the ``ols_daily_trend``
    pattern) — both engines agree exactly."""
    (documents,) = load(spark, sf_dir, "documents")
    wc = (
        documents.select(
            "source", F.explode(F.split("text", " ")).alias("word")
        )
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = wc.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.desc("freq"), "word")
        ),
    ).where(F.col("rnk") <= _ZIPF_TOP)
    pts = ranked.select(
        "source",
        F.round(F.log(F.col("rnk")) * 1000000).cast("bigint").alias("x"),
        F.round(F.log(F.col("freq")) * 1000000).cast("bigint").alias("y"),
        F.when(F.col("rnk") == 1, F.col("word")).alias("top_word"),
    )
    mom = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.max("top_word").alias("top_word"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return mom.select(
        "source",
        F.col("n").alias("n_words"),
        "top_word",
        F.round(num * 1.0 / denx, 6).alias("zipf_slope"),
        F.round((num * 1.0 * num) / (denx * 1.0 * deny), 6).alias("r2"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Vocabulary coverage@V — tokenizer vocab-size sizing curve
# ---------------------------------------------------------------------------

_VOCAB_SIZES = [10, 25, 50, 100]


@query(
    "token_vocab_coverage",
    oracle=f"""
    WITH tc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ),
    ranked AS (
      SELECT n,
             row_number() OVER (ORDER BY n DESC, w) AS rnk,
             CAST(sum(n) OVER (ORDER BY n DESC, w
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM tc
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS n_distinct FROM tc)
    SELECT v.v AS vocab_size,
           CAST(least(v.v, tot.n_distinct) AS BIGINT) AS n_vocab_used,
           r.cum AS covered_occurrences,
           tot.t AS total_occurrences,
           round(r.cum * 1.0 / tot.t, 6) AS coverage
    FROM (SELECT unnest(ARRAY{_VOCAB_SIZES}) AS v) v
    CROSS JOIN tot
    JOIN ranked r ON r.rnk = least(v.v, tot.n_distinct)
    ORDER BY vocab_size
    """,
    description=(
        "Tokenizer vocab sizing curve: share of all token occurrences "
        "covered by the top-V vocabulary for V in "
        f"{_VOCAB_SIZES} — the OOV-rate/vocab-size tradeoff readout"
    ),
)
def token_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage@V: what fraction of the corpus token stream the top-V
    most frequent tokens explain (1 - coverage is the OOV rate a
    V-sized word vocab would eat). The corpus-sized work is one
    map-side-combined token count; the ranking window runs over the
    DISTINCT vocabulary — small relative to the corpus, and the global
    order there is the point of the query."""
    (documents,) = load(spark, sf_dir, "documents")
    tc = (
        documents.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), "w")
    ranked = tc.select(
        "n",
        F.row_number().over(w).alias("rnk"),
        F.sum("n")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum"),
    )
    tot = tc.agg(
        F.sum("n").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    sizes = spark.createDataFrame([(v,) for v in _VOCAB_SIZES], "v INT")
    return (
        sizes.crossJoin(F.broadcast(tot))
        .select(
            F.col("v").alias("vocab_size"),
            F.least(F.col("v").cast("bigint"), F.col("n_distinct")).alias(
                "n_vocab_used"
            ),
            "t",
        )
        .join(ranked, F.col("n_vocab_used") == F.col("rnk"))
        .select(
            "vocab_size",
            "n_vocab_used",
            F.col("cum").alias("covered_occurrences"),
            F.col("t").alias("total_occurrences"),
            F.round(F.col("cum") * 1.0 / F.col("t"), 6).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


# ---------------------------------------------------------------------------
# Character entropy — the gibberish / encoding-noise signal
# ---------------------------------------------------------------------------


@query(
    "text_char_entropy",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, '') AS cs,
             len(string_split(text, '')) AS n
      FROM documents
    ),
    d AS (
      SELECT doc_id, n, list_sort(list_distinct(cs)) AS dcs, cs FROM t
    )
    SELECT doc_id,
           CAST(len(dcs) AS INT) AS n_distinct_chars,
           round(-list_sum(list_transform(dcs, c ->
               (len(list_filter(cs, x -> x = c)) * 1.0 / n)
               * log2(len(list_filter(cs, x -> x = c)) * 1.0 / n))), 6)
             AS entropy_bits
    FROM d
    ORDER BY doc_id
    """,
    description=(
        "Per-document character-level Shannon entropy (bits/char "
        "distribution): near-zero flags repeated-char junk, "
        "abnormally-high flags random/encoded noise — the classic "
        "gibberish screen"
    ),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only quality signal: each doc's char histogram and entropy
    computed inside one expression (distinct chars sorted FIRST so both
    engines fold the identical float sequence; round-after-sum pins the
    value). No shuffle, no UDF — runs at scan speed at any corpus size.
    O(distinct-chars x len) per doc is bounded by the alphabet."""
    (documents,) = load(spark, sf_dir, "documents")
    return (
        documents.select(
            "doc_id",
            F.expr(
                """named_struct(
                     'dcs', array_sort(array_distinct(split(text, ''))),
                     'cs', split(text, ''),
                     'n', size(split(text, '')))"""
            ).alias("s"),
        )
        .select(
            "doc_id",
            F.expr("size(s.dcs)").cast("int").alias("n_distinct_chars"),
            F.round(
                F.expr(
                    """-aggregate(
                         transform(s.dcs, c ->
                           (size(filter(s.cs, x -> x = c)) * 1.0D / s.n)
                           * log2(size(filter(s.cs, x -> x = c)) * 1.0D / s.n)),
                         cast(0.0 as double), (acc, v) -> acc + v)"""
                ),
                6,
            ).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Source curation scorecard — per-source league table
# ---------------------------------------------------------------------------


from kafka_stream_spark.registry import QUERIES as _REGQ

_LOG_ORACLE = _REGQ["curation_decision_log"].oracle


@query(
    "source_curation_scorecard",
    oracle=f"""
    WITH log AS ({_LOG_ORACLE}),
    q AS (
      SELECT doc_id,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS distinct_ratio
      FROM documents
    )
    SELECT l.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE l.decision = 'kept') AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE l.decision = 'short') AS BIGINT) AS n_short,
           CAST(count(*) FILTER (WHERE l.decision = 'duplicate') AS BIGINT)
             AS n_duplicate,
           round(count(*) FILTER (WHERE l.decision = 'kept') * 1.0
                 / count(*), 6) AS keep_rate,
           round(avg(q.distinct_ratio), 6) AS avg_distinct_ratio
    FROM log l JOIN q USING (doc_id)
    GROUP BY l.source
    ORDER BY l.source
    """,
    description=(
        "Per-source curation league table: keep / short / duplicate "
        "counts, keep rate, and mean lexical diversity — the scorecard "
        "that decides which feeds earn more crawl budget"
    ),
)
def source_curation_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolls curation_decision_log up to the per-source view an
    acquisitions team actually reads. Composes the decision log
    verbatim (same gates, thresholds, dedup rank) joined with the
    diversity signal; the corpus-sized work is the log's own single
    window pass — this rollup adds one k-row aggregate."""
    (documents,) = load(spark, sf_dir, "documents")
    log = curation_decision_log(spark, sf_dir)
    toks = F.split("text", " ")
    q = documents.select(
        "doc_id",
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("distinct_ratio"),
    )
    kept = F.when(F.col("decision") == "kept", 1).otherwise(0)
    short = F.when(F.col("decision") == "short", 1).otherwise(0)
    dup = F.when(F.col("decision") == "duplicate", 1).otherwise(0)
    return (
        log.join(q, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.sum(short).cast("bigint").alias("n_short"),
            F.sum(dup).cast("bigint").alias("n_duplicate"),
            F.round(F.sum(kept) * 1.0 / F.count(F.lit(1)), 6).alias("keep_rate"),
            F.round(F.avg("distinct_ratio"), 6).alias("avg_distinct_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Term burstiness — variance-to-mean dispersion of term usage
# ---------------------------------------------------------------------------

_BURST_MIN_DF = 5
_BURST_TOPK = 20


@query(
    "term_burstiness",
    oracle=f"""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      ) GROUP BY doc_id, term
    ),
    stats AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS total_tf,
             CAST(sum(tf * tf) AS BIGINT) AS total_tf2
      FROM tf GROUP BY term
      HAVING count(*) >= {_BURST_MIN_DF}
    ),
    scored AS (
      SELECT term, df, total_tf,
             round((total_tf2 * 1.0 / n.n_docs
                    - (total_tf * 1.0 / n.n_docs) * (total_tf * 1.0 / n.n_docs))
                   / (total_tf * 1.0 / n.n_docs), 6) AS dispersion
      FROM stats CROSS JOIN n
    )
    SELECT term, df, total_tf, dispersion
    FROM scored
    ORDER BY dispersion DESC, term
    LIMIT {_BURST_TOPK}
    """,
    description=(
        "Term burstiness: variance-to-mean dispersion of per-document "
        "term counts (Poisson baseline = 1; bursty topical terms score "
        "high, function words low) — top-20 most bursty terms"
    ),
)
def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness as a query: a term whose occurrences
    clump into few documents (high variance-to-mean over the document
    frequency distribution, zeros included) is topical; dispersion ~1
    is Poisson background. All corpus-sized work is the (doc, term)
    count with map-side combine; moments are exact integers until one
    final rounded division, so the ranking is engine-stable."""
    (documents,) = load(spark, sf_dir, "documents")
    n = documents.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tf = (
        documents.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    stats = (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("total_tf"),
            F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("total_tf2"),
        )
        .where(F.col("df") >= _BURST_MIN_DF)
    )
    mean = F.col("total_tf") * 1.0 / F.col("n_docs")
    return (
        stats.crossJoin(F.broadcast(n))
        .select(
            "term",
            "df",
            "total_tf",
            F.round(
                (F.col("total_tf2") * 1.0 / F.col("n_docs") - mean * mean) / mean, 6
            ).alias("dispersion"),
        )
        .orderBy(F.desc("dispersion"), "term")
        .limit(_BURST_TOPK)
    )


# ---------------------------------------------------------------------------
# corpus language diversity (mixture audit)
# ---------------------------------------------------------------------------


@query(
    "lang_diversity_by_source",
    oracle="""
    WITH cnt AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
    ),
    tot AS (
      SELECT source, sum(n) AS nd, count(*) AS nl, sum(n * (n - 1)) AS ss
      FROM cnt GROUP BY source
    ),
    sh AS (  -- per-lang Shannon terms in 6dp micro-units (order-proof sum)
      SELECT c.source,
             CAST(round(-(c.n * 1.0 / t.nd) * ln(c.n * 1.0 / t.nd) * 1000000)
                  AS BIGINT) AS hu
      FROM cnt c JOIN tot t USING (source)
    )
    SELECT t.source, CAST(t.nd AS BIGINT) AS n_docs, t.nl AS n_langs,
           round(t.ss * 1.0 / (t.nd * (t.nd - 1)), 6) AS simpson,
           round(sum(sh.hu) / 1000000.0, 6) AS shannon,
           round(sum(sh.hu) / 1000000.0 / ln(t.nl), 6) AS evenness
    FROM tot t JOIN sh USING (source)
    GROUP BY t.source, t.nd, t.nl, t.ss
    ORDER BY t.source
    """,
    description=(
        "Language-diversity audit per source: Simpson index (exact "
        "integer rational), Shannon entropy and Pielou evenness — the "
        "multilingual-mixture balance check run before setting sampling "
        "temperatures"
    ),
)
def lang_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson / Shannon / evenness per source.

    Scale shape: one (source, lang) count (map-side combined), one
    k-bounded source aggregate, and a broadcast of the per-source
    totals back onto the tiny count table — the corpus is touched once.
    Shannon terms sum as 6dp micro-unit BIGINTs (order-independent);
    Simpson is a pure integer rational so it is exact cross-engine.
    """
    (documents,) = load(spark, sf_dir, "documents")
    cnt = documents.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("source").agg(
        F.sum("n").alias("nd"),
        F.count(F.lit(1)).alias("nl"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("ss"),
    )
    p = F.col("n") / F.col("nd")
    sh = (
        cnt.join(F.broadcast(tot), "source")
        .select(
            "source", "nd", "nl", "ss",
            F.round(-p * F.log(p) * 1e6).cast("bigint").alias("hu"),
        )
    )
    return (
        sh.groupBy("source", "nd", "nl", "ss")
        .agg(F.sum("hu").alias("husum"))
        .select(
            "source",
            F.col("nd").alias("n_docs"),
            F.col("nl").alias("n_langs"),
            F.round(F.col("ss") / (F.col("nd") * (F.col("nd") - 1)), 6).alias("simpson"),
            F.round(F.col("husum") / 1e6, 6).alias("shannon"),
            F.round(F.col("husum") / 1e6 / F.log(F.col("nl").cast("double")), 6).alias("evenness"),
        )
        .orderBy("source")
    )


@query(
    "skipgram_training_pairs",
    bench=True,
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    pairs AS (
      SELECT a.w AS w_center, b.w AS w_context, count(*) AS cnt
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
      GROUP BY 1, 2
    )
    SELECT w_center, w_context, CAST(cnt AS BIGINT) AS cnt
    FROM pairs ORDER BY cnt DESC, w_center, w_context LIMIT 30
    """,
    description=(
        "word2vec-style skip-gram pair generation (window 2, forward "
        "offsets): corpus-wide (center, context) co-occurrence counts, "
        "top 30 — the training-pair extraction stage of embedding "
        "pipelines, as a candidate-proportional position equi-join"
    ),
)
def skipgram_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each token explodes to its ≤2 forward target positions and
    equi-joins back on (doc_id, pos) — cost is window x corpus tokens,
    never per-doc quadratic (the shape that survives long documents at
    100 TB). Forward-only offsets count each unordered co-occurrence
    once per direction, the skip-gram convention."""
    (documents,) = load(spark, sf_dir, "documents")
    ncpu = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Pairs explode DOC-LOCALLY from the token array (each token pairs
    # with the next <= 2 tokens via slice — still linear per token, the
    # same basket-local shape as part_cooccurrence_lift), so the only
    # exchange left is the pair-count groupBy. The r6 plan posexploded
    # to a token table and self-joined it on (doc_id, pos) — a join of
    # two corpus-token streams the array form never materializes (guide
    # §2.4; r7 A/B 0.92 -> 0.78 s at sf0.1, identical rows). The cache
    # is the usual CollapseProject barrier (split() would inline into
    # the slice lambda).
    toks = (
        documents.select("doc_id", F.split("text", " ").alias("toks"))
        .repartition(ncpu, "doc_id")
        .cache()
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "flatten(transform(toks, (x, i) ->"
                " transform(slice(toks, i + 2, 2), y ->"
                " struct(x as w_center, y as w_context))))"
            )
        ).alias("e")
    )
    return (
        pairs.select("e.w_center", "e.w_context")
        .groupBy("w_center", "w_context")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w_center", "w_context")
        .limit(30)
    )


@query(
    "langid_confusion_matrix",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> x IN ({_markers_sql_list()}))) * 1.0
               / len(toks) AS marker_ratio
      FROM t
    ), pred AS (
      SELECT lang AS labeled_lang,
             CASE WHEN marker_ratio >= 0.05 THEN 'en' ELSE 'und' END AS pred_lang
      FROM scored
    ), m AS (
      SELECT labeled_lang, pred_lang, count(*) AS n_docs FROM pred GROUP BY 1, 2
    ), tot AS (
      SELECT labeled_lang, sum(n_docs) AS label_total FROM m GROUP BY 1
    )
    SELECT m.labeled_lang, m.pred_lang, CAST(m.n_docs AS BIGINT) AS n_docs,
           round(m.n_docs * 1.0 / t.label_total, 6) AS share_of_label
    FROM m JOIN tot t ON m.labeled_lang = t.labeled_lang
    ORDER BY m.labeled_lang, m.pred_lang
    """,
    description=(
        "Language-ID evaluation: confusion matrix of the marker-ratio "
        "classifier's predictions vs the labeled lang column, with "
        "per-label shares — the quality gate for text_lang_id"
    ),
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolls up the REGISTERED ``text_lang_id`` builder, so classifier
    and evaluation can never drift apart (the registry-composition
    pattern from NOTES round 3)."""
    pred = text_lang_id(spark, sf_dir).select("labeled_lang", "pred_lang")
    m = pred.groupBy("labeled_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = m.groupBy("labeled_lang").agg(F.sum("n_docs").alias("label_total"))
    return (
        m.join(tot, "labeled_lang")
        .select(
            "labeled_lang", "pred_lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round(F.col("n_docs") * 1.0 / F.col("label_total"), 6).alias(
                "share_of_label"
            ),
        )
        .orderBy("labeled_lang", "pred_lang")
    )


@query(
    "corpus_token_concentration",
    oracle="""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS nt FROM documents
    ),
    tot AS (SELECT count(*) AS nd, sum(nt) AS t FROM d),
    r AS (
      SELECT nt, row_number() OVER (ORDER BY nt DESC, doc_id) AS rk FROM d
    ),
    c AS (SELECT rk, sum(nt) OVER (ORDER BY rk) AS cum FROM r),
    pcts AS (SELECT unnest([1, 5, 10, 25, 50]) AS pct),
    k AS (
      SELECT pct, greatest(1, CAST(floor(nd * pct / 100) AS BIGINT)) AS kd,
             t
      FROM pcts CROSS JOIN tot
    )
    SELECT k.pct, k.kd AS top_docs, round(c.cum * 1.0 / k.t, 6) AS token_share
    FROM k JOIN c ON c.rk = k.kd
    ORDER BY k.pct
    """,
    description=(
        "Corpus heavy-tail audit: what fraction of all tokens the top "
        "1/5/10/25/50% longest documents contribute — the documents "
        "twin of revenue_concentration, the first thing to check before "
        "length-based sampling or packing"
    ),
)
def corpus_token_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank docs by token count (total tie-break by doc_id), cumulative
    token share at the 1/5/10/25/50% marks. The global window runs over
    one row per DOCUMENT with two ints — at 100 TB this is the already-
    reduced length table, not the corpus."""
    (documents,) = load(spark, sf_dir, "documents")
    d = documents.select("doc_id", F.size(F.split("text", " ")).alias("nt"))
    tot = d.agg(F.count(F.lit(1)).alias("nd"), F.sum("nt").alias("t"))
    w = Window.orderBy(F.col("nt").desc(), "doc_id")
    c = d.select(
        F.row_number().over(w).alias("rk"),
        F.sum("nt").over(w).alias("cum"),
    )
    pcts = spark.createDataFrame([(p,) for p in (1, 5, 10, 25, 50)], "pct int")
    k = pcts.crossJoin(F.broadcast(tot)).select(
        "pct",
        F.greatest(F.lit(1), F.floor(F.col("nd") * F.col("pct") / 100))
        .cast("bigint").alias("kd"),
        "t",
    )
    return (
        k.join(c, k["kd"] == c["rk"])
        .select("pct", F.col("kd").alias("top_docs"),
                F.round(F.col("cum") * 1.0 / F.col("t"), 6).alias("token_share"))
        .orderBy("pct")
    )


@query(
    "doclen_quantiles_by_source",
    oracle="""
    WITH d AS (
      SELECT source, len(string_split(text, ' ')) AS nt FROM documents
    ),
    byv AS (SELECT source, nt, count(*) AS c FROM d GROUP BY source, nt),
    cum AS (
      SELECT source, nt, c,
             sum(c) OVER (PARTITION BY source ORDER BY nt) AS cc,
             sum(c) OVER (PARTITION BY source) AS n
      FROM byv
    ),
    qs AS (SELECT unnest([25, 50, 75]) AS q),
    t AS (
      SELECT c.source, q.q, c.n,
             CAST(ceil(q.q * c.n / 100.0) AS BIGINT) AS target
      FROM (SELECT DISTINCT source, n FROM cum) c CROSS JOIN qs q
    ),
    hit AS (
      SELECT t.source, t.q, t.n, min(c.nt) AS v
      FROM t JOIN cum c ON c.source = t.source AND c.cc >= t.target
      GROUP BY t.source, t.q, t.n
    )
    SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
           CAST(max(CASE WHEN q = 25 THEN v END) AS BIGINT) AS p25_tokens,
           CAST(max(CASE WHEN q = 50 THEN v END) AS BIGINT) AS p50_tokens,
           CAST(max(CASE WHEN q = 75 THEN v END) AS BIGINT) AS p75_tokens
    FROM hit GROUP BY source ORDER BY source
    """,
    description=(
        "Per-source document-length quartiles (exact type-1 order "
        "statistics over the distinct-length domain) — the first look "
        "at a new source before packing/chunking decisions; integers "
        "end to end"
    ),
)
def doclen_quantiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact quantiles with NO per-row sort: lengths reduce to
    a (source, length) count table, a per-source cumulative walks the
    distinct-length domain, and each quartile is the first length whose
    cumulative count reaches ceil(q·n) — shuffle width is the length
    domain per source, never the corpus."""
    (documents,) = load(spark, sf_dir, "documents")
    d = documents.select("source", F.size(F.split("text", " ")).alias("nt"))
    byv = d.groupBy("source", "nt").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("source").orderBy("nt")
    cum = byv.select(
        "source", "nt",
        F.sum("c").over(w).alias("cc"),
        F.sum("c").over(Window.partitionBy("source")).alias("n"),
    )
    qs = spark.createDataFrame([(25,), (50,), (75,)], "q int")
    t = (
        cum.select("source", "n").distinct()
        .crossJoin(F.broadcast(qs))
        .select(
            "source", "q", "n",
            F.ceil(F.col("q") * F.col("n") / 100.0).cast("bigint").alias("target"),
        )
    )
    hit = (
        t.join(cum.select("source", "nt", "cc"), "source")
        .filter(F.col("cc") >= F.col("target"))
        .groupBy("source", "q", "n")
        .agg(F.min("nt").alias("v"))
    )
    pick = lambda q: F.max(F.when(F.col("q") == q, F.col("v"))).cast("bigint")
    return (
        hit.groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            pick(25).alias("p25_tokens"),
            pick(50).alias("p50_tokens"),
            pick(75).alias("p75_tokens"),
        )
        .orderBy("source")
    )
