"""Training-data curation extensions (north-star M6, second wave).

Five pipeline operators a 100 TB pretraining-data build needs beyond
dedup/similarity/text-analysis:

- **decontaminate_documents** — benchmark n-gram overlap: flag training
  docs sharing too many 5-grams with a held-out eval set. The join is on
  the gram string, so cost is bounded by gram collisions; the benchmark
  side is broadcast (eval sets are tiny next to the corpus).
- **repetition_signals** — Gopher-style per-doc repetition fractions
  (top-word, top-bigram). explode + two-level groupBy keyed by
  (doc_id, gram): map-side partial agg keeps the shuffle proportional to
  distinct grams, not tokens.
- **stratified_sample_documents** — deterministic per-language quota
  sampling via md5 buckets (no RNG, stable across engines/reruns).
- **pack_sequences** — concat-and-chunk sequence packing: per
  (source, shard) token streams cut into fixed-capacity chunks by
  running offset. Sharding bounds the sequential (window) chain per key,
  which is what keeps packing parallel at 100 TB.
- **quantize_embeddings** — int8 symmetric quantization of the embedding
  column with per-vector scale + integer checksums (the storage-halving
  prep step for large ANN indexes).

Everything is Catalyst-native (split/explode/window/higher-order fns);
all hashes are md5-derived so each op is DuckDB-oracle-verifiable.
Reference anchor: the multilingual text surface (reddit bodies,
``reddit.value.json:75-78``) and keyed-partition model
(``sample-data/variables.env:3-10``) — these are its bulk-curation layer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

# ---------------------------------------------------------------------------
# decontamination — benchmark n-gram overlap
# ---------------------------------------------------------------------------

_BENCH_SOURCE = "src0"  # held-out "benchmark" slice of the corpus
_NGRAM = 5
_CONTAM_THRESHOLD = 0.5

# 5-gram construction, guarded for short docs (ANSI element_at throws past end)
_GRAMS_EXPR = """
  CASE WHEN size(toks) >= 5
       THEN transform(sequence(1, size(toks) - 4),
                      i -> concat_ws(' ', element_at(toks, i),
                                          element_at(toks, i + 1),
                                          element_at(toks, i + 2),
                                          element_at(toks, i + 3),
                                          element_at(toks, i + 4)))
       ELSE array()
  END
"""


def _doc_grams(spark: SparkSession, sf_dir: str, hashed: bool = False) -> DataFrame:
    """Distinct (doc_id, source, gram) rows, parallelized before the per-doc work.

    Same shape as dedup._doc_shingles: repartition by doc_id first (a single
    parquet file would otherwise serialize the gram CPU onto one task), cache
    the token projection as an optimizer barrier (CollapseProject would inline
    split() into every element_at — quadratic per doc), then explode +
    exchange-free distinct (doc_id partitioning satisfies the (doc_id, gram)
    clustered distribution).
    """
    (documents,) = load(spark, sf_dir, "documents")
    ncpu = int(spark.conf.get("spark.sql.shuffle.partitions"))
    toks = (
        documents.select("doc_id", "source", F.split("text", " ").alias("toks"))
        .repartition(ncpu, "doc_id")
        .cache()
    )
    exploded = toks.select(
        "doc_id", "source", F.expr(_GRAMS_EXPR).alias("grams")
    ).select("doc_id", "source", F.explode("grams").alias("gram"))
    # hashed=True: xxhash64 the gram BEFORE the distinct for callers that
    # only test gram identity (decontaminate_documents' membership join)
    # — the dedup aggregate, the broadcast set, and the probe join all
    # run on primitive longs instead of ~30-char strings (same 64-bit
    # collision argument as dedup._doc_shingles(hashed=True), ~1e-9
    # here and oracle-checked). Callers that md5 the gram text
    # (source_overlap_matrix — oracle-pinned) keep the default.
    if hashed:
        exploded = exploded.select(
            "doc_id", "source", F.xxhash64("gram").alias("gram")
        )
    return exploded.distinct()


@query(
    "decontaminate_documents",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, source, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             || ' ' || toks[i+3] || ' ' || toks[i+4] AS gram
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i)
      WHERE i <= len(toks) - 4
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE source = '{_BENCH_SOURCE}'),
    cand AS (SELECT doc_id, gram FROM grams WHERE source <> '{_BENCH_SOURCE}'),
    scored AS (
      SELECT c.doc_id,
             count(*) AS n_grams,
             count(b.gram) AS n_hit
      FROM cand c LEFT JOIN bench b USING (gram)
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_grams, n_hit,
           round(n_hit * 1.0 / n_grams, 6) AS overlap_ratio,
           CASE WHEN n_hit * 1.0 / n_grams >= {_CONTAM_THRESHOLD} THEN 1 ELSE 0 END
             AS contaminated
    FROM scored
    ORDER BY doc_id
    """,
    description=(
        "Benchmark decontamination: 5-gram overlap of each training doc "
        "against a held-out eval slice; flag docs above the overlap threshold"
    ),
    bench=True,
)
def decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination scan (the pre-training hygiene step).

    Scale: the benchmark gram set is broadcast — eval suites are thousands
    of documents against a 100 TB corpus, so the candidate side never
    shuffles; per-doc scoring is a map-side-combinable groupBy(doc_id).
    Docs shorter than the gram width produce no grams and drop out (same
    WHERE in the oracle).
    """
    grams = _doc_grams(spark, sf_dir, hashed=True)
    bench = (
        grams.filter(F.col("source") == _BENCH_SOURCE)
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    cand = grams.filter(F.col("source") != _BENCH_SOURCE).select("doc_id", "gram")
    scored = (
        cand.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hit"),
        )
    )
    ratio = F.col("n_hit") / F.col("n_grams")
    return scored.select(
        "doc_id",
        "n_grams",
        "n_hit",
        F.round(ratio, 6).alias("overlap_ratio"),
        F.when(ratio >= _CONTAM_THRESHOLD, 1).otherwise(0).alias("contaminated"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# repetition signals — Gopher-style quality heuristics
# ---------------------------------------------------------------------------


@query(
    "repetition_signals",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    words AS (
      SELECT doc_id, unnest(toks) AS w FROM tok
    ),
    word_counts AS (
      SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
    ),
    word_top AS (
      SELECT doc_id, max(c) AS top_c, sum(c) AS n_tokens
      FROM word_counts GROUP BY doc_id
    ),
    bigrams AS (
      SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i)
      WHERE i <= len(toks) - 1
    ),
    bigram_counts AS (
      SELECT doc_id, g, count(*) AS c FROM bigrams GROUP BY doc_id, g
    ),
    bigram_top AS (
      SELECT doc_id, max(c) AS top_c, sum(c) AS n_bigrams
      FROM bigram_counts GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(w.n_tokens AS BIGINT) AS n_tokens,
           round(w.top_c * 1.0 / w.n_tokens, 6) AS top_word_frac,
           round(b.top_c * 1.0 / b.n_bigrams, 6) AS top_bigram_frac,
           CASE WHEN w.top_c * 1.0 / w.n_tokens > 0.20
                  OR b.top_c * 1.0 / b.n_bigrams > 0.18 THEN 1 ELSE 0 END
             AS repetitive
    FROM word_top w JOIN bigram_top b USING (doc_id)
    ORDER BY doc_id
    """,
    description=(
        "Per-doc repetition fractions (top word / top bigram share) with a "
        "repetitive flag — Gopher-style quality gate signals"
    ),
    bench=True,
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals per document.

    Scale: both counts go explode → groupBy(doc_id, gram) → groupBy(doc_id).
    Partial (map-side) aggregation collapses repeats before the shuffle, so
    shuffle volume is distinct grams per doc, and the final per-doc reduce
    is a same-key reshuffle Catalyst plans as one exchange on doc_id that
    both branches share via the repartition in the token projection.
    """
    (documents,) = load(spark, sf_dir, "documents")
    ncpu = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # cache barrier: see dedup._doc_shingles (CollapseProject would inline
    # split() into the bigram lambda, re-tokenizing per element)
    toks = (
        documents.select("doc_id", F.split("text", " ").alias("toks"))
        .repartition(ncpu, "doc_id")
        .cache()
    )
    word_top = (
        toks.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("w_top_c"), F.sum("c").alias("n_tokens"))
    )
    bigram_expr = """
      CASE WHEN size(toks) >= 2
           THEN transform(sequence(1, size(toks) - 1),
                          i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))
           ELSE array()
      END
    """
    bigram_top = (
        toks.select("doc_id", F.explode(F.expr(bigram_expr)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("b_top_c"), F.sum("c").alias("n_bigrams"))
    )
    word_frac = F.col("w_top_c") / F.col("n_tokens")
    bigram_frac = F.col("b_top_c") / F.col("n_bigrams")
    return (
        word_top.join(bigram_top, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.round(word_frac, 6).alias("top_word_frac"),
            F.round(bigram_frac, 6).alias("top_bigram_frac"),
            F.when((word_frac > 0.20) | (bigram_frac > 0.18), 1)
            .otherwise(0)
            .alias("repetitive"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# stratified sampling — deterministic per-language quotas
# ---------------------------------------------------------------------------

# keep-rates per language: upsample nothing, downsample the head language
_LANG_RATES = {"en": 0.50, "de": 1.00, "es": 1.00, "fr": 1.00, "zh": 0.75}
_DEFAULT_RATE = 0.25


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in sorted(_LANG_RATES.items())
    )
    return f"CASE lang {whens} ELSE {_DEFAULT_RATE} END"


@query(
    "stratified_sample_documents",
    oracle=f"""
    WITH rated AS (
      SELECT lang,
             {_rate_case_sql()} AS rate,
             ('0x' || substr(md5('strat:' || doc_id::VARCHAR), 1, 15))::BIGINT % 10000
               AS b
      FROM documents
    )
    SELECT lang,
           count(*) AS n_in,
           CAST(sum(CASE WHEN b < rate * 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(sum(CASE WHEN b < rate * 10000 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS kept_frac
    FROM rated
    GROUP BY lang
    ORDER BY lang
    """,
    description=(
        "Deterministic stratified sampling: per-language keep-rates applied "
        "via md5 buckets (no RNG — stable under reruns and engine swaps), "
        "with a per-stratum audit"
    ),
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota sampling per language stratum (corpus rebalancing op).

    Scale: the rates table is a broadcast join (a handful of rows); the
    keep/drop decision is a pure per-row projection — no shuffle to sample
    at any scale. The groupBy here is only the audit; the write path would
    filter on ``kept`` and stream out.
    """
    (documents,) = load(spark, sf_dir, "documents")
    rates = documents.sparkSession.createDataFrame(
        [(lang, rate) for lang, rate in sorted(_LANG_RATES.items())], "lang string, rate double"
    )
    bucket = (
        F.expr(
            "cast(conv(substr(md5(cast(concat('strat:', cast(doc_id as string)) as binary)),"
            " 1, 15), 16, 10) as bigint)"
        )
        % 10000
    )
    rated = (
        documents.join(F.broadcast(rates), "lang", "left")
        .withColumn("rate", F.coalesce("rate", F.lit(_DEFAULT_RATE)))
        .withColumn("b", bucket)
    )
    kept = F.when(F.col("b") < F.col("rate") * 10000, 1).otherwise(0)
    return (
        rated.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_in"),
            F.sum(kept).alias("n_kept"),
            F.round(F.sum(kept) / F.count(F.lit(1)), 6).alias("kept_frac"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# sequence packing — concat-and-chunk by running token offset
# ---------------------------------------------------------------------------

_PACK_CAPACITY = 128  # tokens per packed sequence (small to exercise chunking at test SF)
_PACK_SHARDS = 4


@query(
    "pack_sequences",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             ('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 15))::BIGINT
               % {_PACK_SHARDS} AS shard,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    offs AS (
      SELECT source, shard, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok AS start_off
      FROM tok
    ),
    chunks AS (
      SELECT source, shard, start_off // {_PACK_CAPACITY} AS chunk_id, doc_id, n_tok
      FROM offs
    )
    SELECT source, shard, CAST(chunk_id AS BIGINT) AS chunk_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc_id
    FROM chunks
    GROUP BY source, shard, chunk_id
    ORDER BY source, shard, chunk_id
    """,
    description=(
        "Sequence packing: concat-and-chunk — per (source, shard) token "
        "streams cut into fixed-capacity training sequences by running "
        "offset; docs assigned to the chunk containing their start"
    ),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing (the pretraining batch-prep step).

    Scale: a window cumsum is sequential per partition key — that's why
    the stream is sharded by md5(doc_id) first: parallelism is
    sources × shards regardless of corpus size, and each chain stays
    short. Chunk assignment is then a pure projection; the groupBy is
    map-side combinable on the already-clustered (source, shard) keys.
    """
    (documents,) = load(spark, sf_dir, "documents")
    shard = (
        F.expr(
            "cast(conv(substr(md5(cast(concat('shard:', cast(doc_id as string)) as binary)),"
            " 1, 15), 16, 10) as bigint)"
        )
        % _PACK_SHARDS
    )
    tok = documents.select(
        "doc_id",
        "source",
        shard.alias("shard"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = tok.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    chunks = offs.withColumn(
        "chunk_id", F.floor(F.col("start_off") / _PACK_CAPACITY)
    )
    return (
        chunks.groupBy("source", "shard", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .orderBy("source", "shard", "chunk_id")
    )


# ---------------------------------------------------------------------------
# embedding quantization — int8 symmetric, per-vector scale
# ---------------------------------------------------------------------------


@query(
    "quantize_embeddings",
    oracle="""
    WITH scaled AS (
      SELECT vec_id, label,
             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) / 127.0
               AS scale,
             embedding
      FROM embeddings
    ),
    quant AS (
      SELECT vec_id, label, scale,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))
               AS q
      FROM scaled
      WHERE scale > 0
    )
    SELECT vec_id, label,
           round(scale, 6) AS scale_r,
           CAST(list_sum(q) AS BIGINT) AS sum_q,
           CAST(list_sum(list_transform(q, v -> abs(v))) AS BIGINT) AS l1_q,
           list_max(q) AS max_q
    FROM quant
    ORDER BY vec_id
    """,
    description=(
        "Int8 symmetric embedding quantization (per-vector scale) with "
        "integer checksums — the storage-halving prep for billion-vector "
        "ANN indexes"
    ),
    bench=True,
)
def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization audit.

    Scale: pure per-row higher-order-function math (no shuffle, no UDF);
    the real write path would emit ``q`` as array<tinyint> + scale float.
    floor(x + 0.5) is used instead of round() because both engines define
    floor identically (round() half-away ties can differ per dialect);
    all element math is widened to double so Spark and DuckDB run the
    same IEEE ops.
    """
    (embeddings,) = load(spark, sf_dir, "embeddings")
    scale = (
        F.array_max(F.transform("embedding", lambda x: F.abs(x))).cast("double") / 127.0
    )
    scaled = embeddings.select("vec_id", "label", scale.alias("scale"), "embedding")
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") / F.col("scale") + 0.5).cast("bigint"),
    )
    quant = scaled.filter(F.col("scale") > 0).select(
        "vec_id", "label", "scale", q.alias("q")
    )
    return quant.select(
        "vec_id",
        "label",
        F.round("scale", 6).alias("scale_r"),
        F.aggregate("q", F.lit(0).cast("bigint"), lambda acc, v: acc + v).alias("sum_q"),
        F.aggregate("q", F.lit(0).cast("bigint"), lambda acc, v: acc + F.abs(v)).alias(
            "l1_q"
        ),
        F.array_max("q").alias("max_q"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# source mixing — downsample sources to a target token budget
# ---------------------------------------------------------------------------

_MIX_BUDGET_FRAC = 0.5  # total budget = 50% of corpus tokens, split evenly


@query(
    "mix_sources_to_budget",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
             ('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 15))::BIGINT % 10000
               AS b
      FROM documents
    ),
    totals AS (
      SELECT source, sum(n_tok) AS src_tokens FROM tok GROUP BY source
    ),
    budget AS (
      SELECT CAST(floor(sum(src_tokens) * {_MIX_BUDGET_FRAC}
                        / count(*)) AS BIGINT) AS per_source
      FROM totals
    ),
    rated AS (
      SELECT t.source, t.src_tokens,
             least(CAST(floor(b.per_source * 10000.0 / t.src_tokens) AS BIGINT),
                   10000) AS thresh
      FROM totals t CROSS JOIN budget b
    )
    SELECT k.source,
           CAST(r.src_tokens AS BIGINT) AS n_tokens_in,
           r.thresh AS keep_per_10k,
           count(*) FILTER (WHERE k.b < r.thresh) AS n_docs_kept,
           CAST(coalesce(sum(k.n_tok) FILTER (WHERE k.b < r.thresh), 0)
             AS BIGINT) AS n_tokens_kept
    FROM tok k JOIN rated r ON k.source = r.source
    GROUP BY k.source, r.src_tokens, r.thresh
    ORDER BY k.source
    """,
    description=(
        "Pretraining source mixing: downsample each source to an equal "
        "share of a corpus-level token budget — integer keep-thresholds "
        "(per-10k md5 buckets) so the mixture is deterministic and "
        "engine-stable"
    ),
)
def mix_sources_to_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-mixture op: two aggregate passes (per-source token totals,
    corpus budget) produce integer keep-thresholds; the keep decision is a
    per-row md5-bucket compare against the broadcast per-source threshold
    — no shuffle of the corpus to sample at any scale. Thresholds are
    integers (floor of one double division) so Spark and DuckDB agree
    exactly; the groupBy here is the audit.
    """
    (documents,) = load(spark, sf_dir, "documents")
    bucket = (
        F.expr(
            "cast(conv(substr(md5(cast(concat('mix:', cast(doc_id as string)) as binary)),"
            " 1, 15), 16, 10) as bigint)"
        )
        % 10000
    )
    tok = documents.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    ).withColumn("b", bucket)
    totals = tok.groupBy("source").agg(F.sum("n_tok").alias("src_tokens"))
    budget = totals.agg(
        F.floor(F.sum("src_tokens") * _MIX_BUDGET_FRAC / F.count(F.lit(1)))
        .cast("bigint")
        .alias("per_source")
    )
    rated = totals.crossJoin(F.broadcast(budget)).select(
        "source",
        "src_tokens",
        F.least(
            F.floor(F.col("per_source") * 10000.0 / F.col("src_tokens")).cast("bigint"),
            F.lit(10000).cast("bigint"),
        ).alias("thresh"),
    )
    kept = F.when(F.col("b") < F.col("thresh"), 1).otherwise(0)
    return (
        tok.join(F.broadcast(rated), "source")
        .groupBy("source", "src_tokens", "thresh")
        .agg(
            F.sum(kept).alias("n_docs_kept"),
            F.coalesce(F.sum(F.when(F.col("b") < F.col("thresh"), F.col("n_tok"))), F.lit(0)).alias(
                "n_tokens_kept"
            ),
        )
        .select(
            "source",
            F.col("src_tokens").alias("n_tokens_in"),
            F.col("thresh").alias("keep_per_10k"),
            "n_docs_kept",
            "n_tokens_kept",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# PII / pattern redaction — scrub + audit counts
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_NUM = r"[0-9]+"


@query(
    "redact_pii_events",
    oracle=f"""
    SELECT event_id,
           regexp_replace(regexp_replace(props, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                          '{_PII_NUM}', '<NUM>', 'g') AS props_redacted,
           len(regexp_extract_all(props, '{_PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(props, '{_PII_NUM}')) AS n_numbers
    FROM events
    ORDER BY event_id
    """,
    description=(
        "PII/pattern redaction over event payloads: email + numeric-"
        "identifier masking with per-row audit counts — the pretraining "
        "scrubbing pass (emails first so their digits don't double-mask)"
    ),
)
def redact_pii_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure Catalyst regexp_replace/regexp_extract_all — no Python in the
    row path, fully codegen'd, zero shuffles except the output ordering
    (which a real pipeline drops). Patterns are passed as F.lit columns:
    Spark SQL STRING literals eat backslashes (NOTES.md edge #4), so the
    regex never transits SQL-literal parsing.
    """
    (events,) = load(spark, sf_dir, "events")
    email, num = F.lit(_PII_EMAIL), F.lit(_PII_NUM)
    return events.select(
        "event_id",
        F.regexp_replace(
            F.regexp_replace("props", email, F.lit("<EMAIL>")), num, F.lit("<NUM>")
        ).alias("props_redacted"),
        F.size(F.regexp_extract_all("props", email, F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("props", num, F.lit(0))).alias("n_numbers"),
    ).orderBy("event_id")


@query(
    "source_overlap_matrix",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ),
    h AS (
      SELECT DISTINCT source,
             md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                 || toks[i+3] || ' ' || toks[i+4]) AS th
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i)
      WHERE i <= len(toks) - 4
    ),
    per AS (SELECT source, count(*) AS n_distinct FROM h GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_shared
      FROM h a JOIN h b ON a.th = b.th AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT p.source_a, p.source_b, p.n_shared,
           round(p.n_shared * 1.0 / pa.n_distinct, 6) AS containment_a,
           round(p.n_shared * 1.0 / pb.n_distinct, 6) AS containment_b
    FROM pairs p
    JOIN per pa ON pa.source = p.source_a
    JOIN per pb ON pb.source = p.source_b
    ORDER BY p.source_a, p.source_b
    """,
    description=(
        "Cross-source duplication matrix: distinct 5-grams shared "
        "between source pairs with per-side containment ratios — the "
        "provenance/leakage dashboard"
    ),
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources share content: the corpus-sized work is one
    distinct over (source, md5(gram)) — fixed 32-char keys, map-side
    combinable; the pair join runs on gram-hash collisions only (truly
    shared text), so its cost is the shared mass, not |docs|² or
    |sources|²×grams. Containment (not just jaccard) is emitted because
    ingestion decisions are asymmetric: 'b is 90% contained in a' means
    drop b, regardless of a's size. Gram hashes reuse the
    decontaminate/_doc_grams construction (5-token windows).
    """
    grams = _doc_grams(spark, sf_dir)
    h = grams.select("source", F.md5(F.col("gram").cast("binary")).alias("th")).distinct()
    per = h.groupBy("source").agg(F.count(F.lit(1)).alias("n_distinct"))
    a = h.select(F.col("source").alias("source_a"), "th")
    b = h.select(F.col("source").alias("source_b"), "th")
    pairs = (
        a.join(b, "th")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pairs.join(
            F.broadcast(per.withColumnRenamed("source", "source_a")), "source_a"
        )
        .withColumnRenamed("n_distinct", "na")
        .join(F.broadcast(per.withColumnRenamed("source", "source_b")), "source_b")
        .withColumnRenamed("n_distinct", "nb")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(F.col("n_shared") / F.col("na"), 6).alias("containment_a"),
            F.round(F.col("n_shared") / F.col("nb"), 6).alias("containment_b"),
        )
        .orderBy("source_a", "source_b")
    )


_WS_K = 25  # sample size


@query(
    "weighted_sample_documents",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, n_chars,
             (('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 13))::BIGINT)
               / 4503599627370496.0 AS unif
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, n_chars,
             CAST(round(ln(unif) / n_chars * 1000000000, 0) AS BIGINT) AS key_u
      FROM u WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, key_u
    FROM keyed
    ORDER BY key_u DESC, doc_id
    LIMIT {_WS_K}
    """,
    description=(
        "Weighted sampling without replacement (Efraimidis-Spirakis "
        "exponential keys, weight = doc length): deterministic md5 "
        "uniforms, one-pass top-k — the quality-weighted subsample shape"
    ),
)
def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed weighted sampling in ONE pass, no RNG state: each row
    draws its uniform from md5(doc_id) (reproducible across engines,
    reruns, and partitionings), the E-S key ln(u)/w makes top-k by key
    a weight-proportional sample without replacement, and the top-k is
    a TakeOrderedAndProject — per-partition heads merge at the driver,
    nothing shuffles. Keys are fixed to integer nano-units so ranking
    ties are impossible to get wrong across engines; doc_id breaks the
    (measure-zero) exact ties.
    """
    (documents,) = load(spark, sf_dir, "documents")
    unif = (
        "cast(conv(substr(md5(cast(concat('ws:', cast(doc_id as string)) "
        "as binary)), 1, 13), 16, 10) as bigint) / 4503599627370496.0"
    )
    keyed = documents.where(F.col("n_chars") > 0).select(
        "doc_id",
        "n_chars",
        F.round(F.log(F.expr(unif)) / F.col("n_chars") * 1e9, 0)
        .cast("bigint")
        .alias("key_u"),
    )
    return keyed.orderBy(F.desc("key_u"), "doc_id").limit(_WS_K)


@query(
    "lang_source_independence",
    oracle="""
    WITH cell AS (
      SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source
    ),
    rowt AS (SELECT lang, sum(o) AS rn FROM cell GROUP BY lang),
    colt AS (SELECT source, sum(o) AS cn FROM cell GROUP BY source),
    tot AS (SELECT sum(o) AS n FROM cell),
    terms AS (
      SELECT c.lang, c.source, c.o,
             round(r.rn * ct.cn * 1.0 / t.n, 6) AS expected,
             CAST(round(
               (c.o - r.rn * ct.cn * 1.0 / t.n)
               * (c.o - r.rn * ct.cn * 1.0 / t.n)
               / (r.rn * ct.cn * 1.0 / t.n) * 1000000, 0) AS BIGINT) AS chi_u
      FROM cell c
      JOIN rowt r ON r.lang = c.lang
      JOIN colt ct ON ct.source = c.source
      CROSS JOIN tot t
    ),
    stat AS (
      SELECT round(sum(chi_u) / 1000000.0, 4) AS chi2,
             (SELECT (count(*) - 1) FROM rowt)
               * (SELECT (count(*) - 1) FROM colt) AS dof
      FROM terms
    )
    SELECT s.chi2, s.dof, t.lang, t.source, t.o, t.expected,
           round(t.chi_u / 1000000.0, 4) AS cell_chi2
    FROM stat s CROSS JOIN terms t
    ORDER BY t.chi_u DESC, t.lang, t.source
    LIMIT 10
    """,
    description=(
        "Chi-square independence screen for language x source: the "
        "global statistic plus the 10 most over/under-represented "
        "cells — the corpus-mix drift detector"
    ),
)
def lang_source_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the language mix the same across sources? One groupBy builds
    the contingency table; row/column marginals and the total are tiny
    broadcast dims; each cell's chi-square term is fixed to integer
    micro-units before summing (order-independent), and the top
    contributing cells are returned alongside the statistic — the
    actionable part of the test. At any scale the only corpus-sized
    work is the first groupBy.
    """
    (documents,) = load(spark, sf_dir, "documents")
    cell = documents.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rowt = cell.groupBy("lang").agg(F.sum("o").alias("rn"))
    colt = cell.groupBy("source").agg(F.sum("o").alias("cn"))
    tot = cell.agg(F.sum("o").alias("n"))
    exp_raw = F.col("rn") * F.col("cn") / F.col("n")
    terms = (
        cell.join(F.broadcast(rowt), "lang")
        .join(F.broadcast(colt), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "o",
            F.round(exp_raw, 6).alias("expected"),
            F.round((F.col("o") - exp_raw) * (F.col("o") - exp_raw) / exp_raw * 1e6, 0)
            .cast("bigint")
            .alias("chi_u"),
        )
    )
    dof = (
        rowt.agg((F.count(F.lit(1)) - 1).alias("r"))
        .crossJoin(colt.agg((F.count(F.lit(1)) - 1).alias("c")))
        .select((F.col("r") * F.col("c")).alias("dof"))
    )
    stat = terms.agg(F.round(F.sum("chi_u") / 1e6, 4).alias("chi2")).crossJoin(
        F.broadcast(dof)
    )
    # order on the exact micro-units (same tie semantics as the oracle),
    # then project the rounded display value
    return (
        stat.crossJoin(terms)
        .orderBy(F.desc("chi_u"), "lang", "source")
        .limit(10)
        .select(
            "chi2",
            "dof",
            "lang",
            "source",
            "o",
            "expected",
            F.round(F.col("chi_u") / 1e6, 4).alias("cell_chi2"),
        )
    )


@query(
    "neyman_allocation_sample",
    oracle="""
    WITH strata AS (
      SELECT source,
             count(*) AS n_docs,
             sum(n_chars) AS s,
             sum(n_chars * n_chars) AS ss
      FROM documents GROUP BY source
    ),
    weighted AS (
      SELECT source, n_docs,
             round(sqrt(CAST(ss * n_docs - s * s AS DOUBLE)) / n_docs, 6)
               AS sigma_chars,
             CAST(round(n_docs * (round(sqrt(CAST(ss * n_docs - s * s AS DOUBLE))
                                        / n_docs, 6)) * 1000000, 0) AS BIGINT)
               AS wu
      FROM strata
    ),
    shares AS (
      SELECT *,
             sum(wu) OVER () AS wtot,
             (100 * wu) // sum(wu) OVER () AS base_n,
             (100 * wu) % sum(wu) OVER () AS rem
      FROM weighted
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, source) AS rk,
             100 - sum(base_n) OVER () AS leftover
      FROM shares
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           sigma_chars,
           CAST(base_n + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS allocated_n
    FROM ranked
    ORDER BY source
    """,
    description=(
        "Neyman-optimal sampling allocation: a 100-doc budget split "
        "across sources proportional to N_h * sigma_h (stratum size x "
        "length spread), integer micro-unit weights + largest-remainder "
        "rounding so allocations sum exactly to the budget"
    ),
)
def neyman_allocation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman 1934 optimal stratified allocation (public): minimum-
    variance estimates for a fixed sample budget put sampling effort
    where strata are big AND internally varied — the principled answer
    to 'how many docs should each source contribute to the eval set'.

    Scale shape: one map-side-combinable groupBy computes every
    stratum's exact integer (n, s, ss); everything after runs on
    |sources| rows. sqrt on exact integer arguments is IEEE correctly
    rounded (identical both engines); weights then become integer
    micro-units and the pennies land by the same largest-remainder rank
    as prorate_penny_allocation, so the allocations sum EXACTLY to the
    budget. (Strata smaller than their allocation would need a cap +
    re-allocate loop; these sources are all far above their shares.)
    """
    from pyspark.sql import Window as W

    (documents,) = load(spark, sf_dir, "documents")
    strata = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ss"),
    )
    sigma = F.round(
        F.sqrt((F.col("ss") * F.col("n_docs") - F.col("s") * F.col("s")).cast("double"))
        / F.col("n_docs"),
        6,
    )
    weighted = strata.select(
        "source",
        "n_docs",
        sigma.alias("sigma_chars"),
        F.round(F.col("n_docs") * sigma * 1_000_000, 0).cast("bigint").alias("wu"),
    )
    wall = W.partitionBy()
    # integer div/mod against the window total
    shares = weighted.select(
        "*",
        F.sum("wu").over(wall).alias("wtot"),
    ).select(
        "*",
        F.expr("(100 * wu) div wtot").alias("base_n"),
        F.expr("(100 * wu) % wtot").alias("rem"),
    )
    ranked = shares.select(
        "*",
        F.row_number().over(wall.orderBy(F.desc("rem"), F.asc("source"))).alias("rk"),
        (F.lit(100) - F.sum("base_n").over(wall)).alias("leftover"),
    )
    return ranked.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "sigma_chars",
        (
            F.col("base_n")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("allocated_n"),
    ).orderBy("source")


@query(
    "quantile_normalize_chars",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
             count(*) OVER (PARTITION BY source) AS ns
      FROM documents
    ),
    gdist AS (
      SELECT n_chars AS gval,
             row_number() OVER (ORDER BY n_chars, doc_id) AS g,
             count(*) OVER () AS n_total
      FROM documents
    ),
    mapped AS (
      SELECT rk.source, rk.n_chars,
             gl.gval AS mapped_chars
      FROM ranked rk
      JOIN gdist gl
        ON gl.g = ((rk.r * gl.n_total + rk.ns - 1) // rk.ns)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(n_chars) * 1.0 / count(*), 6) AS mean_before,
           round(sum(mapped_chars) * 1.0 / count(*), 6) AS mean_after,
           round(sum(n_chars * n_chars) * 1.0 / count(*)
                 - (sum(n_chars) * 1.0 / count(*))
                   * (sum(n_chars) * 1.0 / count(*)), 6) AS var_before,
           round(sum(mapped_chars * mapped_chars) * 1.0 / count(*)
                 - (sum(mapped_chars) * 1.0 / count(*))
                   * (sum(mapped_chars) * 1.0 / count(*)), 6) AS var_after
    FROM mapped
    GROUP BY source
    ORDER BY source
    """,
    description=(
        "Quantile normalization of document lengths across sources: "
        "each doc's within-source rank maps onto the global "
        "distribution's value at the same percentile (exact integer "
        "rank arithmetic, ceil(r*N/ns)), reported as per-source "
        "before/after means and variances"
    ),
)
def quantile_normalize_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The domain-balancing transform (quantile normalization —
    standard in statistics; for corpora it answers 'make every source's
    length profile comparable before mixing'). A doc at the p-th
    percentile of ITS source takes the value at the p-th percentile of
    the GLOBAL distribution — rank-to-rank, no float interpolation, so
    the mapping join key is an exact integer.

    Scale shape: one rank window per side (within-source partitioned;
    global — a range-partitioned sort at scale, same contract as
    revenue_concentration), one equi-join on the computed global rank,
    one per-source rollup. At 100 TB the global side drops to the
    equidepth-histogram sketch (the documented approx_percentile trade)
    with the mapping join unchanged.
    """
    from pyspark.sql import Window as W

    (documents,) = load(spark, sf_dir, "documents")
    ranked = documents.select(
        "source",
        "n_chars",
        F.row_number()
        .over(W.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("source")).alias("ns"),
    )
    glob = documents.select(
        F.col("n_chars").alias("gval"),
        F.row_number().over(W.orderBy("n_chars", "doc_id")).alias("g"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n_total"),
    )
    mapped = ranked.join(
        F.broadcast(glob),
        F.col("g") == F.expr("(r * n_total + ns - 1) div ns"),
    ).select("source", "n_chars", F.col("gval").alias("mapped_chars"))
    mean_b = F.sum("n_chars") * 1.0 / F.count(F.lit(1))
    mean_a = F.sum("mapped_chars") * 1.0 / F.count(F.lit(1))
    return (
        mapped.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(mean_b, 6).alias("mean_before"),
            F.round(mean_a, 6).alias("mean_after"),
            F.round(
                F.sum(F.col("n_chars") * F.col("n_chars")) * 1.0 / F.count(F.lit(1))
                - mean_b * mean_b,
                6,
            ).alias("var_before"),
            F.round(
                F.sum(F.col("mapped_chars") * F.col("mapped_chars"))
                * 1.0
                / F.count(F.lit(1))
                - mean_a * mean_a,
                6,
            ).alias("var_after"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# semantic decontamination — embedding-cosine eval-set screening
# ---------------------------------------------------------------------------

_SEM_BENCH_N = 5      # vec_id < 5 plays the benchmark/eval embedding set
_SEM_THRESHOLD = 0.35


@query(
    "decontaminate_semantic",
    bench=True,
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    b AS (SELECT vec_id AS bid, e AS be FROM v WHERE vec_id < {_SEM_BENCH_N}),
    c AS (SELECT vec_id, e FROM v WHERE vec_id >= {_SEM_BENCH_N}),
    scored AS (
      SELECT vec_id, bid,
             round(list_inner_product(be, e)
                   / (sqrt(list_inner_product(be, be)) * sqrt(list_inner_product(e, e))),
                   6) AS cosine
      FROM c CROSS JOIN b
    ),
    best AS (
      SELECT vec_id, bid AS bench_id, cosine AS bench_cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cosine DESC, bid) AS rn
        FROM scored) WHERE rn = 1
    )
    SELECT d.doc_id, d.source,
           CAST(bench_id AS BIGINT) AS bench_id, bench_cosine,
           CASE WHEN bench_cosine >= {_SEM_THRESHOLD} THEN 1 ELSE 0 END
             AS contaminated
    FROM best JOIN documents d ON d.doc_id = best.vec_id
    ORDER BY doc_id
    """,
    description=(
        "Semantic decontamination: every corpus document scored by max "
        "cosine to the benchmark/eval embedding set (vec_id < 5) — the "
        "embedding-space complement of the 5-gram decontaminate_documents "
        "(catches paraphrased eval leakage n-grams miss); flagged at 0.35"
    ),
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set leakage via embeddings (the screening used alongside
    n-gram decontamination in open-LLM data pipelines: paraphrased or
    re-formatted benchmark items share no 5-grams but sit close in
    embedding space).

    Scale shape: the benchmark set is SMALL by definition, so it
    broadcasts and the corpus is scanned once, map-only, with a
    map-side-combinable per-doc max (argmax via struct max — no window
    over the corpus). No corpus shuffle except the final doc_id join to
    documents, an equi hash join. With a large eval battery, swap the
    broadcast for the banded-LSH candidate path (`similarity.py`) like
    `embedding_near_dup`.
    """
    from kafka_stream_spark.operators.similarity import _cosine_expr, _to_double

    emb, documents = load(spark, sf_dir, "embeddings", "documents")
    v = emb.select("vec_id", F.expr(_to_double("embedding")).alias("e"))
    bench = v.filter(F.col("vec_id") < _SEM_BENCH_N).select(
        F.col("vec_id").alias("bid"), F.col("e").alias("be")
    )
    corpus = v.filter(F.col("vec_id") >= _SEM_BENCH_N)
    scored = corpus.crossJoin(F.broadcast(bench)).select(
        "vec_id",
        "bid",
        F.round(F.expr(_cosine_expr("be", "e")), 6).alias("cosine"),
    )
    # argmax with (cosine DESC, bid ASC) tie-break as one struct max —
    # map-side combinable, unlike a corpus-partitioned ranking window
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cosine"), (-F.col("bid")).alias("nb"))).alias("m")
    ).select(
        "vec_id",
        F.col("m.cosine").alias("bench_cosine"),
        (-F.col("m.nb")).cast("bigint").alias("bench_id"),
    )
    return (
        best.join(documents.select("doc_id", "source"),
                  best.vec_id == F.col("doc_id"))
        .select(
            "doc_id",
            "source",
            "bench_id",
            "bench_cosine",
            F.when(F.col("bench_cosine") >= _SEM_THRESHOLD, 1)
            .otherwise(0)
            .alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# n-gram novelty curve — corpus saturation measurement
# ---------------------------------------------------------------------------

_NOV_BUCKET = 50  # docs per ingestion-order bucket in the curve


@query(
    "ngram_novelty_curve",
    bench=True,
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             || ' ' || toks[i+3] || ' ' || toks[i+4] AS gram
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i)
      WHERE i <= len(toks) - 4
    ),
    first_seen AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram),
    per_doc AS (
      SELECT g.doc_id,
             count(*) AS n_grams,
             count(*) FILTER (f.first_doc = g.doc_id) AS n_novel
      FROM grams g JOIN first_seen f USING (gram)
      GROUP BY g.doc_id
    )
    SELECT CAST(doc_id // {_NOV_BUCKET} AS BIGINT) AS bucket,
           CAST(sum(n_grams) AS BIGINT) AS n_grams,
           CAST(sum(n_novel) AS BIGINT) AS n_novel,
           round(sum(n_novel) * 1.0 / sum(n_grams), 6) AS novelty_rate
    FROM per_doc
    GROUP BY doc_id // {_NOV_BUCKET}
    ORDER BY bucket
    """,
    description=(
        "Corpus-saturation curve: per ingestion-order bucket of 50 docs, "
        "the fraction of each doc's distinct 5-grams never seen in any "
        "earlier doc — the marginal-novelty measurement behind "
        "'is more crawl still adding new text?' decisions"
    ),
)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal data value as ingestion proceeds (the saturation curve
    data teams read before paying for more crawl: novelty_rate falling
    toward the duplication floor means new data is mostly old text).

    Scale shape: the per-doc novel count never joins the corpus-sized
    gram table back to itself — ``first_seen`` (one row per DISTINCT
    gram) aggregates by its ``first_doc`` and the per-doc totals
    aggregate the gram table directly, so after the two unavoidable
    gram-keyed shuffles (distinct, min-by-gram) everything in flight is
    doc-sized partial aggregates; the doc-level join broadcasts under
    AQE. Nothing pairwise, nothing ordered (ingestion order is data,
    not a sort: doc_id IS the order).
    """
    (documents,) = load(spark, sf_dir, "documents")
    ncpu = int(spark.conf.get("spark.sql.shuffle.partitions"))
    toks = (
        documents.select("doc_id", F.split("text", " ").alias("toks"))
        .repartition(ncpu, "doc_id")
        .cache()
    )
    grams = (
        toks.select("doc_id", F.explode(F.expr(_GRAMS_EXPR)).alias("gram"))
        .distinct()
    )
    first_seen = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel_per_doc = first_seen.groupBy(
        F.col("first_doc").alias("doc_id")
    ).agg(F.count(F.lit(1)).alias("n_novel"))
    grams_per_doc = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    per_doc = grams_per_doc.join(novel_per_doc, "doc_id", "left").select(
        "doc_id", "n_grams", F.coalesce("n_novel", F.lit(0)).alias("n_novel")
    )
    return (
        per_doc.groupBy(
            (F.col("doc_id") / _NOV_BUCKET).cast("bigint").alias("bucket")
        )
        .agg(
            F.sum("n_grams").cast("bigint").alias("n_grams"),
            F.sum("n_novel").cast("bigint").alias("n_novel"),
            F.round(F.sum("n_novel") * 1.0 / F.sum("n_grams"), 6).alias(
                "novelty_rate"
            ),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# RAG-style document chunking — overlapping token windows
# ---------------------------------------------------------------------------

_CHUNK_CAP = 64  # tokens per chunk
_CHUNK_STRIDE = 48  # CAP - overlap(16)


@query(
    "chunk_documents",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    starts AS (
      SELECT doc_id, toks, n_tok,
             unnest(generate_series(0, greatest(n_tok - 1, 0), {_CHUNK_STRIDE}))
               AS start_tok
      FROM tok
    )
    SELECT doc_id,
           CAST(start_tok // {_CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(start_tok AS INT) AS start_tok,
           CAST(least({_CHUNK_CAP}, n_tok - start_tok) AS INT) AS n_chunk_tokens,
           substr(md5(array_to_string(
             list_slice(toks, start_tok + 1, start_tok + {_CHUNK_CAP}), ' ')), 1, 16)
             AS chunk_hash
    FROM starts
    ORDER BY doc_id, chunk_idx
    """,
    description=(
        "RAG chunking: split each document into overlapping fixed-size "
        "token windows (cap 64, stride 48) with stable content hashes"
    ),
    bench=True,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (the retrieval-indexing prep step).

    Scale shape: pure map + bounded explode — each doc fans out to
    ceil(n_tok/stride) rows with no shuffle at all (the final orderBy
    exists only for the oracle hash; drop it in production and the plan
    is a single scan->project->generate stage). Chunk hashes, not chunk
    text, go downstream, so the output stays narrow regardless of
    document length. Reference framing: the reference's feeds carry
    long article bodies (sample-data/reddit.value.json) that a
    retrieval index consumes chunk-wise.
    """
    (documents,) = load(spark, sf_dir, "documents")
    tok = documents.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    starts = tok.select(
        "doc_id",
        "toks",
        "n_tok",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n_tok") - 1, F.lit(0)),
                F.lit(_CHUNK_STRIDE),
            )
        ).alias("start_tok"),
    )
    chunk_text = F.array_join(
        F.slice(F.col("toks"), F.col("start_tok") + 1, _CHUNK_CAP), " "
    )
    return starts.select(
        "doc_id",
        (F.col("start_tok") / _CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.least(F.lit(_CHUNK_CAP), F.col("n_tok") - F.col("start_tok"))
        .cast("int")
        .alias("n_chunk_tokens"),
        F.substring(F.md5(chunk_text.cast("binary")), 1, 16).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing — the multilingual-sampling practice
# ---------------------------------------------------------------------------

_TMIX_ALPHA = 0.3  # sampling temperature exponent (XLM-R's alpha)
_TMIX_W_SCALE = 1_000_000


@query(
    "mix_sources_temperature",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
             ('0x' || substr(md5('tmix:' || doc_id::VARCHAR), 1, 15))::BIGINT % 10000
               AS b
      FROM documents
    ),
    totals AS (
      SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tokens
      FROM tok GROUP BY source
    ),
    corpus AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total FROM totals),
    wts AS (
      SELECT t.source, t.src_tokens, c.total,
             CAST(round(pow(t.src_tokens * 1.0 / c.total, {_TMIX_ALPHA})
                        * {_TMIX_W_SCALE}) AS BIGINT) AS w_micro
      FROM totals t CROSS JOIN corpus c
    ),
    wsum AS (SELECT CAST(sum(w_micro) AS BIGINT) AS ws FROM wts),
    rated AS (
      SELECT w.source, w.src_tokens, w.w_micro,
             least((w.w_micro * ((w.total // 2) // s.ws)
                    + (w.w_micro * ((w.total // 2) % s.ws)) // s.ws)
                   * 10000 // w.src_tokens,
                   10000) AS thresh
      FROM wts w CROSS JOIN wsum s
    )
    SELECT k.source,
           r.src_tokens AS n_tokens_in,
           r.w_micro AS weight_micro,
           r.thresh AS keep_per_10k,
           count(*) FILTER (WHERE k.b < r.thresh) AS n_docs_kept,
           CAST(coalesce(sum(k.n_tok) FILTER (WHERE k.b < r.thresh), 0)
             AS BIGINT) AS n_tokens_kept
    FROM tok k JOIN rated r ON k.source = r.source
    GROUP BY k.source, r.src_tokens, r.w_micro, r.thresh
    ORDER BY k.source
    """,
    description=(
        "Temperature-scaled source mixing (share^0.3 upweights small "
        "sources, the multilingual pretraining practice): integer "
        "micro-weights and exact-integer target split, md5-bucket keep "
        "decisions"
    ),
    bench=True,
)
def mix_sources_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing p_s ∝ share_s^alpha (alpha=0.3): the standard
    rebalancing between mix_sources_to_budget's two extremes (alpha=1 is
    proportional, alpha=0 is uniform).

    Scale shape is identical to mix_sources_to_budget — two tiny
    aggregate passes produce per-source integer keep-thresholds and the
    corpus-sized side only ever does a map-side md5-bucket compare
    against a broadcast 20-row table; no corpus shuffle to sample.
    Exactness: pow() is the ONLY float op and it is immediately pinned to
    an integer micro-weight; the budget split uses the overflow-safe
    exact identity  floor(B*w/S) = w*(B div S) + floor(w*(B mod S)/S)
    so both engines agree bit-for-bit (w*B alone would overflow int64
    near 1e13 corpus tokens).
    """
    (documents,) = load(spark, sf_dir, "documents")
    bucket = (
        F.expr(
            "cast(conv(substr(md5(cast(concat('tmix:', cast(doc_id as string)) as binary)),"
            " 1, 15), 16, 10) as bigint)"
        )
        % 10000
    )
    tok = documents.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    ).withColumn("b", bucket)
    totals = tok.groupBy("source").agg(
        F.sum("n_tok").cast("bigint").alias("src_tokens")
    )
    corpus = totals.agg(F.sum("src_tokens").cast("bigint").alias("total"))
    wts = totals.crossJoin(F.broadcast(corpus)).select(
        "source",
        "src_tokens",
        "total",
        F.round(
            F.pow(F.col("src_tokens") * 1.0 / F.col("total"), _TMIX_ALPHA)
            * _TMIX_W_SCALE
        )
        .cast("bigint")
        .alias("w_micro"),
    )
    wsum = wts.agg(F.sum("w_micro").cast("bigint").alias("ws"))
    rated = wts.crossJoin(F.broadcast(wsum)).select(
        "source",
        "src_tokens",
        "w_micro",
        F.least(
            F.expr(
                "(w_micro * ((total div 2) div ws)"
                " + (w_micro * ((total div 2) % ws)) div ws)"
                " * 10000 div src_tokens"
            ),
            F.lit(10000).cast("bigint"),
        ).alias("thresh"),
    )
    return (
        tok.join(F.broadcast(rated), "source")
        .groupBy("source", "src_tokens", "w_micro", "thresh")
        .agg(
            F.sum(F.when(F.col("b") < F.col("thresh"), 1).otherwise(0)).alias(
                "n_docs_kept"
            ),
            F.coalesce(
                F.sum(F.when(F.col("b") < F.col("thresh"), F.col("n_tok"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_tokens_kept"),
        )
        .select(
            "source",
            F.col("src_tokens").alias("n_tokens_in"),
            F.col("w_micro").alias("weight_micro"),
            F.col("thresh").alias("keep_per_10k"),
            "n_docs_kept",
            "n_tokens_kept",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Dedup saturation curve — new-unique yield per corpus decile
# ---------------------------------------------------------------------------

_SAT_DECILES = 10


@query(
    "dedup_saturation_curve",
    oracle=f"""
    WITH d AS (
      SELECT md5(text) AS h,
             ('0x' || substr(md5('sat:' || doc_id::VARCHAR), 1, 15))::BIGINT
               % {_SAT_DECILES} AS decile
      FROM documents
    ),
    firstd AS (SELECT h, min(decile) AS fd FROM d GROUP BY h),
    per AS (
      SELECT dd.decile,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(*) FILTER (WHERE f.fd = dd.decile
                                     AND dd.rn = 1) AS BIGINT) AS new_uniques
      FROM (SELECT h, decile,
                   row_number() OVER (PARTITION BY h, decile
                                      ORDER BY h) AS rn
            FROM d) dd
      JOIN firstd f ON f.h = dd.h
      GROUP BY dd.decile
    )
    SELECT CAST(decile AS INT) AS decile,
           n_docs,
           new_uniques,
           CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
           CAST(sum(new_uniques) OVER w AS BIGINT) AS cum_uniques,
           round(sum(new_uniques) OVER w * 1.0 / sum(n_docs) OVER w, 6)
             AS unique_rate
    FROM per
    WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
    ORDER BY decile
    """,
    description=(
        "Data-saturation diagnostic: split the corpus into 10 "
        "deterministic md5 deciles (a simulated ingest order) and report "
        "how many NEW unique contents each decile contributes — the "
        "marginal-value-of-more-crawl curve"
    ),
    bench=True,
)
def dedup_saturation_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Answers 'is more of this source still yielding new data?': the
    cumulative unique-content yield as a deterministic pseudo-ingest
    order consumes the corpus decile by decile.

    Scale shape: one groupBy per content hash for first-occurrence
    deciles (exact-dedup cost), one per (hash, decile) distinct, then
    all window math runs on a 10-row table — the curve itself is free.
    The decile assignment is md5-derived, so the 'ingest order' is
    reproducible across engines and runs."""
    (documents,) = load(spark, sf_dir, "documents")
    d = documents.select(
        F.md5(F.col("text").cast("binary")).alias("h"),
        (
            F.expr(
                "cast(conv(substr(md5(cast(concat('sat:', cast(doc_id as string))"
                " as binary)), 1, 15), 16, 10) as bigint)"
            )
            % _SAT_DECILES
        ).alias("decile"),
    )
    firstd = d.groupBy("h").agg(F.min("decile").alias("fd"))
    # per (h, decile): how many docs, and is this the hash's first decile
    hd = d.groupBy("h", "decile").agg(F.count(F.lit(1)).alias("n"))
    per = (
        hd.join(firstd, "h")
        .groupBy("decile")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("fd") == F.col("decile"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_uniques"),
        )
    )
    w = (
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.select(
        F.col("decile").cast("int").alias("decile"),
        "n_docs",
        "new_uniques",
        F.sum("n_docs").over(w).cast("bigint").alias("cum_docs"),
        F.sum("new_uniques").over(w).cast("bigint").alias("cum_uniques"),
        F.round(
            F.sum("new_uniques").over(w) * 1.0 / F.sum("n_docs").over(w), 6
        ).alias("unique_rate"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# Span-corruption example generation (T5-style denoising pairs)
# ---------------------------------------------------------------------------

_SC_BLOCK = 20   # one mask span per 20-token block (~15% corruption)
_SC_MAX_S = 15   # span start offset within block: md5 % 15
_SC_MAX_L = 5    # span length: 1 + md5 % 5  (mean 3)

# per-block deterministic span start / length, derived from md5 so both
# engines draw the identical "noise"; {b} is an integer expression for
# the block id.
_SC_S_SPARK = (
    "(cast(conv(substr(md5(cast(concat('t5s:', cast(doc_id as string), ':',"
    " cast({b} as string)) as binary)), 1, 8), 16, 10) as bigint)"
    f" % {_SC_MAX_S})"
)
_SC_L_SPARK = (
    "(1 + cast(conv(substr(md5(cast(concat('t5l:', cast(doc_id as string), ':',"
    " cast({b} as string)) as binary)), 1, 8), 16, 10) as bigint)"
    f" % {_SC_MAX_L})"
)
_SC_S_DUCK = (
    "((('0x' || substr(md5('t5s:' || doc_id::VARCHAR || ':' ||"
    f" ({{b}})::VARCHAR), 1, 8))::BIGINT) % {_SC_MAX_S})"
)
_SC_L_DUCK = (
    "(1 + (('0x' || substr(md5('t5l:' || doc_id::VARCHAR || ':' ||"
    f" ({{b}})::VARCHAR), 1, 8))::BIGINT) % {_SC_MAX_L})"
)


def _sc_corr(s_tpl: str, l_tpl: str, div: str) -> str:
    """Predicate text: position p falls inside its block's mask span."""
    s = s_tpl.format(b=f"p {div} {_SC_BLOCK}")
    l = l_tpl.format(b=f"p {div} {_SC_BLOCK}")
    return f"((p % {_SC_BLOCK}) >= {s} AND (p % {_SC_BLOCK}) < {s} + {l})"


_SC_CORR_SPARK = _sc_corr(_SC_S_SPARK, _SC_L_SPARK, "div")
_SC_CORR_DUCK = _sc_corr(_SC_S_DUCK, _SC_L_DUCK, "//")


@query(
    "span_corruption_examples",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           CAST(len(list_filter(range(0, ((n - 1) // {_SC_BLOCK}) + 1),
                 b -> {_SC_S_DUCK.format(b="b")} <
                      least({_SC_BLOCK}, n - b * {_SC_BLOCK})))
             AS INT) AS n_spans,
           CAST(len(list_filter(range(0, n), p -> {_SC_CORR_DUCK}))
             AS INT) AS n_corrupted,
           array_to_string(list_transform(
             list_filter(range(0, n),
               p -> NOT {_SC_CORR_DUCK}
                    OR (p % {_SC_BLOCK}) = {_SC_S_DUCK.format(b=f"p // {_SC_BLOCK}")}),
             p -> CASE WHEN {_SC_CORR_DUCK}
                       THEN '<extra_id_' || (p // {_SC_BLOCK})::VARCHAR || '>'
                       ELSE toks[p + 1] END), ' ') AS input_text,
           coalesce(array_to_string(list_transform(
             list_filter(range(0, n), p -> {_SC_CORR_DUCK}),
             p -> CASE WHEN (p % {_SC_BLOCK}) = {_SC_S_DUCK.format(b=f"p // {_SC_BLOCK}")}
                       THEN '<extra_id_' || (p // {_SC_BLOCK})::VARCHAR || '> '
                            || toks[p + 1]
                       ELSE toks[p + 1] END), ' '), '') AS target_text
    FROM t
    ORDER BY doc_id
    """,
    description=(
        "T5-style span-corruption pair generation: one deterministic "
        "md5-placed mask span per 20-token block (~15% corruption, mean "
        "span 3) yields <input with sentinels, target spans> training "
        "pairs — map-only, engine-exact"
    ),
    bench=True,
)
def span_corruption_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denoising-objective example generator (Raffel et al. 2020's span
    corruption, the T5 pretraining objective): masked-input / target
    pairs materialized as columns.

    The span placement is blockwise — one span per 20-token block with
    md5-drawn start and length — so spans can never overlap and the
    whole generator is a single map-only projection: no shuffle, no UDF,
    no per-token row explosion. At 100 TB this runs at scan speed and
    parallelizes with the input splits. Sentinel ids are the block ids
    (deterministic, strictly increasing within a doc)."""
    (documents,) = load(spark, sf_dir, "documents")
    t = documents.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n"),
    )
    s_at = _SC_S_SPARK.format(b=f"p div {_SC_BLOCK}")
    return t.select(
        "doc_id",
        F.col("n").cast("int").alias("n_tokens"),
        F.expr(
            f"""size(filter(sequence(0, (n - 1) div {_SC_BLOCK}),
                 b -> {_SC_S_SPARK.format(b="b")} <
                      least({_SC_BLOCK}, n - b * {_SC_BLOCK})))"""
        ).cast("int").alias("n_spans"),
        F.expr(
            f"size(filter(sequence(0, n - 1), p -> {_SC_CORR_SPARK}))"
        ).cast("int").alias("n_corrupted"),
        F.expr(
            f"""array_join(transform(
                 filter(sequence(0, n - 1),
                   p -> NOT {_SC_CORR_SPARK} OR (p % {_SC_BLOCK}) = {s_at}),
                 p -> CASE WHEN {_SC_CORR_SPARK}
                           THEN concat('<extra_id_',
                                       cast(p div {_SC_BLOCK} as string), '>')
                           ELSE element_at(toks, p + 1) END), ' ')"""
        ).alias("input_text"),
        F.expr(
            f"""array_join(transform(
                 filter(sequence(0, n - 1), p -> {_SC_CORR_SPARK}),
                 p -> CASE WHEN (p % {_SC_BLOCK}) = {s_at}
                           THEN concat('<extra_id_',
                                       cast(p div {_SC_BLOCK} as string), '> ',
                                       element_at(toks, p + 1))
                           ELSE element_at(toks, p + 1) END), ' ')"""
        ).alias("target_text"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Length-bucket padding efficiency — the batching-waste audit
# ---------------------------------------------------------------------------

_LB_CAPS = [16, 32, 64, 128, 256]  # power-of-two bucket capacities


def _lb_case(col: str) -> str:
    """CASE ladder mapping a token count onto its bucket capacity."""
    whens = " ".join(
        f"WHEN {col} <= {c} THEN {c}" for c in _LB_CAPS[:-1]
    )
    return f"CASE {whens} ELSE {_LB_CAPS[-1]} END"


@query(
    "length_bucket_padding_waste",
    oracle=f"""
    WITH d AS (
      SELECT len(string_split(text, ' ')) AS n FROM documents
    ),
    g AS (SELECT max(n) AS maxn FROM d),
    b AS (
      SELECT {_lb_case("n")} AS cap, n FROM d
    )
    SELECT CAST(cap AS INT) AS bucket_cap,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) * cap AS BIGINT) AS padded_tokens,
           CAST(count(*) * cap - sum(n) AS BIGINT) AS bucket_waste,
           CAST(count(*) * any_value(g.maxn) - sum(n) AS BIGINT)
             AS pad_to_max_waste,
           round(sum(n) * 1.0 / (count(*) * cap), 6) AS efficiency
    FROM b CROSS JOIN g
    GROUP BY cap
    ORDER BY cap
    """,
    description=(
        "Batch-padding efficiency audit: token-length power-of-two "
        "buckets vs pad-to-global-max — per-bucket doc counts, padded "
        "vs real tokens, waste, and utilization"
    ),
)
def length_bucket_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantifies what length-bucketed batching saves over naive
    pad-to-max (the standard pre-tokenization batching decision):
    per-bucket utilization and both waste totals.

    Map-only length computation into a 5-row aggregate plus one 1-row
    broadcast (the global max) — zero corpus shuffle at any scale; the
    CASE ladder keeps bucket assignment pure-integer and engine-exact."""
    (documents,) = load(spark, sf_dir, "documents")
    d = documents.select(F.size(F.split("text", " ")).alias("n"))
    g = d.agg(F.max("n").alias("maxn"))
    b = d.select(F.expr(_lb_case("n")).alias("cap"), "n").crossJoin(
        F.broadcast(g)
    )
    return (
        b.groupBy("cap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_tokens"),
            (F.count(F.lit(1)) * F.col("cap")).cast("bigint").alias("padded_tokens"),
            (F.count(F.lit(1)) * F.col("cap") - F.sum("n"))
            .cast("bigint")
            .alias("bucket_waste"),
            (F.count(F.lit(1)) * F.first("maxn") - F.sum("n"))
            .cast("bigint")
            .alias("pad_to_max_waste"),
            F.round(F.sum("n") * 1.0 / (F.count(F.lit(1)) * F.col("cap")), 6).alias(
                "efficiency"
            ),
        )
        .select(
            F.col("cap").cast("int").alias("bucket_cap"),
            "n_docs",
            "n_tokens",
            "padded_tokens",
            "bucket_waste",
            "pad_to_max_waste",
            "efficiency",
        )
        .orderBy("bucket_cap")
    )


# ---------------------------------------------------------------------------
# Deterministic epoch reshuffling — reproducible training-data order
# ---------------------------------------------------------------------------

_EP_SHARDS = 8
_EP_EPOCHS = 2
_EP_PRIME = 1_000_003  # doc-key mod for the order checksum


@query(
    "epoch_shuffle_shards",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    assigned AS (
      SELECT e.epoch, d.doc_id, d.n_tok,
             ('0x' || substr(md5('ep:' || e.epoch::VARCHAR || ':'
                                 || d.doc_id::VARCHAR), 1, 15))::BIGINT AS h
      FROM d CROSS JOIN (SELECT unnest(range(0, {_EP_EPOCHS})) AS epoch) e
    ),
    ordered AS (
      SELECT epoch, h % {_EP_SHARDS} AS shard, doc_id, n_tok,
             row_number() OVER (PARTITION BY epoch, h % {_EP_SHARDS}
                                ORDER BY h, doc_id) AS pos
      FROM assigned
    )
    SELECT CAST(epoch AS INT) AS epoch,
           CAST(shard AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(pos * (doc_id % {_EP_PRIME})) AS BIGINT) AS order_checksum
    FROM ordered
    GROUP BY epoch, shard
    ORDER BY epoch, shard
    """,
    description=(
        "Deterministic epoch reshuffling: md5(epoch, doc) shard "
        "assignment + within-shard order, audited per (epoch, shard) "
        "with an exact positional checksum — the reproducible "
        "training-order primitive"
    ),
    bench=True,
)
def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle per training epoch: every epoch draws
    a fresh md5 permutation (seeded by epoch number), docs land in
    shards by hash and in a hash-ranked order inside each shard — the
    same (epoch, doc) always lands in the same place on any engine, any
    run, any cluster size, which is what makes training runs resumable
    and ablations comparable.

    Scale shape: assignment is map-only; the within-shard ranking is
    ONE shuffle per epoch partitioned by (epoch, shard) — exactly the
    write path's natural partitioning, so the sort is the output sort.
    The positional checksum (sum of pos x doc-key mod p, associative)
    lets two engines agree on the FULL order while exchanging only one
    row per shard."""
    (documents,) = load(spark, sf_dir, "documents")
    d = documents.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    epochs = spark.range(_EP_EPOCHS).select(F.col("id").cast("int").alias("epoch"))
    assigned = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        "n_tok",
        F.expr(
            "cast(conv(substr(md5(cast(concat('ep:', cast(epoch as string), ':',"
            " cast(doc_id as string)) as binary)), 1, 15), 16, 10) as bigint)"
        ).alias("h"),
    )
    w = Window.partitionBy("epoch", F.col("h") % _EP_SHARDS).orderBy("h", "doc_id")
    ordered = assigned.select(
        "epoch",
        (F.col("h") % _EP_SHARDS).alias("shard"),
        "doc_id",
        "n_tok",
        F.row_number().over(w).alias("pos"),
    )
    return (
        ordered.groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(F.col("pos") * (F.col("doc_id") % _EP_PRIME))
            .cast("bigint")
            .alias("order_checksum"),
        )
        .select(
            F.col("epoch").cast("int").alias("epoch"),
            F.col("shard").cast("int").alias("shard"),
            "n_docs",
            "n_tokens",
            "order_checksum",
        )
        .orderBy("epoch", "shard")
    )


# ---------------------------------------------------------------------------
# RAG chunk index build — chunks assigned to IVF buckets, posting stats
# ---------------------------------------------------------------------------

from kafka_stream_spark.registry import QUERIES as _REG


def _de(a: str, b: str) -> str:
    """JVM-side double-array dot product expression."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


@query(
    "rag_chunk_index",
    oracle=f"""
    WITH chunks AS ({_REG["chunk_documents"].oracle}),
    v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    expl AS (
      SELECT label, i, e[i] AS x
      FROM v CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    ),
    cent AS (
      SELECT label, array_agg(cx ORDER BY i) AS c
      FROM (SELECT label, i, avg(x) AS cx FROM expl GROUP BY label, i)
      GROUP BY label
    ),
    assign AS (
      SELECT vec_id AS doc_id, label AS bucket FROM (
        SELECT v.vec_id, c.label,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 round(list_inner_product(v.e, c.c)
                       / (sqrt(list_inner_product(v.e, v.e))
                          * sqrt(list_inner_product(c.c, c.c))), 6) DESC,
                 c.label) AS rn
        FROM v CROSS JOIN cent c)
      WHERE rn = 1
    )
    SELECT CAST(a.bucket AS INT) AS bucket,
           CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(c.n_chunk_tokens) AS BIGINT) AS n_tokens
    FROM chunks c JOIN assign a USING (doc_id)
    GROUP BY a.bucket
    ORDER BY bucket
    """,
    description=(
        "RAG index build end-to-end: overlapping chunks + IVF coarse "
        "assignment of each document's embedding -> per-bucket posting "
        "stats (docs, chunks, tokens) — the retrieval-index shape audit"
    ),
)
def rag_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full retrieval-index build as one plan: chunk_documents'
    token windows joined to the IVF bucket each document's embedding
    assigns to (argmax rounded centroid cosine — the same coarse
    quantizer ann_ivf_topk probes), aggregated to per-bucket posting
    statistics. This is the audit a retrieval team runs before
    flipping an index live: bucket balance decides query fan-out.

    Scale shape: centroids are k rows broadcast everywhere (assignment
    is map-side dot products over the corpus); chunking is map-only;
    the chunk-to-bucket join is on doc_id (co-partitioned with the
    chunk write in production); the output is k rows."""
    from kafka_stream_spark.operators._common import load as _load

    (emb,) = _load(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
    )
    expl = v.select("label", F.posexplode("e").alias("pos", "x"))
    cent = (
        expl.groupBy("label", "pos")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s["cx"],
            ).alias("c")
        )
    )
    cos = F.expr(
        f"round({_de('e', 'c')} / (sqrt({_de('e', 'e')})"
        f" * sqrt({_de('c', 'c')})), 6)"
    )
    assign = (
        v.select("vec_id", "e")
        .crossJoin(F.broadcast(cent.select(F.col("label").alias("bucket"), "c")))
        .select(F.col("vec_id").alias("doc_id"), "bucket", cos.alias("cs"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("cs"), F.asc("bucket"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("doc_id", "bucket")
    )
    chunks = chunk_documents(spark, sf_dir)
    return (
        chunks.join(assign, "doc_id")
        .groupBy("bucket")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("bigint").alias("n_tokens"),
        )
        .select(F.col("bucket").cast("int").alias("bucket"), "n_docs", "n_chunks", "n_tokens")
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (privacy governance gate)
# ---------------------------------------------------------------------------

_KANON_KS = (2, 5, 10, 20)


@query(
    "k_anonymity_audit",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS grp,
             count(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS l_div
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    tot AS (SELECT sum(grp) AS n_rows, min(l_div) AS min_l FROM g),
    ks AS (SELECT unnest(ARRAY{list(_KANON_KS)}) AS k)
    SELECT k,
           count(CASE WHEN grp < k THEN 1 END) AS groups_below,
           CAST(coalesce(sum(CASE WHEN grp < k THEN grp END), 0) AS BIGINT)
             AS rows_below,
           round(coalesce(sum(CASE WHEN grp < k THEN grp END), 0) * 1.0
                 / max(tot.n_rows), 6) AS pct_rows_below,
           max(tot.min_l) AS min_l_diversity
    FROM ks CROSS JOIN g CROSS JOIN tot
    GROUP BY k ORDER BY k
    """,
    description=(
        "k-anonymity audit over quasi-identifiers (nation, segment): per "
        "k threshold, how many equivalence groups / rows fall below k, "
        "plus worst-group l-diversity of the sensitive flag — the privacy "
        "governance gate a training corpus passes before release "
        "(Sweeney 2002; Machanavajjhala 2007)"
    ),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifier equivalence-class risk profile.

    Scale shape: one groupBy over the quasi-identifier tuple (partial
    aggregation map-side) collapses the corpus to |QI-combinations|
    rows; the per-k readout is a tiny literal-array explode against
    that aggregate — no second corpus pass, no row-level retention of
    identifiers. The sensitive attribute only ever appears as a
    distinct-count inside each class (the l-diversity bound), never
    joined back to rows.
    """
    (customer,) = load(spark, sf_dir, "customer")
    g = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("grp"),
        F.countDistinct(
            F.when(F.col("c_acctbal") < 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("l_div"),
    )
    ks = F.array(*[F.lit(k) for k in _KANON_KS])
    return (
        g.crossJoin(
            g.agg(
                F.sum("grp").alias("n_rows"), F.min("l_div").alias("min_l")
            )
        )
        .select("*", F.explode(ks).alias("k"))
        .groupBy("k")
        .agg(
            F.count(F.when(F.col("grp") < F.col("k"), 1)).alias("groups_below"),
            F.coalesce(
                F.sum(F.when(F.col("grp") < F.col("k"), F.col("grp"))), F.lit(0)
            ).alias("rows_below"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("grp") < F.col("k"), F.col("grp"))), F.lit(0)
                )
                / F.max("n_rows"),
                6,
            ).alias("pct_rows_below"),
            F.max("min_l").alias("min_l_diversity"),
        )
        .orderBy("k")
    )
