"""Token-sequence corpus statistics: LM-based quality scoring and exact
repeated-substring detection (north-star M6, curation wave 4).

Two operators a pretraining-data pipeline runs after the cheap per-doc
heuristics (``text_analysis``) and before/alongside fuzzy dedup:

- **lm_bigram_logprob** — corpus-trained bigram language-model scoring:
  every document is scored by the average log-probability of its bigrams
  under the corpus's own bigram MLE (the KenLM-filter shape used by
  CCNet/RedPajama quality gates, with the corpus standing in for the
  reference LM). Low average log-prob = surprising token sequences =
  candidate junk. Two shuffles bound the cost: one groupBy on the bigram
  to build counts (map-side partial agg collapses each task to its
  distinct-bigram set — shuffle width is vocabulary², not token count),
  one join of doc-bigrams back to the count table on the bigram key.
- **substring_dedup_spans** — exact duplicated-substring spans (the
  ExactSubstr shape from "Deduplicating Training Data Makes Language
  Models Better", Lee et al. 2022): any 5-token window appearing in more
  than one document is flagged, and per-doc overlapping flagged windows
  are merged into maximal [span_start, span_end] token ranges via
  gaps-and-islands. At 100 TB the join key would be md5(gram) (fixed
  16-byte shuffle width instead of the raw string); kept as the raw gram
  here so the oracle equality is definitionally exact, the hashing is
  a pure projection swap.

Reference anchor: the multilingual text surface the stack curates
(reddit bodies, ``reddit.value.json:75-78``) — these are the corpus-level
operators its Lenses/Connect layer has no answer for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

# Flag threshold on the 6dp-rounded average bigram log-prob. Both engines
# compare the SAME rounded value, so the cut is engine-stable wherever
# the rounding itself is.
_LM_THRESHOLD = -3.45

# Positional bigram struct array, guarded for 1-token docs (ANSI
# element_at throws past the end).
_BIGRAMS_EXPR = """
  CASE WHEN size(toks) >= 2
       THEN transform(sequence(1, size(toks) - 1),
                      i -> struct(element_at(toks, i) AS w1,
                                  element_at(toks, i + 1) AS w2))
       ELSE array()
  END
"""

_K = 5  # duplicated-substring window, in tokens

_POSGRAMS_EXPR = f"""
  CASE WHEN size(toks) >= {_K}
       THEN transform(sequence(1, size(toks) - {_K - 1}),
                      i -> struct(i AS pos,
                                  concat_ws(' ', element_at(toks, i),
                                                 element_at(toks, i + 1),
                                                 element_at(toks, i + 2),
                                                 element_at(toks, i + 3),
                                                 element_at(toks, i + 4)) AS gram))
       ELSE array()
  END
"""


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, toks) repartitioned by doc_id and cached.

    Same shape as dedup._doc_shingles: the repartition parallelizes the
    per-doc CPU off the single parquet file; the cache is an optimizer
    barrier (CollapseProject would inline split() into every element_at
    of the transform — quadratic per doc).
    """
    (documents,) = load(spark, sf_dir, "documents")
    ncpu = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        documents.select("doc_id", F.split("text", " ").alias("toks"))
        .repartition(ncpu, "doc_id")
        .cache()
    )


@query(
    "lm_bigram_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    big AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i)
      WHERE i <= len(toks) - 1
    ),
    c2 AS (SELECT w1, w2, count(*) AS n2 FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(n2) AS n1 FROM c2 GROUP BY w1),
    scored AS (
      SELECT b.doc_id,
             CAST(round(ln(c2.n2 * 1.0 / c1.n1) * 1000000, 0) AS BIGINT) AS lp_u
      FROM big b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           round(sum(lp_u) / (count(*) * 1000000.0), 6) AS avg_logprob,
           CASE WHEN round(sum(lp_u) / (count(*) * 1000000.0), 6)
                     <= {_LM_THRESHOLD} THEN 1 ELSE 0 END
             AS low_quality
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    description=(
        "Corpus-trained bigram LM quality score per document: average "
        "bigram log-probability under the corpus MLE, low scores flagged "
        "(the KenLM-style quality-filter shape)"
    ),
    bench=True,
)
def lm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM scoring. The count table build is one gram-keyed shuffle
    with map-side combine (width = distinct bigrams, not tokens); the
    conditional c1(w1) marginal is derived FROM the c2 table (guarantees
    sum-consistency and costs a second tiny agg over distinct bigrams,
    not a second pass over the corpus). The score join shuffles doc
    bigrams once on (w1, w2); per-bigram log-probs are fixed to integer
    micro-units BEFORE summing — float addition isn't associative, so
    a double-sum could differ at the 6dp boundary between engines
    (observed on importance_weights_dsir), while an integer sum is
    order-independent.
    """
    toks = _doc_tokens(spark, sf_dir)
    big = toks.select(
        "doc_id", F.explode(F.expr(_BIGRAMS_EXPR)).alias("g")
    ).select("doc_id", "g.w1", "g.w2")
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    # Reassociated (guide §2.4): the round-6 plan joined the CORPUS
    # bigram table to c2 on (w1, w2) and then re-shuffled the joined
    # corpus-sized result on w1 to attach c1 — two full-corpus
    # exchanges. Joining the two count tables first (distinct-bigram
    # sized, not corpus sized) leaves exactly one corpus-side join,
    # same integer micro-unit per bigram, bit-identical output.
    lp = (
        c2.join(c1, ["w1"])
        .select(
            "w1",
            "w2",
            F.round(F.log(F.col("n2") / F.col("n1")) * 1000000, 0)
            .cast("bigint")
            .alias("lp_u"),
        )
    )
    scored = big.join(lp, ["w1", "w2"]).select("doc_id", "lp_u")
    avg6 = F.round(F.sum("lp_u") / (F.count(F.lit(1)) * 1000000.0), 6)
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            avg6.alias("avg_logprob"),
            F.when(avg6 <= _LM_THRESHOLD, 1).otherwise(0).alias("low_quality"),
        )
        .orderBy("doc_id")
    )


@query(
    "substring_dedup_spans",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    pg AS (
      SELECT doc_id, i AS pos,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
             toks[i+3] || ' ' || toks[i+4] AS gram
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i)
      WHERE i <= len(toks) - {_K - 1}
    ),
    dup AS (
      SELECT gram FROM pg GROUP BY gram HAVING count(DISTINCT doc_id) > 1
    ),
    dpos AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM pg WHERE gram IN (SELECT gram FROM dup)
    )
    SELECT doc_id,
           min(pos) AS span_start,
           max(pos) + {_K - 1} AS span_end,
           count(*) AS n_dup_grams
    FROM dpos GROUP BY doc_id, grp
    ORDER BY doc_id, span_start
    """,
    description=(
        "Exact duplicated-substring spans: 5-token windows shared across "
        "documents, merged per-doc into maximal token ranges "
        "(gaps-and-islands; the ExactSubstr dedup shape)"
    ),
)
def substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring detection. Duplicate detection is
    one gram-keyed groupBy (count(distinct doc_id) > 1 — partial agg
    collapses per-task repeats before the wire); membership is a
    LeftSemi join back on the gram; islands merge with a single per-doc
    window (pos - row_number is constant within a consecutive run).
    Spans, not gram lists, are the output — that's what a cut/annotate
    pass consumes downstream.
    """
    toks = _doc_tokens(spark, sf_dir)
    pg = toks.select(
        "doc_id", F.explode(F.expr(_POSGRAMS_EXPR)).alias("g")
    ).select("doc_id", "g.pos", "g.gram")
    dup = (
        pg.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("gram")
    )
    dpos = pg.join(dup, "gram", "left_semi").withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    return (
        dpos.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (_K - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .drop("grp")
        .orderBy("doc_id", "span_start")
    )


@query(
    "substring_dedup_cut",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    pg AS (
      SELECT doc_id, i AS pos,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
             toks[i+3] || ' ' || toks[i+4] AS gram
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i)
      WHERE i <= len(toks) - {_K - 1}
    ),
    dup AS (
      SELECT gram FROM pg GROUP BY gram HAVING count(DISTINCT doc_id) > 1
    ),
    cov AS (
      SELECT DISTINCT p.doc_id, p.pos + o.o AS j
      FROM pg p CROSS JOIN (SELECT unnest(generate_series(0, {_K - 1})) AS o) o
      WHERE p.gram IN (SELECT gram FROM dup)
    ),
    alltok AS (
      SELECT doc_id, j AS pos, toks[j] AS tok
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS j)
      WHERE j <= len(toks)
    ),
    kept AS (
      SELECT a.doc_id, a.pos, a.tok
      FROM alltok a LEFT JOIN cov c ON a.doc_id = c.doc_id AND a.pos = c.j
      WHERE c.j IS NULL
    )
    SELECT t.doc_id,
           len(t.toks) AS n_tokens,
           len(t.toks) - count(k.pos) AS n_cut,
           md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '')) AS clean_md5
    FROM tok t LEFT JOIN kept k ON t.doc_id = k.doc_id
    GROUP BY t.doc_id, len(t.toks)
    ORDER BY t.doc_id
    """,
    description=(
        "ExactSubstr dedup APPLIED: tokens covered by any cross-document "
        "duplicated 5-gram window are cut, the surviving tokens "
        "reassembled in order (md5 signature of the cleaned text)"
    ),
)
def substring_dedup_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cut pass that consumes substring_dedup_spans' evidence. Cover
    positions come from exploding each duplicated window into its K
    member positions — an equi-anti-join on (doc_id, pos), never a
    per-doc range probe. Reassembly is collect_list + sort_array inside
    one per-doc aggregate: the only per-doc sequential work is
    proportional to that doc's tokens, so the pass parallelizes by doc
    exactly like the detection pass.
    """
    toks = _doc_tokens(spark, sf_dir)
    pg = toks.select(
        "doc_id", F.explode(F.expr(_POSGRAMS_EXPR)).alias("g")
    ).select("doc_id", "g.pos", "g.gram")
    dup = (
        pg.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("gram")
    )
    cov = (
        pg.join(dup, "gram", "left_semi")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(pos, pos + {_K - 1})")).alias("j"),
        )
        .distinct()
    )
    alltok = toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.posexplode("toks").alias("p0", "tok"),
    ).select("doc_id", "n_tokens", (F.col("p0") + 1).alias("pos"), "tok")
    kept = alltok.join(
        cov.withColumnRenamed("j", "pos"), ["doc_id", "pos"], "left_anti"
    )
    assembled = kept.groupBy("doc_id", "n_tokens").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(sort_array(collect_list(struct(pos, tok))), s -> s.tok)"
                ),
            ).cast("binary")
        ).alias("clean_md5"),
    )
    # docs whose every token was cut drop out of `kept` — restore them
    # with the empty-string signature so the output covers every doc
    base = toks.select("doc_id", F.size("toks").alias("n_tokens"))
    return (
        base.join(assembled.select("doc_id", "n_kept", "clean_md5"), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias("n_cut"),
            F.coalesce("clean_md5", F.md5(F.lit("").cast("binary"))).alias(
                "clean_md5"
            ),
        )
        .orderBy("doc_id")
    )


# DSIR-style importance weighting: rate every candidate doc by how much
# more likely its bigrams are under the TARGET slice's (Laplace-smoothed)
# bigram distribution than under the corpus-wide one (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling" — the
# hashed-ngram importance-weight shape). src0 plays the target domain,
# matching decontaminate_documents' use of it as the held-out slice.
_DSIR_TARGET = "src0"
_DSIR_THRESHOLD = 0.0  # keep docs more target-like than corpus-average


@query(
    "importance_weights_dsir",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ),
    big AS (
      SELECT doc_id, source, toks[i] AS w1, toks[i + 1] AS w2
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i)
      WHERE i <= len(toks) - 1
    ),
    cc AS (SELECT w1, w2, count(*) AS nc FROM big GROUP BY w1, w2),
    ct AS (SELECT w1, w2, count(*) AS nt FROM big
           WHERE source = '{_DSIR_TARGET}' GROUP BY w1, w2),
    tot AS (
      SELECT (SELECT count(*) FROM big) AS c_total,
             (SELECT count(*) FROM big WHERE source = '{_DSIR_TARGET}') AS t_total,
             (SELECT count(*) FROM cc) AS vocab
    ),
    lr AS (
      SELECT cc.w1, cc.w2,
             CAST(round(ln(((coalesce(ct.nt, 0) + 1.0) / (t.t_total + t.vocab))
                           / ((cc.nc + 1.0) / (t.c_total + t.vocab)))
                        * 1000000, 0) AS BIGINT) AS lr_u
      FROM cc LEFT JOIN ct USING (w1, w2) CROSS JOIN tot t
    ),
    scored AS (
      SELECT b.doc_id, lr.lr_u
      FROM big b JOIN lr USING (w1, w2)
      WHERE b.source <> '{_DSIR_TARGET}'
    )
    SELECT doc_id, count(*) AS n_bigrams,
           round(sum(lr_u) / (count(*) * 1000000.0), 6) AS avg_log_ratio,
           CASE WHEN round(sum(lr_u) / (count(*) * 1000000.0), 6)
                     >= {_DSIR_THRESHOLD} THEN 1 ELSE 0 END
             AS selected
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    description=(
        "DSIR-style importance weights: per-doc average log-ratio of "
        "target-slice vs corpus bigram probability (Laplace-smoothed), "
        "with the importance-resampling keep flag"
    ),
)
def importance_weights_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance weighting for target-domain data selection. Same
    shuffle profile as lm_bigram_logprob — count tables keyed on the
    bigram with map-side combine, one score join back — plus one extra
    tiny agg for the target slice. Laplace smoothing keeps every
    corpus bigram scoreable (absent-in-target → strong negative), and
    all inputs to ln() are ratios of exact integers, so the rounded
    weights are engine-stable. At 100 TB DSIR hashes bigrams into a
    fixed-width bucket table instead of keeping raw strings — a
    projection swap on the count key, same plan.
    """
    toks_src = (
        load(spark, sf_dir, "documents")[0]
        .select("doc_id", "source", F.split("text", " ").alias("toks"))
        .repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "doc_id"
        )
        .cache()
    )
    big = toks_src.select(
        "doc_id", "source", F.explode(F.expr(_BIGRAMS_EXPR)).alias("g")
    ).select("doc_id", "source", "g.w1", "g.w2")
    cc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nc"))
    ct = (
        big.where(F.col("source") == _DSIR_TARGET)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("nt"))
    )
    tot = (
        big.agg(
            F.count(F.lit(1)).alias("c_total"),
            F.sum(
                F.when(F.col("source") == _DSIR_TARGET, 1).otherwise(0)
            ).alias("t_total"),
        )
        .crossJoin(cc.agg(F.count(F.lit(1)).alias("vocab")))
    )
    lr = (
        cc.join(ct, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    ((F.coalesce(F.col("nt"), F.lit(0)) + 1.0)
                     / (F.col("t_total") + F.col("vocab")))
                    / ((F.col("nc") + 1.0) / (F.col("c_total") + F.col("vocab")))
                )
                * 1000000,
                0,
            )
            .cast("bigint")
            .alias("lr_u"),
        )
    )
    # integer micro-unit sum → order-independent across engines
    avg6 = F.round(F.sum("lr_u") / (F.count(F.lit(1)) * 1000000.0), 6)
    return (
        big.where(F.col("source") != _DSIR_TARGET)
        .join(lr, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            avg6.alias("avg_log_ratio"),
            F.when(avg6 >= _DSIR_THRESHOLD, 1).otherwise(0).alias("selected"),
        )
        .orderBy("doc_id")
    )

# ---------------------------------------------------------------------------
# CCNet head/middle/tail perplexity buckets
# ---------------------------------------------------------------------------


@query(
    "perplexity_buckets_documents",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    big AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i)
      WHERE i <= len(toks) - 1
    ),
    c2 AS (SELECT w1, w2, count(*) AS n2 FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(n2) AS n1 FROM c2 GROUP BY w1),
    lp AS (
      SELECT b.doc_id,
             CAST(round(ln(c2.n2 * 1.0 / c1.n1) * 1000000, 0) AS BIGINT) AS lp_u
      FROM big b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    ),
    scored AS (
      SELECT doc_id,
             round(sum(lp_u) / (count(*) * 1000000.0), 6) AS avg6
      FROM lp GROUP BY doc_id
    ),
    cut AS (
      SELECT quantile_cont(avg6, 0.33) AS b33,
             quantile_cont(avg6, 0.66) AS b66
      FROM scored
    ),
    bucketed AS (
      SELECT d.source,
             CASE WHEN s.avg6 <= cut.b33 THEN 'tail'
                  WHEN s.avg6 <= cut.b66 THEN 'middle'
                  ELSE 'head' END AS bucket,
             CAST(round(s.avg6 * 1000000) AS BIGINT) AS avg_u
      FROM scored s
      JOIN documents d USING (doc_id)
      CROSS JOIN cut
    )
    SELECT source, bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(avg_u) / (count(*) * 1000000.0), 6) AS mean_logprob
    FROM bucketed
    GROUP BY source, bucket
    ORDER BY source, bucket
    """,
    description=(
        "CCNet-style head/middle/tail split: documents bucketed at the "
        "33rd/66th percentile of their bigram-LM average log-prob, "
        "rolled up per source (the language-model quality-tier stage "
        "between scoring and sampling)"
    ),
)
def perplexity_buckets_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket boundaries are exact interpolated percentiles over the
    6dp-rounded doc scores (Spark ``percentile`` == DuckDB
    ``quantile_cont`` bit-for-bit, the ``corpus_stats_by_source``
    parity), so the head/middle/tail cut is engine-stable; per-bucket
    means go back through integer micro-units to keep the final rollup
    order-independent. Costs the two LM shuffles plus one doc-sized
    percentile agg — the corpus never re-shuffles for the bucketing
    itself (the boundary is a broadcast 1-row crossJoin)."""
    toks = _doc_tokens(spark, sf_dir)
    big = toks.select(
        "doc_id", F.explode(F.expr(_BIGRAMS_EXPR)).alias("g")
    ).select("doc_id", "g.w1", "g.w2")
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    lp = (
        big.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .select(
            "doc_id",
            F.round(F.log(F.col("n2") / F.col("n1")) * 1000000, 0)
            .cast("bigint")
            .alias("lp_u"),
        )
    )
    scored = lp.groupBy("doc_id").agg(
        F.round(F.sum("lp_u") / (F.count(F.lit(1)) * 1000000.0), 6).alias("avg6")
    )
    cut = scored.agg(
        F.expr("percentile(avg6, 0.33)").alias("b33"),
        F.expr("percentile(avg6, 0.66)").alias("b66"),
    )
    (documents,) = load(spark, sf_dir, "documents")
    bucketed = (
        scored.join(documents.select("doc_id", "source"), "doc_id")
        .crossJoin(F.broadcast(cut))
        .select(
            "source",
            F.when(F.col("avg6") <= F.col("b33"), "tail")
            .when(F.col("avg6") <= F.col("b66"), "middle")
            .otherwise("head")
            .alias("bucket"),
            F.round(F.col("avg6") * 1000000).cast("bigint").alias("avg_u"),
        )
    )
    return (
        bucketed.groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.sum("avg_u") / (F.count(F.lit(1)) * 1000000.0), 6).alias(
                "mean_logprob"
            ),
        )
        .orderBy("source", "bucket")
    )
