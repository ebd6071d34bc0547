"""Streaming training-data curation (north-star M6 in streaming form).

The batch curation flow (``operators/text_analysis.curation_pipeline``,
``operators/curation_ext``) rebuilt as a continuous pipeline over a
document stream:

1. **quality gate** — stateless Catalyst projections/filters (token count,
   distinct-token ratio): runs inside whole-stage codegen, no state.
2. **exact dedup within watermark** — content fingerprint (md5 of sorted
   distinct tokens, same definition as the batch ``text_fingerprint``) →
   ``dropDuplicatesWithinWatermark``: state is bounded by the watermark,
   sharded by fingerprint across the state store at cluster scale.
3. **decontamination + sink** — per micro-batch (``foreachBatch``), the
   batch decontamination join runs against a static benchmark gram table
   (broadcast — eval sets are tiny), and clean rows append to parquet.
   foreachBatch is the idiomatic seam for relational logic that streaming
   mode can't express directly (multi-agg per doc) — SURVEY.md §2.9 T5.

Semantics delta vs batch: dedup keeps the FIRST arrival (event-time order
within the watermark), where batch keeps min(doc_id); contamination is
exact per batch because the benchmark side is static.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from kafka_stream_spark.streaming.ops import _watermarkable

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

_FP_EXPR = "md5(cast(array_join(array_sort(array_distinct(split(text, ' '))), ' ') as binary))"


def quality_gate(
    stream: DataFrame, min_tokens: int = 20, min_distinct_ratio: float = 0.3
) -> DataFrame:
    """Stateless quality filter: length + lexical-diversity floors."""
    toks = F.split("text", " ")
    return (
        stream.withColumn("n_tokens", F.size(toks))
        .withColumn("distinct_ratio", F.size(F.array_distinct(toks)) / F.size(toks))
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("distinct_ratio") >= min_distinct_ratio)
        )
    )


def classifier_gate(stream: DataFrame, min_score: int = 0) -> DataFrame:
    """Model-based quality gate: the hashed-feature linear scorer from
    ``operators/text_analysis.py`` (fastText-shaped; one map-only JVM
    expression, no UDF) — batch and stream score identically because
    they share the expression. Keep records with score > ``min_score``
    micro-units."""
    from kafka_stream_spark.operators.text_analysis import _W_SPARK

    score = F.expr(
        f"""aggregate(transform(split(text, ' '), t -> {_W_SPARK}),
                      cast(0 as bigint), (acc, v) -> acc + v)"""
    )
    return stream.withColumn("quality_score_u", score).filter(
        F.col("quality_score_u") > min_score
    )


def dedup_by_fingerprint(
    stream: DataFrame, ts_col: str = "ts", watermark: str = "10 minutes"
) -> DataFrame:
    """First-arrival-wins exact dedup keyed on the content fingerprint;
    state expires with the watermark."""
    with_fp = stream.withColumn("fp", F.expr(_FP_EXPR))
    return _watermarkable(with_fp, ts_col).withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(["fp"])


def benchmark_grams(documents: DataFrame, bench_source: str = "src0") -> DataFrame:
    """Static benchmark gram set (distinct 5-grams of the held-out slice)."""
    return (
        documents.filter(F.col("source") == bench_source)
        .select(F.split("text", " ").alias("toks"))
        .select(F.explode(F.expr(_GRAMS_EXPR)).alias("gram"))
        .distinct()
    )


def contaminated_ids(batch_df: DataFrame, bench: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Doc ids whose 5-gram overlap with the benchmark set ≥ threshold
    (batch relational logic — used inside foreachBatch)."""
    grams = (
        batch_df.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.explode(F.expr(_GRAMS_EXPR)).alias("gram"))
        .distinct()
    )
    scored = (
        grams.join(
            F.broadcast(bench.withColumn("hit", F.lit(1))), "gram", "left"
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.count("hit").alias("n_hit"))
    )
    return scored.filter(F.col("n_hit") / F.col("n_grams") >= threshold).select("doc_id")


def streaming_curation(
    stream: DataFrame,
    bench: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    min_tokens: int = 20,
    min_distinct_ratio: float = 0.3,
    contamination_threshold: float = 0.5,
    classifier_min_score: int | None = None,
):
    """Wire the full flow and return the (unstarted) DataStreamWriter.

    ``bench`` must be a STATIC DataFrame (re-read per batch by Spark's
    stream-static machinery if backed by files).
    """
    gated = quality_gate(stream, min_tokens, min_distinct_ratio)
    if classifier_min_score is not None:
        gated = classifier_gate(gated, classifier_min_score)
    deduped = dedup_by_fingerprint(gated, ts_col, watermark)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bad = contaminated_ids(batch_df, bench, contamination_threshold)
        clean = batch_df.join(bad, "doc_id", "left_anti")
        clean.write.mode("append").parquet(out_dir)

    return (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
