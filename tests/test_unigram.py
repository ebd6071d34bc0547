"""Unigram-LM tokenizer: segmentation invariants beyond the oracle."""

import pyspark.sql.functions as F

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.unigram import (
    _UG_MAX_WL,
    _segment_words,
    unigram_tokenizer_pieces,
)


def test_segmentation_reconstructs_every_word(spark, sf_dir):
    """Concatenating a word's pieces in j-DESC (start-to-end) order must
    rebuild the word exactly — the Viterbi path is a full cover."""
    (documents,) = load(spark, sf_dir, "documents")
    pieces, _ = _segment_words(documents)
    rebuilt = (
        pieces.groupBy("w")
        .agg(
            F.expr(
                "concat_ws('', transform(reverse(array_sort("
                "collect_list(struct(j, piece)))), x -> x.piece))"
            ).alias("joined")
        )
        .collect()
    )
    assert rebuilt, "no words segmented"
    bad = [(r["w"], r["joined"]) for r in rebuilt if r["w"] != r["joined"]]
    assert not bad, f"segmentation does not cover: {bad[:5]}"


def test_piece_scores_are_negative_log_likelihoods(spark, sf_dir):
    (documents,) = load(spark, sf_dir, "documents")
    _, scores = _segment_words(documents)
    rows = scores.collect()
    assert rows and all(r["s"] < 0 for r in rows)


def test_top_pieces_bounded_and_usage_ordered(spark, sf_dir):
    out = unigram_tokenizer_pieces(spark, sf_dir).collect()
    assert 0 < len(out) <= 30
    usages = [r["usage"] for r in out]
    assert usages == sorted(usages, reverse=True)
    assert all(1 <= len(r["piece"]) <= 4 for r in out)
    assert all(len(r["piece"]) <= _UG_MAX_WL for r in out)
