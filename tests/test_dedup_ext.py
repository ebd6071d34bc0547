"""Invariants for the paragraph-chunk dedup and the prefix-filtered
Jaccard join (oracle equality itself is covered by test_queries.py)."""

import pyspark.sql.functions as F

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.dedup import (
    _doc_shingles,
    dedup_jaccard_prefix,
    dedup_ngram_jaccard,
    paragraph_dedup_documents,
)


def test_paragraph_dedup_survivors_are_globally_unique(spark, sf_dir):
    rows = paragraph_dedup_documents(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        if r.new_text is None:
            assert r.n_kept == 0
            continue
        # every kept chunk is 10 tokens except possibly the doc's last, so
        # re-chunking the reassembled text recovers the kept chunks exactly
        chunks = _rechunk(r.new_text)
        assert len(chunks) == r.n_kept, r.doc_id
        for c in chunks:
            assert c not in seen, (r.doc_id, c)  # first-keep ⇒ unique corpus-wide
        seen.update(chunks)
    removed = sum(r.n_total - r.n_kept for r in rows)
    assert removed > 0  # the corpus really contains duplicate chunks


def _rechunk(text: str, k: int = 10):
    toks = text.split(" ")
    return [" ".join(toks[i : i + k]) for i in range(0, len(toks), k)]


def test_paragraph_dedup_untouched_docs_roundtrip(spark, sf_dir):
    """A doc whose every chunk survived must reassemble to its original
    text byte-for-byte."""
    rows = {r.doc_id: r for r in paragraph_dedup_documents(spark, sf_dir).collect()}
    (documents,) = load(spark, sf_dir, "documents")
    n_intact = 0
    for d in documents.collect():
        r = rows[d.doc_id]
        if r.n_kept == r.n_total:
            assert r.new_text == d.text, d.doc_id
            n_intact += 1
    assert n_intact > 0


def test_prefix_filter_prunes_candidates(spark, sf_dir):
    """The whole point: prefix candidates must be a strict subset of the
    all-shared-shingle pairs."""
    sh = _doc_shingles(spark, sf_dir)
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    full_pairs = (
        a.join(b, ["sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("f"))
    from pyspark.sql import Window

    wd = Window.partitionBy("doc_id")
    ranked = sh.join(freq, "sh").select(
        "doc_id",
        "sh",
        F.row_number().over(wd.orderBy("f", "sh")).alias("r"),
        F.count(F.lit(1)).over(wd).alias("n"),
    )
    prefix = ranked.filter(
        F.col("r") <= F.col("n") - ((F.col("n") + 1) / 2).cast("long") + 1
    ).select("doc_id", "sh")
    pa = prefix.select(F.col("doc_id").alias("doc_a"), "sh")
    pb = prefix.select(F.col("doc_id").alias("doc_b"), "sh")
    pruned = (
        pa.join(pb, ["sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    assert pruned < full_pairs, (pruned, full_pairs)
    assert pruned > 0


def test_prefix_join_equals_exact_join(spark, sf_dir):
    """Completeness of the filter: identical pairs + scores as the full
    posting-list join."""
    exact = sorted(map(tuple, dedup_ngram_jaccard(spark, sf_dir).collect()))
    pref = sorted(map(tuple, dedup_jaccard_prefix(spark, sf_dir).collect()))
    assert exact == pref and exact


def test_prefix_verify_is_candidate_bounded(spark, sf_dir):
    """The verify stage must never rejoin full posting lists: exactly one
    shingle-keyed self-join may appear (the prefix candidate stage), and
    verification must be the per-pair set intersection."""
    import re

    plan = (
        dedup_jaccard_prefix(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    self_joins = [
        line
        for line in plan.splitlines()
        if re.search(r"Join \w+, \(+\(*sh#\d+L? = sh#\d+L?\)", line)
        and re.search(r"doc_\w*#\d+L? < doc_\w*#\d+L?", line)
    ]
    assert len(self_joins) == 1, plan
    assert "LeftSemi" not in plan, plan
    assert "array_intersect" in plan, plan


def test_canonical_dedup_merges_reformatted_copies(spark):
    """Constructed variants that exact hashing keeps apart must collapse
    to one canonical group: case, punctuation, and whitespace-run
    differences (the testdata corpus has no such pairs, so the merge
    semantics are pinned here)."""
    from kafka_stream_spark.operators.dedup import dedup_canonical_documents
    import tempfile, os

    rows = [
        (1, "Hello, World!  This is FINE."),
        (2, "hello world this is fine"),
        (3, "hello   world... THIS is fine"),
        (4, "a genuinely different document"),
        (5, "!!!"),  # canonicalizes to empty
        (6, "???"),  # also empty -> merges with 5
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            os.path.join(d, "documents.parquet")
        )
        out = dedup_canonical_documents(spark, d).collect()
    by_keeper = {r.keeper_doc_id: r for r in out}
    assert len(out) == 3  # {1,2,3}, {4}, {5,6}
    assert by_keeper[1].n_copies == 3 and by_keeper[1].n_empty == 0
    assert by_keeper[4].n_copies == 1
    assert by_keeper[5].n_copies == 2 and by_keeper[5].n_empty == 2
