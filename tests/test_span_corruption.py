"""Span corruption: structural invariants beyond the value-hash oracle."""

import re

from kafka_stream_spark.operators.curation_ext import span_corruption_examples

_SENT = re.compile(r"<extra_id_(\d+)>")


def test_span_corruption_invariants(spark, sf_dir):
    rows = span_corruption_examples(spark, sf_dir).collect()
    assert rows
    for r in rows:
        in_toks = r["input_text"].split(" ") if r["input_text"] else []
        tgt_toks = r["target_text"].split(" ") if r["target_text"] else []
        in_sent = [t for t in in_toks if _SENT.fullmatch(t)]
        tgt_sent = [t for t in tgt_toks if _SENT.fullmatch(t)]
        kept = [t for t in in_toks if not _SENT.fullmatch(t)]
        # every original token is either kept in the input or moved to
        # the target (sentinels net out)
        assert len(kept) + r["n_corrupted"] == r["n_tokens"], r["doc_id"]
        assert len(tgt_toks) - len(tgt_sent) == r["n_corrupted"], r["doc_id"]
        # one sentinel per span, same ids in input and target, in order
        assert len(in_sent) == r["n_spans"] == len(tgt_sent), r["doc_id"]
        assert in_sent == tgt_sent, r["doc_id"]
        ids = [int(_SENT.fullmatch(t).group(1)) for t in in_sent]
        assert ids == sorted(ids), r["doc_id"]


def test_span_corruption_noncorrupted_order_preserved(spark, sf_dir):
    """Dropping sentinels from the input and re-inserting the target
    spans at the sentinel positions must rebuild the original text —
    checked structurally: kept tokens appear in original order."""
    rows = span_corruption_examples(spark, sf_dir).limit(50).collect()
    from kafka_stream_spark.operators._common import load

    (documents,) = load(spark, sf_dir, "documents")
    texts = {r["doc_id"]: r["text"] for r in documents.limit(1000).collect()}
    for r in rows:
        if r["doc_id"] not in texts:
            continue
        orig = texts[r["doc_id"]].split(" ")
        rebuilt = []
        spans = {}
        cur = None
        for t in (r["target_text"].split(" ") if r["target_text"] else []):
            m = _SENT.fullmatch(t)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(t)
        for t in r["input_text"].split(" "):
            m = _SENT.fullmatch(t)
            if m:
                rebuilt.extend(spans[int(m.group(1))])
            else:
                rebuilt.append(t)
        assert rebuilt == orig, r["doc_id"]
