"""Streaming boilerplate stripping — the two-phase production twin of
``operators/dedup.strip_boilerplate_chunks``.

Template boilerplate (nav bars, cookie banners) is a property of the
CORPUS, not of one document, so the streaming deployment is two-phase:
the boilerplate chunk set is trained in batch over the existing corpus
(the heavy-hitter-sized output of the batch operator's frequency pass)
and the stream applies it as a MAP-ONLY transformation — chunk the
arriving document with the same 4-token chunker, drop chunks in the
broadcast boilerplate set, reassemble. Zero streaming state, zero
shuffle: the filter is a higher-order-function expression over each
row's own chunk array, so the gate composes into any pipeline
(curation flow, sink writers) without a watermark.

Equivalence contract (tested): on the same corpus and boilerplate set,
the gate's per-doc output is IDENTICAL to the batch operator's —
same chunker, same reassembly, same null-when-everything-removed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from kafka_stream_spark.operators.dedup import _BP_CHUNK


def boilerplate_gate(
    docs: DataFrame, boiler_chunks: list[str], text_col: str = "text"
) -> DataFrame:
    """(doc_id, text, …) stream → (doc_id, n_total, n_removed, new_text).

    ``boiler_chunks`` is the batch-trained template set (collect the
    frequency pass of ``strip_boilerplate_chunks``); it is heavy-hitter
    sized, so embedding it as a literal array keeps the whole gate one
    codegen'd projection. Works identically on batch frames.
    """
    boiler = F.array(*[F.lit(c) for c in boiler_chunks])
    chunked = docs.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, cast(ceil(size(split({text_col}, ' ')) / {_BP_CHUNK}.0) as int) - 1),"
            f" i -> array_join(slice(split({text_col}, ' '), i * {_BP_CHUNK} + 1, {_BP_CHUNK}), ' '))"
        ).alias("chunks"),
    )
    kept = F.filter("chunks", lambda c: ~F.array_contains(boiler, c))
    return chunked.select(
        "doc_id",
        F.size("chunks").cast("bigint").alias("n_total"),
        (F.size("chunks") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.when(F.size(kept) > 0, F.array_join(kept, " ")).alias("new_text"),
    )
