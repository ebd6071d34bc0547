"""Streaming Bloom admission gate — exact-key dedup with O(1) state.

`dropDuplicates` on a key keeps every seen key in the state store
forever (unbounded at ingest scale); the watermark variant forgets keys
by time. The third point in that trade space is a per-shard BLOOM
filter (Bloom 1970): constant-size state per shard at any key count,
zero false negatives (a true duplicate is ALWAYS flagged), and a
bounded, auditable false-positive rate (a fresh key is occasionally
dropped as "seen"). That trade — never re-ingest, rarely over-drop —
is the production posture for at-least-once training-data ingestion,
and the batch twin (`bloom_membership_orders`) measures exactly this
false-positive rate against exact membership.

Mechanics: rows group by a hash shard (state shards scale with the
cluster, not the key count); each shard's state is its bloom word
array; rows fold in ascending id order (deterministic replay under any
micro-batch slicing); the SAME integer LCG hash family as the batch
sketch, so a batch-built bloom and the stream gate agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_stream_spark.operators.sketches_bloom import _BLOOM_HASHES, _BLOOM_P

#: default filter size: 1024 words x 63 bits ≈ 64k bits per shard —
#: ~2% false-positive rate at ~6k keys/shard; size n_words to ~10 bits
#: per expected key (the standard m/n=10, k=3 operating point)
DEFAULT_WORDS = 1024

GATE_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("rec_id", LongType()),
        StructField("admitted", BooleanType()),
    ]
)

_GATE_STATE = StructType([StructField("words", ArrayType(LongType()))])


def bloom_positions(key: int, n_words: int) -> list[tuple[int, int]]:
    """(word, bit) positions for a key — same arithmetic as the batch
    sketch's `_positions` SQL, evaluated in Python for the state fold."""
    out = []
    for a, b in _BLOOM_HASHES:
        p = ((a * key + b) % _BLOOM_P) % (n_words * 63)
        out.append((p // 63, p % 63))
    return out


def bloom_gate(grouped, id_col: str, n_words: int = DEFAULT_WORDS) -> DataFrame:
    """Per-shard stateful processor: admit a record iff its id's bloom
    bits are not all set, then set them. State is `n_words` longs per
    shard FOREVER — the whole point; compare `dropDuplicates` whose
    state grows with distinct keys."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (words,) = state.get if state.exists else ([0] * n_words,)
        words = list(words)
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(v) for v in pdf[id_col])
        ids.sort()  # deterministic under any micro-batch slicing
        out = {"shard": [], "rec_id": [], "admitted": []}
        for rid in ids:
            pos = bloom_positions(rid, n_words)
            seen = all(words[w] & (1 << b) for w, b in pos)
            if not seen:
                for w, b in pos:
                    words[w] |= 1 << b
            out["shard"].append(str(key[0]))
            out["rec_id"].append(rid)
            out["admitted"].append(not seen)
        state.update((words,))
        if out["shard"]:
            yield pd.DataFrame(out)

    return grouped.applyInPandasWithState(
        fn, GATE_SCHEMA, _GATE_STATE, "append", GroupStateTimeout.NoTimeout
    )


def streaming_bloom_dedup(
    stream: DataFrame, id_col: str, n_shards: int = 8, n_words: int = DEFAULT_WORDS
) -> DataFrame:
    """Shard by key hash, gate each shard through its bloom. The shard
    column is the state-store partitioning key: state size is
    n_shards x n_words longs, independent of how many keys flow through."""
    # pmod, not abs+%: abs(hash)==Integer.MIN_VALUE stays negative and
    # would mint a stray shard outside 0..n_shards-1.
    sharded = stream.withColumn(
        "shard", F.pmod(F.hash(F.col(id_col)), F.lit(n_shards)).cast("string")
    )
    return bloom_gate(sharded.groupBy("shard"), id_col, n_words)
