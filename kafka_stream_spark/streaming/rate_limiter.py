"""Per-key token-bucket rate limiter — the Kafka client-quota analog.

Kafka brokers enforce produce/fetch quotas per client with exactly this
algorithm (public Kafka docs, `quota.window.size.seconds` family): a
bucket of capacity C tokens refills at r tokens/second; each record
spends one token; an empty bucket means throttle. This is the
streaming twin of `capped_running_balance` — the same clamped
non-linear fold, keyed by client and driven by EVENT TIME, so replays
and micro-batch re-slicing produce identical verdicts.

Determinism: all bucket math is integer micro-tokens over integer
microseconds (refill = elapsed_us * r_per_sec // 1_000_000 exact),
rows fold in (event-time, record-id) order, and state is three longs
per key forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MICRO = 1_000_000  # tokens and seconds both scale by 1e6

LIMIT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("rec_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("admitted", BooleanType()),
        StructField("tokens_after_u", LongType()),
    ]
)

#: (last_ts_us, tokens_u) — micro-tokens currently in the bucket as of
#: the last processed event's time
_LIMIT_STATE = StructType(
    [StructField("last_ts_us", LongType()), StructField("tokens_u", LongType())]
)


def token_bucket_fold(
    events: list[tuple[int, int]],
    capacity: int,
    rate_per_sec: int,
    last_ts_us: int,
    tokens_u: int,
) -> tuple[list[tuple[int, int, bool, int]], int, int]:
    """Pure fold shared by the processor and its tests: events are
    (ts_us, rec_id) SORTED; returns per-event verdicts and final state.

    Refill is computed from event-time deltas in exact integer
    arithmetic; a record is admitted iff a full token is available, and
    admission spends exactly one token. Out-of-order rows inside a
    batch are handled by the caller's sort; a row older than the
    bucket's clock gets no refill (elapsed clamps at 0) but may still
    spend — the same grace Kafka's sampled quota windows give."""
    cap_u = capacity * _MICRO
    out = []
    for ts_us, rid in events:
        elapsed = max(ts_us - last_ts_us, 0)
        tokens_u = min(cap_u, tokens_u + elapsed * rate_per_sec)
        admitted = tokens_u >= _MICRO
        if admitted:
            tokens_u -= _MICRO
        last_ts_us = max(last_ts_us, ts_us)
        out.append((ts_us, rid, admitted, tokens_u))
    return out, last_ts_us, tokens_u


def rate_limit_gate(
    grouped, ts_col: str, id_col: str, capacity: int = 10, rate_per_sec: int = 2
) -> DataFrame:
    """applyInPandasWithState processor: one bucket per key, verdicts in
    append mode. State: two longs per key, forever."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts_us, tokens_u = state.get
        else:
            last_ts_us, tokens_u = 0, capacity * _MICRO
        rows: list[tuple[int, int]] = []
        for pdf in pdfs:
            for ts, rid in zip(pdf[ts_col], pdf[id_col]):
                rows.append((int(ts), int(rid)))
        rows.sort()
        verdicts, last_ts_us, tokens_u = token_bucket_fold(
            rows, capacity, rate_per_sec, last_ts_us, tokens_u
        )
        state.update((last_ts_us, tokens_u))
        if verdicts:
            yield pd.DataFrame(
                {
                    "key": [str(key[0])] * len(verdicts),
                    "rec_id": [v[1] for v in verdicts],
                    "ts_us": [v[0] for v in verdicts],
                    "admitted": [v[2] for v in verdicts],
                    "tokens_after_u": [v[3] for v in verdicts],
                }
            )

    return grouped.applyInPandasWithState(
        fn, LIMIT_SCHEMA, _LIMIT_STATE, "append", GroupStateTimeout.NoTimeout
    )


def streaming_rate_limit(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    capacity: int = 10,
    rate_per_sec: int = 2,
) -> DataFrame:
    """Key the stream, convert the timestamp to integer µs (the fold's
    clock), gate per key. The µs projection keeps every bucket update
    exact — no float seconds anywhere."""
    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("rec_id"),
        (F.col(ts_col).cast("double") * _MICRO).cast("long").alias("ts_us"),
    )
    return rate_limit_gate(
        keyed.groupBy("key"), "ts_us", "rec_id", capacity, rate_per_sec
    )
