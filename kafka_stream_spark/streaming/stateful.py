"""Custom stateful processing — the Kafka Streams Processor API analog
(SURVEY.md §2.10 X1, §2.9 T4).

Kafka Streams exposes per-key mutable state via RocksDB stores; Spark's
equivalent for arbitrary Python logic is ``applyInPandasWithState``:
grouped keys, Arrow-batched rows, a ``GroupState`` handle per key, and
timeout-driven eviction (the state-TTL / window-retention analog).

Two ready-made processors:
- ``running_counter``: per-key running count+sum changelog — the
  ``count()``/``aggregate()`` KTable analog, emitting one update per key
  per micro-batch.
- ``threshold_alerter``: emits a row only when a key's accumulated value
  crosses a threshold — the classic fraud/alerting Processor example;
  state resets after firing.

Scale: state lives in the state store (set RocksDB via
``session.enable_rocksdb_state`` for big keyspaces); keys are hash-
partitioned so each executor owns a shard — same model as Streams tasks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

COUNTER_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)
_COUNTER_STATE = "n LONG, total DOUBLE"

ALERT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("total", DoubleType()),
        StructField("n_events", LongType()),
    ]
)
_ALERT_STATE = "total DOUBLE, n LONG"


def running_counter(grouped, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) changelog over a grouped stream.

    Usage: ``running_counter(stream.groupBy("user"), "user", "amount")``.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    return grouped.applyInPandasWithState(
        fn, COUNTER_SCHEMA, _COUNTER_STATE, "update", GroupStateTimeout.NoTimeout
    )


def threshold_alerter(grouped, key_col: str, value_col: str, threshold: float) -> DataFrame:
    """Emit (key, total, n) when a key's accumulated value crosses the
    threshold, then reset that key's state."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf[value_col].sum())
            n += len(pdf)
        if total >= threshold:
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "total": [total], "n_events": [n]}
            )
        else:
            state.update((total, n))

    return grouped.applyInPandasWithState(
        fn, ALERT_SCHEMA, _ALERT_STATE, "append", GroupStateTimeout.NoTimeout
    )


FUNNEL_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("completed_at", LongType()),   # µs epoch of final stage
        StructField("started_at", LongType()),     # µs epoch of first stage
        StructField("n_stages", LongType()),
    ]
)
_FUNNEL_STATE = "stage LONG, stage_ts LONG, start_ts LONG, done LONG"


def funnel_tracker(grouped, key_col: str, type_col: str, ts_col: str, stages: tuple):
    """Per-key ordered-stage funnel state machine (streaming twin of the
    batch ``funnel_conversion`` query).

    State per key: (current stage index, its event time, funnel start
    time, done flag). Rows advance the machine only if their event type is
    the NEXT stage and their timestamp is strictly after the current
    stage's — same strict ordering as the batch oracle. Emits exactly one
    row per key, on completion of the final stage; state is kept (done=1)
    so re-deliveries don't re-emit.

    Scale: one state row of 4 longs per key — millions of concurrent
    funnels per executor; within-batch rows are sorted per key in pandas
    (cheap: a key's rows per micro-batch are few).
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        stage, stage_ts, start_ts, done = (
            state.get if state.exists else (-1, -1, -1, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        if done or rows.empty:
            state.update((stage, stage_ts, start_ts, done))
            return
        rows = rows.sort_values(ts_col)
        for et, ts in zip(rows[type_col], rows[ts_col]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if stage + 1 < len(stages) and et == stages[stage + 1] and ts_us > stage_ts:
                stage += 1
                stage_ts = ts_us
                if stage == 0:
                    start_ts = ts_us
                if stage == len(stages) - 1:
                    done = 1
                    break
        state.update((stage, stage_ts, start_ts, done))
        if done:
            yield pd.DataFrame(
                {
                    "key": [str(key[0])],
                    "completed_at": [stage_ts],
                    "started_at": [start_ts],
                    "n_stages": [len(stages)],
                }
            )

    return grouped.applyInPandasWithState(
        fn, FUNNEL_SCHEMA, _FUNNEL_STATE, "append", GroupStateTimeout.NoTimeout
    )
