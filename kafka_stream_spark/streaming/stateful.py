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
