"""transformWithState processors — the Processor-API analog on Spark 4's
native arbitrary-state operator (SURVEY.md §2.10 X1, §2.9 T4).

``applyInPandasWithState`` (streaming/stateful.py) gives one opaque
state blob per key and watermark-driven timeouts. Kafka Streams'
Processor API offers more: multiple named stores per processor and
``punctuate()`` — callbacks scheduled at an absolute time, independent
of whether the key receives further input. Spark 4's
``transformWithStateInPandas`` is the 1:1 analog (typed value/list/map
states = named stores; ``registerTimer``/``handleExpiredTimer`` =
punctuation; RocksDB-backed), so the processors here use it directly
instead of emulating timers with watermark eviction:

- ``running_counter_tws``: per-key count/sum changelog on a ValueState —
  the smallest equivalence bridge to ``stateful.running_counter`` (the
  two APIs must agree row-for-row; tested).
- ``idle_session_finalizer``: emits one finalized session summary per
  key when an EVENT-TIME timer at ``last_seen + gap`` fires — Streams'
  classic session ``punctuate`` shape. The session emits exactly once,
  with no event carrying the key needed to flush it (the property
  timeout-free emulations can't give you in append mode).

Requires the RocksDB state-store provider
(``session.enable_rocksdb_state``) — transformWithState's state-v2
encoding is RocksDB-only, matching Streams' own store engine — and
``google.protobuf`` at runtime (the operator's Python↔JVM state client
is protobuf-framed). This container lacks protobuf, so the tests in
tests/test_tws.py are env-gated, exactly like the real-broker tests;
the applyInPandasWithState processors in streaming/stateful.py remain
the always-runnable backend for every shipped streaming twin.

Scale: same story as stateful.py — state is sharded by key hash across
executors; per-key Python work is O(rows in batch for that key), and
timers live in the store, not in Python memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)


class _RunningCounter(StatefulProcessor):
    """count/sum per key in a ValueState; one changelog row per key per
    micro-batch (the KTable ``aggregate()`` shape)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("acc", "cnt bigint, total double")

    def handleInputRows(self, key, rows, timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        cnt, total = 0, 0.0
        if self._state.exists():
            cnt, total = self._state.get()
        n, s = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        cnt, total = cnt + n, total + s
        self._state.update((cnt, total))
        yield pd.DataFrame({"key": [key[0]], "cnt": [cnt], "total": [total]})

    def close(self) -> None:
        pass


def running_counter_tws(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running count+sum changelog via transformWithStateInPandas.

    Row-for-row equivalent to ``stateful.running_counter`` (update mode,
    one row per touched key per batch) — the equivalence test is the
    contract that both Processor-API backends implement the same
    operator."""
    import pyspark.sql.functions as F

    src = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("key").transformWithStateInPandas(
        statefulProcessor=_RunningCounter(),
        outputStructType="key string, cnt bigint, total double",
        outputMode="Update",
        timeMode="None",
    )


class _IdleSessionFinalizer(StatefulProcessor):
    """Session accumulator + event-time punctuation.

    State: (start_us, last_us, events, value_sum). Each batch extends
    the session and re-arms a single timer at ``last_seen + gap`` (the
    previous timer is deleted — Streams' ``Cancellable punctuate``
    pattern). When the watermark passes the timer, the session row
    emits and state clears; the next event for the key opens a fresh
    session."""

    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState(
            "session", "start_ms bigint, last_ms bigint, events bigint, value_sum double"
        )

    def handleInputRows(self, key, rows, timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        start_ms, last_ms, events, vsum = None, None, 0, 0.0
        if self._state.exists():
            start_ms, last_ms, events, vsum = self._state.get()
        for pdf in rows:
            ts = pdf["event_ms"]
            lo, hi = int(ts.min()), int(ts.max())
            start_ms = lo if start_ms is None else min(start_ms, lo)
            new_last = hi if last_ms is None else max(last_ms, hi)
            if last_ms is not None and new_last != last_ms:
                self._handle.deleteTimer(last_ms + self._gap_ms)
            last_ms = new_last
            events += len(pdf)
            vsum += float(pdf["value"].sum())
        self._state.update((start_ms, last_ms, events, vsum))
        self._handle.registerTimer(last_ms + self._gap_ms)
        return iter(())  # sessions emit only from the timer

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._state.exists():
            return
        start_ms, last_ms, events, vsum = self._state.get()
        # a re-armed session may leave a stale timer behind a restart;
        # only the timer matching the current last_seen finalizes
        if expiredTimerInfo.getExpiryTimeInMs() != last_ms + self._gap_ms:
            return
        self._state.clear()
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "session_start_ms": [start_ms],
                "session_end_ms": [last_ms],
                "events": [events],
                "value_sum": [vsum],
            }
        )

    def close(self) -> None:
        pass


def idle_session_finalizer(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap: str = "10 seconds",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Append-mode session summaries finalized by event-time timers.

    A key's session row emits exactly once, when the watermark passes
    ``last_event + gap`` — whether or not the key ever appears again.
    Equivalent batch shape: ``windows.session_window`` aggregation; the
    streaming test closes the loop by comparing both."""
    import pyspark.sql.functions as F

    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)
    src = (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col).cast("timestamp").alias("event_time"),
            F.col(value_col).cast("double").alias("value"),
        )
        .withWatermark("event_time", watermark)
        .withColumn("event_ms", (F.col("event_time").cast("double") * 1000).cast("bigint"))
    )
    return src.groupBy("key").transformWithStateInPandas(
        statefulProcessor=_IdleSessionFinalizer(gap_ms),
        outputStructType=(
            "key string, session_start_ms bigint, session_end_ms bigint, "
            "events bigint, value_sum double"
        ),
        outputMode="Append",
        timeMode="EventTime",
    )
