"""Custom stateful processing — the Kafka Streams Processor API analog
(SURVEY.md §2.10 X1, §2.9 T4).

Kafka Streams exposes per-key mutable state via RocksDB stores; Spark's
equivalent for arbitrary Python logic is ``applyInPandasWithState``:
grouped keys, Arrow-batched rows, a ``GroupState`` handle per key, and
timeout-driven eviction (the state-TTL / window-retention analog).

Ready-made processors:
- ``running_counter``: per-key running count+sum changelog — the
  ``count()``/``aggregate()`` KTable analog, emitting one update per key
  per micro-batch.
- ``threshold_alerter``: emits a row only when a key's accumulated value
  crosses a threshold — the classic fraud/alerting Processor example;
  state resets after firing.
- ``funnel_tracker``: ordered-stage funnel state machine (streaming twin
  of the batch ``funnel_conversion`` query).
- ``cohort_tracker`` + ``cohort_counts``: cohort-retention deltas with
  out-of-order re-base (streaming twin of ``cohort_retention``).
- ``table_join_enricher``: the KStream–KTable stream-table join — table
  side folds into per-key state (latest-wins), stream side enriches
  as-of processing order (streaming twin of ``asof_join_last_view``).
- ``stream_stream_asof_join``: the event-time-correct stream-stream
  as-of join — both sides buffered in watermark-bounded state, each
  purchase finalized (append-mode, exactly once) only when the
  watermark proves its attribution can't change.
- ``cms_tracker``: count-min sketch row maintainer — fixed-width
  counter state per hash row, hash-compatible with the batch
  ``heavy_hitters_cms`` so streamed counters equal batch counters.
- ``histogram_tracker``: fixed-bin histogram maintainer over a frozen
  [lo, hi] — per-shard counter arrays whose element-wise sum is the
  global histogram (the mergeable streaming quantile state).
- ``space_saving_tracker``: Space-Saving top-k heavy hitters — m slots
  per shard with deterministic per-item error certificates (the
  list-maintaining complement to ``cms_tracker``'s point queries).
- ``hash_reservoir_sampler``: RNG-free uniform k-sample (bottom-k by
  md5 priority; multi-batch state equals the batch bottom-k — the
  streaming twin of ``weighted_sample_documents``'s determinism move).

Scale: state lives in the state store (set RocksDB via
``session.enable_rocksdb_state`` for big keyspaces); keys are hash-
partitioned so each executor owns a shard — same model as Streams tasks.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _grouped_df(grouped) -> DataFrame:
    """Return the DataFrame underlying a ``GroupedData`` (or pass a
    DataFrame through). The per-key processors below accept the grouped
    stream for API symmetry with ``applyInPandasWithState``, but several
    hoist work (md5 hashing, timestamp→µs, stage-index lookup) into JVM
    columns BELOW the state operator — per-row Python in the stateful
    closure is the one hot path Arrow batching can't save, because the
    closure runs once per key per micro-batch (VERDICT r4 item 3). The
    hoist needs the pre-group DataFrame; ``GroupedData`` keeps it as
    ``_df`` (stable across PySpark 3.4–4.x classic mode)."""
    df = getattr(grouped, "_df", None)
    return grouped if df is None else df


# JVM md5-prefix → bigint, hash-compatible with the batch sketches
# (operators/sketches_kmv.py:45, operators/analytics_ext.py:121): the
# closure then folds plain int64s instead of hashing per row in Python.
def _md5_prefix_expr(prefix_expr: str, value_expr: str, n_hex: int) -> str:
    return (
        f"cast(conv(substr(md5(cast(concat({prefix_expr}, "
        f"cast({value_expr} as string)) as binary)), 1, {n_hex}), 16, 10) "
        "as bigint)"
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


def funnel_tracker(grouped, key_col: str, type_col: str, ts_col: str, stages: tuple,
                   window_us: int | None = None):
    """Per-key ordered-stage funnel state machine (streaming twin of the
    batch ``funnel_conversion`` query; with ``window_us`` set, of the
    time-budgeted ``windowed_funnel_events`` — later stages must land
    within the budget of the anchor stage-1 event).

    State per key: (current stage index, its event time, funnel start
    time, done flag). Rows advance the machine only if their event type is
    the NEXT stage and their timestamp is strictly after the current
    stage's — same strict ordering as the batch oracle. Emits exactly one
    row per key, on completion of the final stage; state is kept (done=1)
    so re-deliveries don't re-emit.

    Scale: one state row of 4 longs per key — millions of concurrent
    funnels per executor. The hot path is per-KEY closure overhead, so
    everything per-row happens JVM-side below the state operator: event
    types map to stage indexes (a codegen CASE), timestamps to µs longs,
    and rows that name no stage are dropped before the shuffle (they can
    never advance the machine). The closure compares ints, skips the
    state write when nothing changed, and a done key stays done.
    """
    si = F.when(F.col(type_col) == stages[0], F.lit(0))
    for i, s in enumerate(stages[1:], 1):
        si = si.when(F.col(type_col) == s, F.lit(i))
    pre = (
        _grouped_df(grouped)
        .select(
            F.col(key_col),
            si.alias("__si"),
            F.unix_micros(F.col(ts_col)).alias("__ts"),
        )
        .where(F.col("__si").isNotNull())
    )
    n_stages = len(stages)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        stage, stage_ts, start_ts, done = (
            state.get if state.exists else (-1, -1, -1, 0)
        )
        if done:
            return  # state already says done: no update round-trip
        pairs: list[tuple[int, int]] = []
        for pdf in pdfs:
            if len(pdf):
                pairs.extend(zip(pdf["__ts"].tolist(), pdf["__si"].tolist()))
        if not pairs:
            return
        pairs.sort()
        stage0 = stage
        for ts_us, si_v in pairs:
            if (
                window_us is not None
                and stage >= 0
                and ts_us > start_ts + window_us
            ):
                continue  # beyond the anchor's budget: can't advance
            if si_v == stage + 1 and ts_us > stage_ts:
                stage += 1
                stage_ts = ts_us
                if stage == 0:
                    start_ts = ts_us
                if stage == n_stages - 1:
                    done = 1
                    break
        if stage == stage0:
            return  # machine didn't move: skip the state write
        state.update((stage, stage_ts, start_ts, done))
        if done:
            yield pd.DataFrame(
                {
                    "key": [str(key[0])],
                    "completed_at": [stage_ts],
                    "started_at": [start_ts],
                    "n_stages": [n_stages],
                }
            )

    return pre.groupBy(key_col).applyInPandasWithState(
        fn, FUNNEL_SCHEMA, _FUNNEL_STATE, "append", GroupStateTimeout.NoTimeout
    )


COHORT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cohort_day", LongType()),  # days since epoch
        StructField("day_offset", LongType()),
    ]
)
_COHORT_STATE = "cohort LONG, days ARRAY<BIGINT>"


def _cohort_step(cohort, days: set, batch_days: set):
    """Pure per-key cohort transition: given the stored (cohort, activity
    days) and a batch's activity days, return (new_cohort, all_days,
    days_to_emit). A batch day EARLIER than the stored cohort re-bases the
    cohort and re-emits every stored day under the corrected base — the
    out-of-order-arrival fix that keeps the append-mode output reducible
    to the batch answer (consumer keeps each user's min-cohort rows)."""
    added = batch_days - days
    if not added:
        return cohort, days, []
    all_days = days | added
    new_cohort = min(all_days) if cohort is None else min(cohort, min(added))
    rebased = cohort is not None and new_cohort < cohort
    emit = sorted(all_days) if rebased or cohort is None else sorted(added)
    return new_cohort, all_days, emit


def cohort_tracker(grouped, key_col: str, ts_col: str) -> DataFrame:
    """Per-user cohort-retention state machine (streaming twin of the
    batch ``cohort_retention`` query).

    State per key: (cohort day = min activity day seen, the distinct
    activity-day set — bounded by DAYS, not events). Each micro-batch
    emits one row per NEWLY seen (user, day) as (user_id, cohort_day,
    day_offset); an out-of-order batch that precedes the stored cohort
    re-bases and re-emits the full corrected set. Reduce the output with
    ``cohort_counts`` to get exactly the batch query's table.

    Scale: state is a few longs per user; keys hash-shard across
    executors, and the output stream is |user-days|, not |events|.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cohort, days = state.get if state.exists else (None, [])
        days = {int(d) for d in (days or [])}
        batch_days = set()
        for pdf in pdfs:
            if len(pdf):
                batch_days.update(
                    int(x)
                    for x in pdf[ts_col].values.astype("datetime64[D]").astype("int64")
                )
        cohort, days, emit = _cohort_step(cohort, days, batch_days)
        state.update((cohort, sorted(days)))
        if emit:
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])] * len(emit),
                    "cohort_day": [cohort] * len(emit),
                    "day_offset": [d - cohort for d in emit],
                }
            )

    return grouped.applyInPandasWithState(
        fn, COHORT_SCHEMA, _COHORT_STATE, "append", GroupStateTimeout.NoTimeout
    )


def cohort_counts(rows: DataFrame) -> DataFrame:
    """Reduce ``cohort_tracker`` output to the batch ``cohort_retention``
    table: keep each user's min-cohort rows (re-bases obsolete earlier
    emissions), distinct the (user, cohort, offset) triples, count users
    per (cohort_day, day_offset).

    ``rows`` must be a materialized table (sink read-back or a
    checkpointed DF): this self-joins its input, which the optimizer
    can't plan directly over a memory-sink query (NOTES.md edge #9)."""
    base = rows.groupBy("user_id").agg(F.min("cohort_day").alias("c0"))
    return (
        rows.join(base, "user_id")
        .filter(F.col("cohort_day") == F.col("c0"))
        .select("user_id", "cohort_day", "day_offset")
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


ASOF_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", LongType()),             # µs epoch
        StructField("view_event_id", LongType()),  # nullable: no prior view
        StructField("view_ts", LongType()),
    ]
)
_ASOF_STATE = "view_ts LONG, view_id LONG"


def _asof_step(state_view, rows):
    """Pure per-key KStream-KTable step: ``state_view`` is (view_ts µs,
    view_id) or None; ``rows`` is the batch's [(ts µs, event_id, side)]
    — side 0 updates the table (a view), side 1 reads it (a purchase).
    Rows are processed in (ts, side, event_id) order so a same-µs view
    beats the purchase reading it (ASOF >= semantics). Returns
    (new_state, emitted purchases)."""
    out = []
    for ts, eid, side in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        if side == 0:
            if state_view is None or (ts, eid) > state_view:
                state_view = (ts, eid)
        else:
            out.append((eid, ts, state_view))
    return state_view, out


def table_join_enricher(grouped, ts_col: str, id_col: str, side_col: str) -> DataFrame:
    """KStream–KTable join (the Kafka Streams stream-table enrichment):
    the table side (side=0 rows) folds into per-key state — latest
    (ts, id) wins, the compacted-topic 'latest value per key' contract —
    and each stream-side row (side=1) is enriched with the state AS OF
    its processing. Within a micro-batch rows apply in event-time order;
    ACROSS batches the table reflects everything previously processed —
    exactly Kafka Streams' processing-order semantics for stream-table
    joins (a late-arriving table update does NOT retro-correct an
    already-emitted join result).

    When each key's rows arrive in event-time order the output equals the
    batch as-of join (`asof_join_last_view`) — asserted in tests.

    Scale: state is two longs per key; output is |stream side|, and the
    only exchange is the groupBy hash-shard — the same topology Streams
    runs with its RocksDB task stores.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        held = state.get if state.exists else None
        view = None if held is None or held[0] is None else (held[0], held[1])
        rows = []
        for pdf in pdfs:
            if len(pdf):
                ts_us = pdf[ts_col].to_numpy("datetime64[us]").view("int64")
                rows.extend(
                    zip(ts_us.tolist(), pdf[id_col].tolist(), pdf[side_col].tolist())
                )
        view, out = _asof_step(view, rows)
        state.update(view if view is not None else (None, None))
        if out:
            yield pd.DataFrame(
                {
                    "event_id": [e for e, _, _ in out],
                    "user_id": [int(key[0])] * len(out),
                    "ts": [t for _, t, _ in out],
                    "view_event_id": [v[1] if v else None for _, _, v in out],
                    "view_ts": [v[0] if v else None for _, _, v in out],
                }
            )

    return grouped.applyInPandasWithState(
        fn, ASOF_SCHEMA, _ASOF_STATE, "append", GroupStateTimeout.NoTimeout
    )


_ASOF_BUF_STATE = (
    "view_ts ARRAY<LONG>, view_id ARRAY<LONG>, "
    "p_ts ARRAY<LONG>, p_id ARRAY<LONG>"
)


def _asof_buffer_step(views, purchases, rows, wm_us):
    """Pure per-key step for the EVENT-TIME-correct stream-stream as-of
    join. ``views``/``purchases`` are the buffered [(ts µs, id)] lists,
    ``rows`` the batch's [(ts, id, side)] arrivals (side 0 = view),
    ``wm_us`` the current watermark. Returns (views', purchases',
    emitted) where emitted purchases have ts < wm_us — finalized only
    once no view at-or-before them can still arrive (any later view has
    ts >= wm). Ties: the view with max (ts, id) among view_ts <= p_ts
    wins, matching the batch query's ASOF >= + last() semantics.

    View buffer pruning: a view strictly older than the watermark is
    superseded — for every purchase still possible (ts >= wm) — by any
    later view also <= wm, so only the LATEST pre-watermark view is
    retained; views >= wm are all kept (a future purchase may fall
    between them). State is therefore O(views inside the watermark
    horizon) + O(pending purchases), both watermark-bounded.
    """
    for ts, eid, side in rows:
        (views if side == 0 else purchases).append((ts, eid))
    views.sort()
    purchases.sort()
    emit, hold = [], []
    for ts, eid in purchases:
        if ts < wm_us:
            best = None
            for v in views:
                if v[0] <= ts:
                    best = v  # views sorted asc → last qualifying wins
                else:
                    break
            emit.append((eid, ts, best))
        else:
            hold.append((ts, eid))
    recent = [v for v in views if v[0] >= wm_us]
    older = [v for v in views if v[0] < wm_us]
    keep = ([max(older)] if older else []) + recent
    return keep, hold, emit


def stream_stream_asof_join(grouped, ts_col: str, id_col: str, side_col: str) -> DataFrame:
    """Stream-stream AS-OF join with watermarked buffering — the
    event-time-correct sibling of ``table_join_enricher``. Where the
    KStream-KTable join resolves in PROCESSING order (a late view never
    retro-attributes), this operator buffers BOTH sides in per-key state
    and finalizes each purchase only when the watermark proves its
    attribution can no longer change; arrival order inside the watermark
    horizon is irrelevant (multi-batch out-of-order test-asserted equal
    to the batch as-of join).

    ``grouped`` must come from a ``withWatermark``-ed stream grouped by
    the join key. Pending purchases arm an event-time timer at their own
    timestamp so they flush when the watermark passes even if the key
    receives no further rows. Emission is append-mode (each purchase
    exactly once), Kafka-sink friendly.

    Scale: state per key = watermark-horizon views + pending purchases
    (see ``_asof_buffer_step``); keys hash-shard across executors; the
    only exchange is the groupBy. This is SURVEY.md §2.4 J2's temporal
    cousin expressed through §2.10 X1 machinery.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf):
                    ts_us = pdf[ts_col].to_numpy("datetime64[us]").view("int64")
                    rows.extend(
                        zip(
                            ts_us.tolist(),
                            pdf[id_col].tolist(),
                            pdf[side_col].tolist(),
                        )
                    )
        held = state.get if state.exists else ([], [], [], [])
        views = list(zip(held[0] or [], held[1] or []))
        purchases = list(zip(held[2] or [], held[3] or []))
        wm_ms = state.getCurrentWatermarkMs()
        views, purchases, emitted = _asof_buffer_step(
            views, purchases, rows, wm_ms * 1000
        )
        if views or purchases:
            state.update(
                (
                    [v[0] for v in views],
                    [v[1] for v in views],
                    [p[0] for p in purchases],
                    [p[1] for p in purchases],
                )
            )
            if purchases:
                # flush pending purchases once the watermark passes them
                state.setTimeoutTimestamp(
                    max(purchases[0][0] // 1000 + 1, wm_ms + 1)
                )
        else:
            state.remove()
        if emitted:
            yield pd.DataFrame(
                {
                    "event_id": [e for e, _, _ in emitted],
                    "user_id": [int(key[0])] * len(emitted),
                    "ts": [t for _, t, _ in emitted],
                    "view_event_id": [v[1] if v else None for _, _, v in emitted],
                    "view_ts": [v[0] if v else None for _, _, v in emitted],
                }
            )

    return grouped.applyInPandasWithState(
        fn, ASOF_SCHEMA, _ASOF_BUF_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )


# ---------------------------------------------------------------------------
# KMV distinct tracker — streaming twin of the batch KMV/theta sketches
# (operators/sketches_kmv.py)
# ---------------------------------------------------------------------------

KMV_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_minima", LongType()),
        StructField("est_distinct", DoubleType()),
    ]
)
_KMV_STATE = "hv ARRAY<LONG>"
_KMV_DOMAIN = float(2**32)  # first 8 md5 hex chars


def kmv_distinct_tracker(grouped, key_col: str, id_col: str, k: int = 32) -> DataFrame:
    """Per-key distinct-count estimate as a KMV (k-minimum-values) sketch
    changelog: state is the k smallest md5 hashes seen for the key —
    O(k) longs per key regardless of stream length, the property that
    lets a distinct-count dashboard run forever. Estimates are exact
    while the key has < k distinct ids (the sketch IS the set), then
    switch to the (k-1)/theta estimator. Hashing matches the batch
    ``kmv_type_overlap`` exactly (md5('kmv:'||id) first 8 hex chars),
    so a state snapshot max-merged with a batch sketch is meaningful —
    min-k sets merge by union+truncate, same as sketch rollups.

    The md5 is computed as a JVM column below the state operator (the
    exact ``sketches_kmv._HV`` expression, so hash-compatibility with
    the batch sketch holds by construction); the closure only folds
    int64s — no per-row Python hashing in the stateful hot path.
    """
    pre = _grouped_df(grouped).selectExpr(
        key_col, _md5_prefix_expr("'kmv:'", id_col, 8) + " AS __hv"
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        minima = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            minima.update(pdf["__hv"].tolist())
        kept = sorted(minima)[:k]
        state.update((kept,))
        est = (
            float(len(kept))
            if len(kept) < k
            else (k - 1) * _KMV_DOMAIN / kept[-1]
        )
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_minima": [len(kept)],
                "est_distinct": [round(est, 2)],
            }
        )

    return pre.groupBy(key_col).applyInPandasWithState(
        fn, KMV_SCHEMA, _KMV_STATE, "update", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# Welford anomaly detector — streaming twin of zscore_outlier_events
# ---------------------------------------------------------------------------

ANOMALY_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("n_seen", LongType()),
    ]
)
_ANOMALY_STATE = "n LONG, mean DOUBLE, m2 DOUBLE"


def anomaly_detector(
    grouped,
    key_col: str,
    value_col: str,
    id_col: str,
    z_threshold: float = 3.0,
    min_n: int = 10,
) -> DataFrame:
    """Per-key streaming z-score anomaly detection with Welford's online
    mean/variance — the numerically stable recurrence (no sum-of-squares
    catastrophic cancellation), O(3 numbers) state per key forever.

    Each row is scored against the statistics of all PRIOR rows for its
    key (so an outlier can't mask itself), then folded into the state.
    Alerts emit in append mode once the key has ``min_n`` observations.
    The batch twin (zscore_outlier_events) scores against the full-pass
    statistics; this is the causal, one-pass version a live pipeline
    runs. Welford states also merge pairwise (Chan's parallel formula)
    if state ever needs re-sharding.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        alerts = {"key": [], "event_id": [], "value": [], "zscore": [], "n_seen": []}
        rows = []
        for pdf in pdfs:
            if len(pdf):
                rows.extend(zip(pdf[id_col].tolist(), pdf[value_col].tolist()))
        rows.sort()  # event-id order: deterministic replay regardless of batching
        for eid, v in rows:
            if n >= min_n:
                var = m2 / (n - 1)
                if var > 0:
                    z = (v - mean) / var**0.5
                    if abs(z) >= z_threshold:
                        alerts["key"].append(str(key[0]))
                        alerts["event_id"].append(eid)
                        alerts["value"].append(v)
                        alerts["zscore"].append(round(z, 6))
                        alerts["n_seen"].append(n)
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        state.update((n, mean, m2))
        if alerts["key"]:
            yield pd.DataFrame(alerts)

    return grouped.applyInPandasWithState(
        fn, ANOMALY_SCHEMA, _ANOMALY_STATE, "append", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# decayed counter — streaming twin of trending_decayed_topk
# ---------------------------------------------------------------------------

DECAY_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("last_ts_us", LongType()),
        StructField("decayed_count", DoubleType()),
        StructField("n_events", LongType()),
    ]
)
_DECAY_STATE = "last_ts_us LONG, score DOUBLE, n LONG"


def decayed_counter(grouped, key_col: str, ts_us_col: str, halflife_us: float) -> DataFrame:
    """Per-key exponentially decayed event count as O(1) state: the score
    is referenced at the newest event time; folding an event multiplies
    the old score by the elapsed decay and adds 1 (the telescoping form
    of the batch sum Σ 2^(-(T-tᵢ)/halflife) that trending_decayed_topk
    computes over history — equal up to float associativity, test-bounded).
    Events fold in event-time order within each batch so replays are
    deterministic; out-of-order events still fold correctly because
    2^(-(t_new-t_old)/hl) telescopes regardless of arrival order ONLY
    under in-order folding — late events are decayed relative to the
    newest time instead (the standard forward-decay compromise).
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last, score, n = state.get if state.exists else (None, 0.0, 0)
        ts_list: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                ts_list.extend(pdf[ts_us_col].tolist())
        for t in sorted(ts_list):
            if last is None:
                score, last = 1.0, t
            elif t >= last:
                score = score * 2.0 ** (-(t - last) / halflife_us) + 1.0
                last = t
            else:  # late event: decay its unit contribution to "now"
                score += 2.0 ** (-(last - t) / halflife_us)
            n += 1
        state.update((last, score, n))
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "last_ts_us": [last],
                "decayed_count": [score],
                "n_events": [n],
            }
        )

    return grouped.applyInPandasWithState(
        fn, DECAY_SCHEMA, _DECAY_STATE, "update", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# count-min sketch tracker — streaming twin of operators.sketches_cms
# ---------------------------------------------------------------------------

CMS_SCHEMA = StructType(
    [
        StructField("j", LongType()),
        StructField("counters", ArrayType(LongType())),
        StructField("total", LongType()),
    ]
)
_CMS_STATE = "counters ARRAY<LONG>"


def cms_tracker(grouped, key_col: str, w: int = 256, j_col: str = "j") -> DataFrame:
    """Streaming count-min row maintainer.

    ``grouped`` is the stream pre-exploded to one row per (hash-row j,
    key) and grouped by ``j`` — each of the d hash rows is ONE state key
    holding a fixed w-length counter array, so total state is d x w
    longs forever (the sketch property that makes a frequency dashboard
    run unbounded). Buckets use the same md5('cms{j}:{key}') derivation
    as the batch ``heavy_hitters_cms`` (computed as a JVM column below
    the state operator — the closure is one ``np.bincount`` per batch):
    a streamed counter row merged (element-wise summed) with a
    batch-built row is meaningful, and the multi-batch test asserts
    streamed state equals the batch counters over the union of all
    micro-batches.
    """
    pre = _grouped_df(grouped).selectExpr(
        j_col,
        _md5_prefix_expr(
            f"concat('cms', cast({j_col} as string), ':')", key_col, 15
        )
        + f" % {int(w)} AS __b",
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        j = int(key[0])
        counters = (
            np.asarray(state.get[0], dtype="int64")
            if state.exists
            else np.zeros(w, dtype="int64")
        )
        for pdf in pdfs:
            counters += np.bincount(
                pdf["__b"].to_numpy(dtype="int64"), minlength=w
            )
        out = counters.tolist()
        state.update((out,))
        yield pd.DataFrame(
            {"j": [j], "counters": [out], "total": [int(counters.sum())]}
        )

    return pre.groupBy(j_col).applyInPandasWithState(
        fn, CMS_SCHEMA, _CMS_STATE, "update", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# histogram tracker — streaming twin of operators.sketches_histogram
# ---------------------------------------------------------------------------

HIST_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("counters", ArrayType(LongType())),
        StructField("total", LongType()),
    ]
)
_HIST_STATE = "counters ARRAY<LONG>"


def histogram_tracker(
    grouped, value_col: str, lo: float, hi: float, bins: int = 128
) -> DataFrame:
    """Streaming fixed-bin histogram maintainer.

    ``grouped`` is the stream grouped by a shard key (any hash of the
    value works — shards exist for parallelism, not semantics); each
    shard holds its own ``bins``-length counter array, and the global
    histogram at read time is the element-wise sum over shards — the
    mergeability that makes fixed-bin histograms THE streaming quantile
    state (same bin rule as the batch ``histogram_quantile_sketch``:
    equal width over a FROZEN [lo, hi] — streaming can't re-derive
    extremes per batch without rewriting history, so the range is a
    declared parameter here, exactly how production t-digest/KLL
    deployments freeze their scale)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        counters = (
            np.asarray(state.get[0], dtype="int64")
            if state.exists
            else np.zeros(bins, dtype="int64")
        )
        width = (hi - lo) / bins
        for pdf in pdfs:
            if not len(pdf):
                continue
            v = pdf[value_col].to_numpy(dtype="float64")
            if width > 0:
                # int() truncates toward zero, as astype does; clamp both ends
                b = np.clip(((v - lo) / width).astype("int64"), 0, bins - 1)
            else:
                b = np.zeros(len(v), dtype="int64")
            counters += np.bincount(b, minlength=bins)
        out = counters.tolist()
        state.update((out,))
        yield pd.DataFrame(
            {
                "shard": [int(key[0])],
                "counters": [out],
                "total": [int(counters.sum())],
            }
        )

    return grouped.applyInPandasWithState(
        fn, HIST_SCHEMA, _HIST_STATE, "update", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# Space-Saving heavy hitters — deterministic-guarantee top-k state
# ---------------------------------------------------------------------------

SS_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("item", StringType()),
        StructField("est_count", LongType()),
        StructField("max_err", LongType()),
        StructField("n_processed", LongType()),
    ]
)
_SS_STATE = "items ARRAY<STRING>, counts ARRAY<LONG>, errs ARRAY<LONG>, n LONG"


def space_saving_tracker(
    grouped, shard_col: str, item_col: str, m: int = 64, topk: int = 10
) -> DataFrame:
    """Space-Saving (Metwally/Agrawal/El Abbadi 2005) top-k maintainer:
    exactly ``m`` (item, count, err) slots per shard — O(m) state
    forever, like ``cms_tracker`` but with per-item DETERMINISTIC bounds
    instead of probabilistic ones: true_count is always within
    [est_count - max_err, est_count], and every item whose true
    frequency exceeds n/m is guaranteed to be in the summary, whatever
    the arrival order. A new item evicts the current minimum-count slot
    (ties broken by item string, so replay is deterministic) and
    inherits its count as the error bound. Emits the shard's top-k
    each micro-batch (update mode). The complement to ``cms_tracker``:
    CMS answers point queries about any item; Space-Saving maintains
    the top-k list itself with certificates."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errs, n = state.get
            tab: dict = {it: [c, e] for it, c, e in zip(items, counts, errs)}
            n = int(n)
        else:
            tab, n = {}, 0
        for pdf in pdfs:
            for v in pdf[item_col].astype(str).tolist():
                n += 1
                slot = tab.get(v)
                if slot is not None:
                    slot[0] += 1
                elif len(tab) < m:
                    tab[v] = [1, 0]
                else:
                    ev_item, ev = min(
                        tab.items(), key=lambda kv: (kv[1][0], kv[0])
                    )
                    del tab[ev_item]
                    tab[v] = [ev[0] + 1, ev[0]]
        ordered = sorted(tab)
        state.update(
            (
                ordered,
                [tab[i][0] for i in ordered],
                [tab[i][1] for i in ordered],
                n,
            )
        )
        top = sorted(tab.items(), key=lambda kv: (-kv[1][0], kv[0]))[:topk]
        yield pd.DataFrame(
            {
                "shard": [str(key[0])] * len(top),
                "item": [t[0] for t in top],
                "est_count": [t[1][0] for t in top],
                "max_err": [t[1][1] for t in top],
                "n_processed": [n] * len(top),
            }
        )

    return grouped.applyInPandasWithState(
        fn, SS_SCHEMA, _SS_STATE, "update", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# bottom-k-by-hash reservoir — deterministic uniform sample of a stream
# ---------------------------------------------------------------------------

RESERVOIR_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("sample", ArrayType(StringType())),
        StructField("n_seen", LongType()),
        StructField("n_distinct_tracked", LongType()),
    ]
)
_RESERVOIR_STATE = "hashes ARRAY<LONG>, items ARRAY<STRING>, n LONG"


def hash_reservoir_sampler(
    grouped, key_col: str, item_col: str, k: int = 32
) -> DataFrame:
    """Uniform k-sample of an unbounded stream with NO RNG: keep the k
    items with the smallest md5 priorities (the hash-based variant of
    reservoir sampling / Efraimidis-Spirakis with unit weights — the
    same determinism move as the batch ``weighted_sample_documents``).
    Because min-k sets merge by union+truncate, the state after any
    number of micro-batches equals the batch bottom-k over everything
    seen — replay- and checkpoint-stable, O(k) state per key. Distinct
    items only (a re-arriving item keeps its priority), which is what a
    training-data spot-check sample wants. md5 priorities are a JVM
    column below the state operator; the closure folds (int64, str)
    pairs only."""
    pre = _grouped_df(grouped).selectExpr(
        key_col,
        f"cast({item_col} as string) AS __item",
        _md5_prefix_expr("'rsv:'", item_col, 15) + " AS __hv",
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hs, its, n = state.get
            pool = dict(zip(hs, its))
            n = int(n)
        else:
            pool, n = {}, 0
        for pdf in pdfs:
            n += len(pdf)
            pool.update(zip(pdf["__hv"].tolist(), pdf["__item"].tolist()))
        kept = sorted(pool)[:k]
        pool = {h: pool[h] for h in kept}
        state.update((kept, [pool[h] for h in kept], n))
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "sample": [[pool[h] for h in kept]],
                "n_seen": [n],
                "n_distinct_tracked": [len(kept)],
            }
        )

    return pre.groupBy(key_col).applyInPandasWithState(
        fn, RESERVOIR_SCHEMA, _RESERVOIR_STATE, "update", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# Saturation tracker — streaming twin of dedup_saturation_curve
# ---------------------------------------------------------------------------

SATURATION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_seen", LongType()),
        StructField("est_distinct", DoubleType()),
        StructField("yield_permille", LongType()),
    ]
)
_SAT_STATE = "n LONG, hv ARRAY<LONG>"


def saturation_tracker(grouped, key_col: str, id_col: str, k: int = 64) -> DataFrame:
    """Per-key unique-yield monitor: how much of this source's stream is
    still NEW content (the streaming twin of the batch
    ``dedup_saturation_curve`` — same question, per trigger instead of
    per decile). State per key is one counter plus a KMV min-k set —
    O(k) regardless of stream length — so the yield dashboard runs
    forever on bounded state. Hashing matches ``kmv_distinct_tracker``
    ('kmv:'||id), so estimates snapshot-merge with the batch sketches.
    yield_permille = round(1000 x est_distinct / n_seen): a source
    whose permille trends toward 0 is saturated — more crawl is
    re-reading the same content.

    Like ``kmv_distinct_tracker``, the md5 is a JVM column below the
    state operator; the closure folds int64s only.
    """
    pre = _grouped_df(grouped).selectExpr(
        key_col, _md5_prefix_expr("'kmv:'", id_col, 8) + " AS __hv"
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, kept = state.get
            minima = set(kept)
        else:
            n, minima = 0, set()
        for pdf in pdfs:
            n += len(pdf)
            minima.update(pdf["__hv"].tolist())
        kept = sorted(minima)[:k]
        state.update((n, kept))
        est = (
            float(len(kept))
            if len(kept) < k
            else (k - 1) * _KMV_DOMAIN / kept[-1]
        )
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_seen": [n],
                "est_distinct": [round(est, 2)],
                "yield_permille": [int(round(1000.0 * est / n)) if n else 0],
            }
        )

    return pre.groupBy(key_col).applyInPandasWithState(
        fn, SATURATION_SCHEMA, _SAT_STATE, "update", GroupStateTimeout.NoTimeout
    )
