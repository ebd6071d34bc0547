"""Streaming operator builders (SURVEY.md §2.5 A1-A6, §2.4 J1-J2, §2.9 T1-T8).

Each function takes a *streaming* DataFrame and returns the transformed
streaming DataFrame — the same expressions the batch operators in
``operators/windows.py`` use (one logical definition, two execution modes;
the duality the reference gets from Kafka Streams' KStream/KTable model).

State-scale notes (T4): windowed aggs + dedup keep per-key state in the
state store — set the RocksDB provider for big keyspaces
(``session.enable_rocksdb_state``); watermarks bound state growth (T2);
``maxOffsetsPerTrigger`` on the source bounds batch size (T7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import TimestampNTZType


def _watermarkable(stream: DataFrame, ts_col: str) -> DataFrame:
    """withWatermark requires TIMESTAMP (instant); NTZ event-time columns
    (e.g. derived from nanos) are cast here — sessions are UTC-pinned, so
    the instant interpretation is deterministic."""
    field = stream.schema[ts_col]
    if isinstance(field.dataType, TimestampNTZType):
        return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    window_size: str,
    keys: list[str],
    aggs: list,
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/hopping window aggregate with late-data watermark (A2/A3/T2)."""
    win = (
        F.window(ts_col, window_size, slide) if slide else F.window(ts_col, window_size)
    )
    return (
        _watermarkable(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(win.alias("window"), *keys)
        .agg(*aggs)
    )


def session_agg(
    stream: DataFrame, ts_col: str, gap: str, keys: list[str], aggs: list,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session-window aggregate (A4, Kafka Streams SessionWindows)."""
    return (
        _watermarkable(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("session"), *keys)
        .agg(*aggs)
    )


def running_agg(stream: DataFrame, keys: list[str], aggs: list) -> DataFrame:
    """Unwindowed continuously-updated aggregate (A1) — update/complete mode."""
    return stream.groupBy(*keys).agg(*aggs)


def dedup_within_watermark(
    stream: DataFrame, subset: list[str], ts_col: str, watermark: str
) -> DataFrame:
    """Streaming exact dedup with bounded state (A6)."""
    return _watermarkable(stream, ts_col).withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(subset)


def stream_static_join(
    stream: DataFrame, dim: DataFrame, on, how: str = "inner", broadcast: bool = True
) -> DataFrame:
    """Stream-table enrichment (J1): dim re-read per micro-batch; broadcast
    keeps the stream side shuffle-free."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | None,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark: str = "10 minutes",
    how: str = "inner",
    left_key: str | None = None,
    right_key: str | None = None,
) -> DataFrame:
    """Stream-stream windowed equi-join (J2, Kafka Streams JoinWindows).

    ``right_ts ∈ [left_ts - lower, left_ts + upper]``; both sides
    watermarked so join state is droppable. ``how`` supports inner /
    leftOuter / fullOuter (outer rows emit with nulls once the watermark
    passes — Kafka Streams' leftOuter/outerJoin grace semantics). Pass
    ``key`` when both sides share the column name, or ``left_key`` +
    ``right_key`` when they differ.
    """
    lk, rk = left_key or key, right_key or key
    lw = _watermarkable(left, left_ts).withWatermark(left_ts, watermark)
    rw = _watermarkable(right, right_ts).withWatermark(right_ts, watermark)
    cond = (
        (lw[lk] == rw[rk])
        & (rw[right_ts] >= F.expr(f"{left_ts} - INTERVAL {lower}"))
        & (rw[right_ts] <= F.expr(f"{left_ts} + INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)


def foreach_batch_upsert(
    stream: DataFrame, path: str, keys: list[str], order_col: str
) -> DataStreamWriter:
    """Changelog → compacted-table sink (T5/A5): per-batch MERGE-style upsert.

    Kafka sinks are append-only; update-mode outputs (e.g. running aggs or
    latest-by-key tables) land via foreachBatch: union existing + batch,
    keep arg-max(order_col) per key, publish. Exactly-once through
    idempotent generation publish per batch id (SURVEY.md §2.9 T5).

    State lands as generation dirs + an atomic pointer swap
    (``streaming/state_table.py``) — the live state is never deleted
    before its replacement commits, so a crash mid-publish or a
    cache-loss lineage recompute can't destroy it (the overwrite-in-
    place + cache()+count() pattern this replaced could). Read it back
    with :func:`read_upserted`.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        from kafka_stream_spark.streaming.state_table import (
            current_dir,
            publish_single,
        )

        spark = batch_df.sparkSession
        others = [c for c in batch_df.columns if c not in keys]
        ord_key = F.struct(F.col(order_col))
        prev = current_dir(path)
        merged = (
            spark.read.parquet(prev).unionByName(batch_df) if prev else batch_df
        )
        compacted = merged.groupBy(*keys).agg(
            *[F.max_by(c, ord_key).alias(c) for c in others]
        )
        publish_single(compacted, path, batch_id)

    return stream.writeStream.foreachBatch(upsert)


def read_upserted(spark, path: str) -> DataFrame:
    """Read a ``foreach_batch_upsert`` state table (committed
    generation resolved through the pointer)."""
    from kafka_stream_spark.streaming.state_table import read_state

    return read_state(spark, path)


def foreach_batch_merge(
    stream: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
    num_buckets: int = 64,
) -> DataStreamWriter:
    """Partition-pruned MERGE upsert sink (scale path for T5/A5).

    ``foreach_batch_upsert`` rewrites the WHOLE state table every batch —
    fine for small dimension tables, O(state) per batch at 100 TB. This
    variant hash-buckets the table by key into ``num_buckets`` parquet
    partitions (``_bucket=pmod(hash(keys), n)``) and, per micro-batch:

    1. finds the buckets the batch actually touches (k of n),
    2. reads ONLY those partitions back (partition pruning on the scan),
    3. compacts union(current ∩ buckets, batch) by arg-max(order_col),
    4. rewrites ONLY those partitions via dynamic partition overwrite.

    Cost per batch is O(state/n × k + batch), not O(state): with uniform
    keys and a batch touching k buckets the rewrite fraction is k/n.
    Replaying a batch rewrites the same buckets with the same merged
    content — idempotent, like the full-rewrite variant (T5).

    This is the Delta/Iceberg MERGE INTO pattern expressed with plain
    parquet + per-bucket generation pointers (``streaming/
    state_table.py`` — no table-format dependency in this container);
    swap `.format("delta")` in when available for file-level (vs
    partition-level) pruning. Dynamic partition overwrite was NOT
    enough here: its commitJob deletes a partition before renaming the
    replacement in, so a crash inside the commit could lose an entire
    bucket; the pointer swap has no such window.
    """

    bucket = F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(num_buckets))

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        from kafka_stream_spark.streaming.state_table import (
            ensure_bucket_count,
            partition_dir,
            publish_partitions,
        )

        spark = batch_df.sparkSession
        ensure_bucket_count(path, num_buckets)
        batch_b = batch_df.withColumn("_bucket", bucket)
        others = [c for c in batch_df.columns if c not in keys]
        ord_key = F.struct(F.col(order_col))
        touched = sorted(
            r["_bucket"] for r in batch_b.select("_bucket").distinct().collect()
        )
        if not touched:
            return
        live = [d for b in touched if (d := partition_dir(path, "_bucket", b))]
        merged = batch_b
        if live:
            # _bucket re-derives from the keys (partitionBy strips it)
            prior = spark.read.parquet(*live).withColumn("_bucket", bucket)
            merged = prior.unionByName(batch_b)
        compacted = merged.groupBy(*keys).agg(
            *[F.max_by(c, ord_key).alias(c) for c in others],
            F.first("_bucket").alias("_bucket"),  # function of keys, constant per group
        )
        publish_partitions(compacted, path, batch_id, "_bucket", touched)

    return stream.writeStream.foreachBatch(merge)


def read_merged(spark, path: str) -> DataFrame:
    """Read a ``foreach_batch_merge`` state table (committed bucket
    pointers resolved; the bucket column is not materialized in the
    data files)."""
    from kafka_stream_spark.streaming.state_table import read_state

    df = read_state(spark, path, partition_col="_bucket")
    if df is None:
        raise ValueError(f"no committed merge state at {path}")
    return df


def trending_topk(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window: str,
    path: str,
    watermark: str = "30 minutes",
) -> DataStreamWriter:
    """Trending keys per time window (the Lenses live-dashboard query):
    windowed counts in update mode, upserted into a compacted per-
    (window, key) count table; rank at READ time via ``read_trending``.

    Per-window ranking can't run inside an update-mode streaming plan
    (no window functions over streaming aggregates), so the scalable
    split is: the stream maintains counts — state bounded by watermark,
    shuffle is the windowed groupBy only — and the top-k is a cheap
    window function over the (small) materialized count table.
    """
    agg = windowed_agg(
        stream, ts_col, window, [key_col], [F.count(F.lit(1)).alias("n")],
        watermark=watermark,
    )
    flat = agg.select(F.col("window.start").alias("window_start"), key_col, "n")
    # update mode: emit count rows as they CHANGE, not when the watermark
    # closes the window (append would hold every count until finalization
    # — a dashboard that only shows dead windows); the upsert's
    # max_by(n) compaction makes re-emissions idempotent
    return foreach_batch_upsert(
        flat, path, keys=["window_start", key_col], order_col="n"
    ).outputMode("update")


def read_trending(spark, path: str, k: int = 3) -> DataFrame:
    """Rank a ``trending_topk`` count table: top-k keys per window."""
    from pyspark.sql import Window

    t = read_upserted(spark, path)
    key_cols = [c for c in t.columns if c not in ("window_start", "n")]
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), *key_cols)
    return (
        t.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )
