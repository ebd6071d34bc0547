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
    keep arg-max(order_col) per key, rewrite. Exactly-once-ish through
    idempotent overwrite per batch id (SURVEY.md §2.9 T5).
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        import os

        others = [c for c in batch_df.columns if c not in keys]
        ord_key = F.struct(F.col(order_col))
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            current = spark.read.parquet(path)
            merged = current.unionByName(batch_df)
        else:
            merged = batch_df
        compacted = merged.groupBy(*keys).agg(
            *[F.max_by(c, ord_key).alias(c) for c in others]
        )
        # materialize before overwrite (reading + overwriting the same path)
        compacted.cache()
        compacted.count()
        compacted.write.mode("overwrite").parquet(path)
        compacted.unpersist()

    return stream.writeStream.foreachBatch(upsert)


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
    parquet + Spark's ``partitionOverwriteMode=dynamic`` (no table-format
    dependency in this container); swap `.format("delta")` in when
    available for file-level (vs partition-level) pruning.
    """

    bucket = F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(num_buckets))

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        batch_b = batch_df.withColumn("_bucket", bucket)
        others = [c for c in batch_df.columns if c not in keys]
        ord_key = F.struct(F.col(order_col))
        exists = os.path.isdir(path) and any(
            not f.startswith((".", "_")) for f in os.listdir(path)
        )
        if exists:
            touched = [r["_bucket"] for r in batch_b.select("_bucket").distinct().collect()]
            current = spark.read.parquet(path).filter(F.col("_bucket").isin(touched))
            merged = current.unionByName(batch_b)
        else:
            merged = batch_b
        compacted = merged.groupBy(*keys).agg(
            *[F.max_by(c, ord_key).alias(c) for c in others],
            F.first("_bucket").alias("_bucket"),  # function of keys, constant per group
        )
        compacted.cache()
        compacted.count()  # materialize before overwriting what we read
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            compacted.write.mode("overwrite").partitionBy("_bucket").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            compacted.unpersist()

    return stream.writeStream.foreachBatch(merge)


def read_merged(spark, path: str) -> DataFrame:
    """Read a ``foreach_batch_merge`` state table without the bucket column."""
    return spark.read.parquet(path).drop("_bucket")


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

    t = spark.read.parquet(path)
    key_cols = [c for c in t.columns if c not in ("window_start", "n")]
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), *key_cols)
    return (
        t.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )
