"""Streaming continuous aggregate: incremental HLL register maintenance.

The streaming twin of ``hll_window_rollup`` (operators/analytics_ext).
A `foreachBatch` sink folds each micro-batch's (day, hour, bucket)
registers into a parquet-backed register table by element-wise MAX —
the same merge the batch rollup and the HLL property test rely on, so
the maintained state is bit-identical to registers built from all data
at once (order- and batching-independent: max is commutative,
associative, idempotent). Day/week/month estimates are then read-time
aggregations over the tiny register table; raw events are touched
exactly once, as they arrive.

This is the Lenses "continuous SQL processor materializing a table"
shape (SURVEY.md §3.3) applied to a sketch: state is O(days × 24 × m)
longs regardless of event volume, and the table answers
distinct-per-window without re-scanning any history.

Scale: the register table is partitioned by day; each batch overwrites
only the days it touched (dynamic partition overwrite), so per-batch
cost is O(touched days × 24 × m + batch), never O(history) — the same
argument as streaming/ops.foreach_batch_upsert, with max-merge instead
of latest-wins.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators.analytics_ext import (
    hll_estimate_col,
    hll_hour_registers,
)


class HllRegisterMaintainer:
    """foreachBatch state keeper for hourly HLL registers."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir

    def _merge(self, batch_df: DataFrame, batch_id: int) -> None:
        new = hll_hour_registers(batch_df)
        spark = batch_df.sparkSession
        if os.path.isdir(self.state_dir):
            touched = [r.day for r in new.select("day").distinct().collect()]
            if not touched:
                return
            old = spark.read.parquet(self.state_dir).where(
                F.col("day").isin(touched)
            )
            # localCheckpoint materializes the merged registers (tiny:
            # days x 24 x 2^p rows) BEFORE the overwrite so the plan
            # never reads the path it is rewriting
            merged = (
                old.unionByName(new)
                .groupBy("day", "hr", "bucket")
                .agg(F.max("m_j").alias("m_j"))
                .localCheckpoint()
            )
            # rewrite only the touched day partitions; the overwrite mode
            # is scoped to THIS write (a session-level conf.set here would
            # leak to every other write in the session)
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("day")
                .parquet(self.state_dir)
            )
        else:
            (
                new.write.mode("overwrite").partitionBy("day").parquet(self.state_dir)
            )

    def attach(self, stream_df: DataFrame, checkpoint_dir: str):
        """Start the maintenance query over a streaming (ts, user_id) frame."""
        return (
            stream_df.writeStream.foreachBatch(self._merge)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def registers(self) -> DataFrame:
        return self.spark.read.parquet(self.state_dir)

    def day_estimates(self) -> DataFrame:
        """Read-time day-grain distinct estimates from the maintained state."""
        td = (
            self.registers()
            .groupBy("day", "bucket")
            .agg(F.max("m_j").alias("m_j"))
            .groupBy("day")
            .agg(
                F.count(F.lit(1)).alias("n_present"),
                F.sum(
                    F.expr("shiftleft(cast(1 as bigint), 55 - m_j)")
                ).alias("sum_int"),
            )
        )
        return td.select(
            "day",
            F.round(
                hll_estimate_col(F.col("n_present"), F.col("sum_int")), 2
            ).alias("hll_day"),
        ).orderBy("day")
