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

Scale: the register table is partitioned by day with per-day
generation pointers (streaming/state_table.py); each batch reads and
publishes only the days it touched, so per-batch cost is O(touched
days × 24 × m + batch), never O(history) — the same argument as
streaming/ops.foreach_batch_merge, with max-merge instead of
latest-wins, and the same crash-safety (the live day is never deleted
before its replacement commits).
"""

from __future__ import annotations


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
        from kafka_stream_spark.streaming.state_table import (
            partition_dir,
            publish_partitions,
        )

        new = hll_hour_registers(batch_df)
        spark = batch_df.sparkSession
        touched = sorted(r.day for r in new.select("day").distinct().collect())
        if not touched:
            return
        # prior registers for touched days only; partition on a COPY of
        # day so the data files keep the day column for plain reads
        live = [
            d for v in touched if (d := partition_dir(self.state_dir, "_day_p", v))
        ]
        merged = new
        if live:
            merged = spark.read.parquet(*live).unionByName(new)
        merged = (
            merged.groupBy("day", "hr", "bucket")
            .agg(F.max("m_j").alias("m_j"))
            .withColumn("_day_p", F.col("day"))
        )
        # generation + per-day pointer swap (streaming/state_table.py):
        # dynamic partition overwrite's commitJob deletes a day dir
        # before renaming its replacement in — a crash inside that
        # window lost the day; the pointer swap has no such window
        publish_partitions(merged, self.state_dir, batch_id, "_day_p", touched)

    def attach(self, stream_df: DataFrame, checkpoint_dir: str):
        """Start the maintenance query over a streaming (ts, user_id) frame."""
        return (
            stream_df.writeStream.foreachBatch(self._merge)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def registers(self) -> DataFrame:
        from kafka_stream_spark.streaming.state_table import read_state

        df = read_state(self.spark, self.state_dir, partition_col="_day_p")
        if df is None:
            raise ValueError(f"no committed registers at {self.state_dir}")
        return df

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
