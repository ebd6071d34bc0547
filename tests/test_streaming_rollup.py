"""Streaming HLL register maintenance must equal the batch rollup:
registers max-merged across micro-batches are bit-identical to
registers built from all data at once."""

import pyspark.sql.functions as F

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.analytics_ext import (
    hll_hour_registers,
    hll_window_rollup,
)
from kafka_stream_spark.streaming.rollup import HllRegisterMaintainer


def test_streamed_registers_equal_batch(spark, sf_dir, tmp_path):
    (events,) = load(spark, sf_dir, "events")
    # three interleaved micro-batches as separate parquet files
    src = str(tmp_path / "src")
    for i in range(3):
        (
            events.where(F.col("event_id") % 3 == i)
            .select("ts", "user_id")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    stream = (
        spark.readStream.schema(
            events.select("ts", "user_id").schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    m = HllRegisterMaintainer(spark, str(tmp_path / "state"))
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    # register-level equality with the batch construction
    batch_regs = {
        (r.day, r.hr, r.bucket): r.m_j
        for r in hll_hour_registers(events).collect()
    }
    stream_regs = {
        (r.day, r.hr, r.bucket): r.m_j for r in m.registers().collect()
    }
    assert stream_regs == batch_regs

    # read-time day estimates equal the batch rollup's hll_day column
    batch_days = {r.day: r.hll_day for r in hll_window_rollup(spark, sf_dir).collect()}
    got_days = {r.day: r.hll_day for r in m.day_estimates().collect()}
    assert got_days == batch_days
