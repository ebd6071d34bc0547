"""Checkpoint/restart semantics (SURVEY.md T6/T8): a restarted query with
the same checkpoint resumes from the recorded offsets — the consumer-group
model; a fresh checkpoint replays from the beginning.

Uses a parquet sink (the memory sink intentionally refuses checkpoint
recovery).
"""

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType([StructField("k", StringType()), StructField("v", LongType())])


def _drain(spark, src_dir, ckpt, out):
    q = (
        spark.readStream.schema(SCHEMA).parquet(src_dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)


def test_restart_processes_only_new_data(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, ckpt, out)
    assert spark.read.parquet(out).count() == 2

    # append more data, restart with the SAME checkpoint → only new rows
    # flow through (the sink's total goes 2 → 3, not 2 → 5)
    spark.createDataFrame([("c", 3)], SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    rows = {(r.k, r.v) for r in spark.read.parquet(out).collect()}
    assert rows == {("a", 1), ("b", 2), ("c", 3)}

    # a FRESH checkpoint replays everything (T8: --from-beginning analog)
    out2 = str(tmp_path / "out_replay")
    _drain(spark, src, str(tmp_path / "ckpt_fresh"), out2)
    assert spark.read.parquet(out2).count() == 3
