"""Streaming count-min tracker: multi-batch counter state equals the
batch-built counter table over the union of all micro-batches (CMS rows
are element-wise mergeable), and point estimates match the batch query's
min-of-counters semantics."""

import hashlib

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import LongType, StructField, StructType

from kafka_stream_spark.operators.analytics_ext import _CMS_D, _CMS_W
from kafka_stream_spark.streaming.stateful import cms_tracker

EV_SCHEMA = StructType([StructField("user_id", LongType())])


def _py_bucket(j: int, v) -> int:
    return int(hashlib.md5(f"cms{j}:{v}".encode()).hexdigest()[:15], 16) % _CMS_W


@pytest.fixture()
def batched_users_dir(spark, tmp_path):
    """Three parquet files = three micro-batches of user events."""
    rows = [(u % 17,) for u in range(120)] + [(3,)] * 30  # key 3 is heavy
    path = str(tmp_path / "ev")
    for i in range(3):
        chunk = [r for k, r in enumerate(rows) if k % 3 == i]
        spark.createDataFrame(chunk, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    return path, [r[0] for r in rows]


def test_cms_tracker_state_equals_batch_counters(spark, batched_users_dir):
    path, users = batched_users_dir
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    exploded = stream.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j")
    )
    out = cms_tracker(exploded.groupBy("j"), "user_id", w=_CMS_W)
    q = (
        out.writeStream.format("memory")
        .queryName("cms_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    updates = spark.sql("SELECT * FROM cms_updates").collect()
    assert len(updates) >= _CMS_D  # at least one update per hash row
    final = {}
    for r in updates:  # memory sink appends updates in batch order
        final[r.j] = (list(r.counters), r.total)

    # python-reference counters over the UNION of all batches
    expect = {j: [0] * _CMS_W for j in range(_CMS_D)}
    for v in users:
        for j in range(_CMS_D):
            expect[j][_py_bucket(j, v)] += 1
    for j in range(_CMS_D):
        counters, total = final[j]
        assert counters == expect[j], f"row {j} diverged"
        assert total == len(users)

    # point-estimate semantics: min over rows >= true count, and exact
    # for the heavy key at this tiny cardinality spread
    def est(v):
        return min(final[j][0][_py_bucket(j, v)] for j in range(_CMS_D))

    true3 = users.count(3)
    assert est(3) >= true3
    for v in set(users):
        assert est(v) >= users.count(v)


def test_histogram_tracker_shards_merge_to_batch_histogram(spark, tmp_path):
    """Streamed per-shard histograms element-wise summed across shards
    and batches equal the batch histogram over all rows (mergeability —
    the property that makes this the streaming quantile state)."""
    from kafka_stream_spark.streaming.stateful import histogram_tracker

    vals = [float(v % 50) for v in range(90)] + [49.9, 0.0, 25.0]
    path = str(tmp_path / "vals")
    schema = StructType([StructField("value", LongType())])  # placeholder
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("value", T.DoubleType())])
    for i in range(3):
        chunk = [(v,) for j, v in enumerate(vals) if j % 3 == i]
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    lo, hi, bins = 0.0, 50.0, 16
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    sharded = stream.withColumn("shard", (F.xxhash64("value") % 4 + 4) % 4)
    out = histogram_tracker(sharded.groupBy("shard"), "value", lo, hi, bins)
    q = (
        out.writeStream.format("memory")
        .queryName("hist_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for r in spark.sql("SELECT * FROM hist_updates").collect():
        final[r.shard] = list(r.counters)  # later updates overwrite
    merged = [sum(c[b] for c in final.values()) for b in range(bins)]
    width = (hi - lo) / bins
    expect = [0] * bins
    for v in vals:
        expect[min(int((v - lo) / width), bins - 1)] += 1
    assert merged == expect
    assert sum(merged) == len(vals)
