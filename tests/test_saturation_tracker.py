"""Streaming saturation tracker: cumulative unique-yield per source
converges to the exact ratio, on O(k) state, across micro-batches."""

import hashlib

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_stream_spark.streaming.stateful import _KMV_DOMAIN, saturation_tracker

DOC_SCHEMA = StructType(
    [StructField("source", StringType()), StructField("content_id", LongType())]
)

_K = 8


def _expected(ids) -> tuple[float, int]:
    n = len(ids)
    hs = sorted(
        {int(hashlib.md5(f"kmv:{u}".encode()).hexdigest()[:8], 16) for u in ids}
    )[:_K]
    est = float(len(hs)) if len(hs) < _K else (_K - 1) * _KMV_DOMAIN / hs[-1]
    return round(est, 2), int(round(1000.0 * est / n))


@pytest.fixture()
def batched_docs_dir(spark, tmp_path):
    """Three micro-batches; 'fresh' keeps yielding new ids, 'stale'
    repeats the same 5 ids forever."""
    rows = [("fresh", u) for u in range(60)] + [("stale", u % 5) for u in range(60)]
    path = str(tmp_path / "docs")
    for i in range(3):
        chunk = [r for j, r in enumerate(rows) if j % 3 == i]
        spark.createDataFrame(chunk, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    return path, rows


def test_saturation_tracker_final_state_matches_exact(spark, batched_docs_dir):
    path, rows = batched_docs_dir
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = saturation_tracker(stream.groupBy("source"), "source", "content_id", k=_K)
    q = (
        out.writeStream.format("memory")
        .queryName("sat_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    updates = spark.sql("SELECT * FROM sat_updates").collect()
    assert len(updates) >= 4
    final: dict = {}
    for r in updates:  # memory sink appends in trigger order
        final[r["key"]] = r
    for src in ("fresh", "stale"):
        ids = [u for s, u in rows if s == src]
        est, permille = _expected(ids)
        assert final[src]["n_seen"] == len(ids)
        assert final[src]["est_distinct"] == est
        assert final[src]["yield_permille"] == permille
    # the stale source must read as saturated relative to the fresh one
    assert final["stale"]["yield_permille"] < final["fresh"]["yield_permille"]


def test_saturation_tracker_state_survives_restart(spark, tmp_path):
    """Run 1 sees ids 0..19, run 2 (fresh query, SAME checkpoint) sees
    10..29: the final update must count n_seen=40 with 30 distinct —
    impossible unless (n, minima) state was recovered."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(ids):
        spark.createDataFrame(
            [("s", u) for u in ids], DOC_SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
        res = saturation_tracker(
            stream.groupBy("source"), "source", "content_id", k=_K
        )
        q = (
            res.writeStream.foreachBatch(
                lambda df, eid: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch(range(20))
    run_once()
    write_batch(range(10, 30))
    run_once()

    rows = sorted(spark.read.parquet(out).collect(), key=lambda r: r["n_seen"])
    assert rows[-1]["n_seen"] == 40
    est, permille = _expected(list(range(20)) + list(range(10, 30)))
    assert rows[-1]["est_distinct"] == est
    assert rows[-1]["yield_permille"] == permille
