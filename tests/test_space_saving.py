"""Space-Saving streaming top-k: the Metwally guarantees hold across
micro-batches — overestimates bounded by max_err, all true heavy
hitters (> n/m) present, O(m) state."""

from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_stream_spark.streaming.stateful import space_saving_tracker

SCHEMA = StructType(
    [StructField("shard", StringType()), StructField("item", StringType())]
)

_M = 16


def _rows():
    """Skewed synthetic stream: 3 heavy hitters + a long singleton tail,
    interleaved so every micro-batch sees both."""
    heavy = [("s", "hot0")] * 120 + [("s", "hot1")] * 60 + [("s", "hot2")] * 30
    tail = [("s", f"cold{j}") for j in range(100)]
    out = []
    hi, ti = 0, 0
    while hi < len(heavy) or ti < len(tail):
        out.extend(heavy[hi : hi + 3])
        hi += 3
        if ti < len(tail):
            out.append(tail[ti])
            ti += 1
    return out


def test_space_saving_guarantees_across_batches(spark, tmp_path):
    rows = _rows()
    true = {}
    for _, it in rows:
        true[it] = true.get(it, 0) + 1
    path = str(tmp_path / "src")
    third = (len(rows) + 2) // 3
    for i in range(3):
        spark.createDataFrame(rows[i * third : (i + 1) * third], SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = space_saving_tracker(
        stream.groupBy("shard"), "shard", "item", m=_M, topk=10
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ss_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    updates = spark.sql("SELECT * FROM ss_updates").collect()
    assert updates, "no emissions"
    n_total = len(rows)
    last_n = max(r.n_processed for r in updates)
    assert last_n == n_total  # every row counted through state
    final = [r for r in updates if r.n_processed == n_total]
    assert 0 < len(final) <= 10  # one top-k emission for the final batch
    by_item = {r.item: r for r in final}
    # (1) every item with true freq > n/m is guaranteed present
    for it, cnt in true.items():
        if cnt > n_total / _M:
            assert it in by_item, f"heavy hitter {it} missing"
    # (2) per-item certificates: true <= est and est - err <= true
    for it, r in by_item.items():
        t = true.get(it, 0)
        assert t <= r.est_count
        assert r.est_count - r.max_err <= t
    # (3) the three planted heavies rank on top in order
    ranked = sorted(final, key=lambda r: (-r.est_count, r.item))
    assert [r.item for r in ranked[:3]] == ["hot0", "hot1", "hot2"]
