"""Hash-priority reservoir sampler: multi-batch state equals the batch
bottom-k over everything seen (min-k-by-hash is mergeable and RNG-free)."""

import hashlib

from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_stream_spark.streaming.stateful import hash_reservoir_sampler

SCHEMA = StructType(
    [StructField("key", StringType()), StructField("item", LongType())]
)

_K = 8


def _py_sample(items):
    pool = {}
    for v in items:
        hv = int(hashlib.md5(f"rsv:{v}".encode()).hexdigest()[:15], 16)
        pool[hv] = str(v)
    return [pool[h] for h in sorted(pool)[:_K]]


def test_reservoir_equals_batch_bottomk(spark, tmp_path):
    rows = [("a", u) for u in range(60)] + [("b", u) for u in range(0, 40, 2)]
    # duplicates re-arrive across batches: must not distort the sample
    rows += [("a", u) for u in range(0, 60, 3)]
    path = str(tmp_path / "src")
    third = (len(rows) + 2) // 3
    for i in range(3):
        spark.createDataFrame(rows[i * third : (i + 1) * third], SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = hash_reservoir_sampler(stream.groupBy("key"), "key", "item", k=_K)
    q = (
        out.writeStream.format("memory")
        .queryName("rsv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for r in spark.sql("SELECT * FROM rsv").collect():
        final[r.key] = (list(r.sample), r.n_seen, r.n_distinct_tracked)
    for key in ("a", "b"):
        items = [u for k, u in rows if k == key]
        sample, n_seen, n_tracked = final[key]
        assert sample == _py_sample(items)  # exact: deterministic priorities
        assert n_seen == len(items)
        assert n_tracked == _K
