"""High-cardinality state soak for the constant-state streaming sketches.

The restart/equivalence tests exercise `bloom_gate` and
`kmv_distinct_tracker` at toy cardinality; this soak drives >=1M
distinct identities through both with the RocksDB state store and
asserts the two properties the 100 TB story rests on:

- state stays BOUNDED (n_shards x n_words longs for the bloom, O(k)
  longs per key for KMV — measured as on-disk checkpoint state bytes),
- sustained throughput clears the reference's replay floor of
  ~5,000 rec/s (`sample-data/put.sh:24`).

Measured numbers are recorded in SCALING.md (round-3 section).
"""

import glob
import os
import time

import pytest

from kafka_stream_spark.session import enable_rocksdb_state
from kafka_stream_spark.streaming.bloom_gate import streaming_bloom_dedup
from kafka_stream_spark.streaming.stateful import kmv_distinct_tracker

N_UNIQUE = 1_000_000
N_DUP = 100_000
FLOOR_RECS_PER_SEC = 5_000
SOAK_WORDS = 20_000  # per shard: 20k x 63 bits; 8 shards ~ 10 bits/key at 1M


def _state_bytes(checkpoint: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(f"{checkpoint}/state/**", recursive=True)
        if os.path.isfile(p)
    )


@pytest.fixture()
def rocksdb(spark):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    enable_rocksdb_state(spark)
    yield spark
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


@pytest.mark.slow
def test_bloom_gate_1m_keys_bounded_state_and_floor(rocksdb, tmp_path):
    spark = rocksdb
    src = str(tmp_path / "src")
    # uniques first (2 files), then a later file replaying the first 100k
    spark.range(N_UNIQUE).selectExpr("id AS rec_id").repartition(2).write.parquet(src)
    time.sleep(1.1)  # later mtime -> the dup file forms the last micro-batch
    spark.range(N_DUP).selectExpr("id AS rec_id").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema("rec_id long").option(
        "maxFilesPerTrigger", 2
    ).parquet(src)
    gated = streaming_bloom_dedup(stream, "rec_id", n_shards=8, n_words=SOAK_WORDS)
    ckpt = str(tmp_path / "ck")
    t0 = time.monotonic()
    q = (
        gated.writeStream.format("memory")
        .queryName("soak_bloom")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    elapsed = time.monotonic() - t0

    total_rows = N_UNIQUE + N_DUP
    rate = total_rows / elapsed
    assert rate >= FLOOR_RECS_PER_SEC, f"{rate:.0f} rec/s < floor"

    stats = spark.sql(
        "SELECT count(*) AS n, sum(CAST(admitted AS INT)) AS adm,"
        " count(DISTINCT CASE WHEN admitted THEN rec_id END) AS adm_ids"
        " FROM soak_bloom"
    ).first()
    assert stats.n == total_rows
    # zero false negatives: an id is never admitted twice
    assert stats.adm == stats.adm_ids
    # bounded false positives (~1.7% theoretical at 10 bits/key, k=3)
    assert stats.adm >= 0.97 * N_UNIQUE
    assert stats.adm <= N_UNIQUE

    # state is 8 shards x 20k longs (~1.3 MB logical) no matter how many
    # keys flowed; allow RocksDB/versioning overhead, not key growth
    state_mb = _state_bytes(ckpt) / 1e6
    assert state_mb < 64, f"state {state_mb:.1f} MB is not bounded"
    print(f"bloom soak: {rate:.0f} rec/s, state {state_mb:.2f} MB")


@pytest.mark.slow
def test_kmv_tracker_1m_ids_bounded_state_and_floor(rocksdb, tmp_path):
    spark = rocksdb
    src = str(tmp_path / "src")
    spark.range(N_UNIQUE).selectExpr(
        "CASE id % 4 WHEN 0 THEN 'click' WHEN 1 THEN 'view'"
        " WHEN 2 THEN 'buy' ELSE 'scroll' END AS event_type",
        "id AS user_id",
    ).repartition(4).write.parquet(src)

    stream = spark.readStream.schema("event_type string, user_id long").option(
        "maxFilesPerTrigger", 2
    ).parquet(src)
    out = kmv_distinct_tracker(stream.groupBy("event_type"), "event_type", "user_id")
    ckpt = str(tmp_path / "ck")
    t0 = time.monotonic()
    q = (
        out.writeStream.format("memory")
        .queryName("soak_kmv")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    elapsed = time.monotonic() - t0

    rate = N_UNIQUE / elapsed
    assert rate >= FLOOR_RECS_PER_SEC, f"{rate:.0f} rec/s < floor"

    final: dict = {}
    for r in spark.sql("SELECT * FROM soak_kmv").collect():
        final[r.key] = (r.n_minima, r.est_distinct)  # batch order: last wins
    assert set(final) == {"click", "view", "buy", "scroll"}
    for key, (n_min, est) in final.items():
        assert n_min == 32  # state is exactly k minima per key
        # KMV stderr ~ 1/sqrt(k-1) ~ 18% at k=32; true distinct = 250k
        assert 100_000 <= est <= 500_000, (key, est)

    state_mb = _state_bytes(ckpt) / 1e6
    assert state_mb < 16, f"state {state_mb:.1f} MB is not bounded"
    print(f"kmv soak: {rate:.0f} rec/s, state {state_mb:.2f} MB")
