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
    """RocksDB state store + full-node parallelism for the soak queries.

    The suite default of 4 shuffle partitions is right for the tiny
    streaming tests but caps the stateful stage at 4 concurrent tasks;
    the soaks measure the engine against the reference's FULL-NODE
    replay floor, so they run their (fresh-checkpoint) queries with one
    state partition per core. applyInPandasWithState cost is per KEY
    per micro-batch, so task slots are the throughput lever at 1M keys.
    """
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    enable_rocksdb_state(spark)
    spark.conf.set(
        "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    yield spark
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
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


# ---------------------------------------------------------------------------
# Round-4 soaks (VERDICT r3 item 6): the PER-KEY-state processors.
# bloom/KMV above prove constant global state; these three carry a state
# row per key, so the 100 TB property to prove is bytes-per-key stays a
# small constant at 1M concurrent keys (plus the same 5k rec/s floor).
# ---------------------------------------------------------------------------

N_KEYS = 1_000_000


@pytest.mark.slow
def test_funnel_tracker_1m_keys_bounded_state_and_floor(rocksdb, tmp_path):
    spark = rocksdb
    src = str(tmp_path / "src")
    # 1M users, each completing signup -> view -> purchase in ts order
    spark.range(N_KEYS).selectExpr(
        "cast(id AS string) AS user",
        "explode(array(0, 1, 2)) AS si",
    ).selectExpr(
        "user",
        "CASE si WHEN 0 THEN 'signup' WHEN 1 THEN 'view'"
        " ELSE 'purchase' END AS event_type",
        "timestamp_micros(1700000000000000 + cast(user AS long) * 10 + si) AS ts",
    ).repartition(32).write.parquet(src)

    from kafka_stream_spark.streaming.stateful import funnel_tracker

    stream = spark.readStream.schema(
        "user string, event_type string, ts timestamp"
    ).parquet(src)
    res = funnel_tracker(
        stream.groupBy("user"), "user", "event_type", "ts",
        ("signup", "view", "purchase"),
    )
    ckpt = str(tmp_path / "ck")
    t0 = time.monotonic()
    q = (
        res.writeStream.format("memory")
        .queryName("soak_funnel")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(900)
    elapsed = time.monotonic() - t0

    rate = 3 * N_KEYS / elapsed
    assert rate >= FLOOR_RECS_PER_SEC, f"{rate:.0f} rec/s < floor"

    stats = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT key) AS nk,"
        " min(n_stages) AS mn, max(n_stages) AS mx FROM soak_funnel"
    ).first()
    # every funnel completes exactly once
    assert stats.n == N_KEYS and stats.nk == N_KEYS
    assert stats.mn == stats.mx == 3

    state_bytes = _state_bytes(ckpt)
    per_key = state_bytes / N_KEYS
    # state row = 4 longs + the key; RocksDB sst + changelog overhead
    # allowed, key-count growth is linear by design — the bound is per key
    assert per_key < 512, f"{per_key:.0f} B/key is not a small constant"
    print(
        f"funnel soak: {rate:.0f} rec/s, "
        f"state {state_bytes / 1e6:.1f} MB ({per_key:.0f} B/key)"
    )


@pytest.mark.slow
def test_stream_stream_asof_1m_keys_flush_and_floor(rocksdb, tmp_path):
    """1M concurrent as-of joins: each user has one view then one
    purchase 5s later; a far-future sentinel advances the watermark so
    every purchase finalizes. Asserts the 5k rec/s floor, exact
    1M-row attribution, and that post-flush state collapses (keys with
    nothing buffered call state.remove())."""
    import os

    import pyspark.sql.functions as F

    from kafka_stream_spark.streaming.stateful import stream_stream_asof_join

    spark = rocksdb
    src = tmp_path / "src"
    src.mkdir()
    base_us = 1_700_000_000_000_000
    # batch 1: all views + purchases (watermark still at 0 -> all buffered)
    spark.range(N_KEYS).selectExpr(
        "id AS user_id",
        "explode(array(0, 1)) AS side",
    ).selectExpr(
        "user_id",
        f"{base_us} + user_id * 20 + side * 5000000 AS ts_us",
        "user_id * 2 + side AS event_id",
        "cast(side AS int) AS side",
    ).repartition(32).write.parquet(str(src / "b1.parquet"))
    # batch 2: sentinel far in the future -> watermark passes every purchase
    spark.createDataFrame(
        [(10**9, base_us + 365 * 86400 * 1_000_000, 10**9, 0)],
        "user_id long, ts_us long, event_id long, side int",
    ).coalesce(1).write.parquet(str(src / "b2.parquet"))
    os.utime(str(src / "b1.parquet"), (1000, 1000))
    os.utime(str(src / "b2.parquet"), (2000, 2000))

    stream = (
        spark.readStream.schema("user_id long, ts_us long, event_id long, side int")
        # b1 is a 32-part directory: take it as ONE micro-batch (buffer
        # everything), then b2's sentinel alone advances the watermark
        .option("maxFilesPerTrigger", 32)
        .parquet(str(src) + "/b*.parquet")
        .withColumn("ts", F.timestamp_micros("ts_us"))
        .withWatermark("ts", "1 hour")
    )
    joined = stream_stream_asof_join(
        stream.groupBy("user_id"), "ts", "event_id", "side"
    )
    ckpt = str(tmp_path / "ck")
    t0 = time.monotonic()
    q = (
        joined.writeStream.format("memory")
        .queryName("soak_asof")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(900)
    elapsed = time.monotonic() - t0

    rate = 2 * N_KEYS / elapsed
    assert rate >= FLOOR_RECS_PER_SEC, f"{rate:.0f} rec/s < floor"

    stats = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT user_id) AS nk,"
        " sum(CASE WHEN view_event_id = user_id * 2"
        "          AND event_id = user_id * 2 + 1 THEN 1 ELSE 0 END) AS ok"
        " FROM soak_asof WHERE user_id < 1000000000"
    ).first()
    # every purchase attributed exactly once, to its own user's view
    assert stats.n == N_KEYS and stats.nk == N_KEYS and stats.ok == N_KEYS

    state_bytes = _state_bytes(ckpt)
    per_key = state_bytes / N_KEYS
    # peak state = 1 view + 1 pending purchase per key (4 longs + lists);
    # retained checkpoint versions included — still a small per-key constant
    assert per_key < 1024, f"{per_key:.0f} B/key is not a small constant"
    print(
        f"asof soak: {rate:.0f} rec/s, "
        f"state {state_bytes / 1e6:.1f} MB ({per_key:.0f} B/key)"
    )


@pytest.mark.slow
def test_saturation_tracker_1m_ids_bounded_state_and_floor(rocksdb, tmp_path):
    spark = rocksdb
    src = str(tmp_path / "src")
    # 4 sources; 'web' saturated (every id seen 4x), others all-unique
    spark.range(N_KEYS).selectExpr(
        "CASE id % 4 WHEN 0 THEN 'web' WHEN 1 THEN 'books'"
        " WHEN 2 THEN 'code' ELSE 'wiki' END AS source",
        "CASE WHEN id % 4 = 0 THEN concat('dup', cast((id div 4) % 16 AS string))"
        " ELSE concat('doc', cast(id AS string)) END AS content_id",
    ).repartition(8).write.parquet(src)

    from kafka_stream_spark.streaming.stateful import saturation_tracker

    stream = spark.readStream.schema(
        "source string, content_id string"
    ).option("maxFilesPerTrigger", 4).parquet(src)
    out = saturation_tracker(stream.groupBy("source"), "source", "content_id")
    ckpt = str(tmp_path / "ck")
    t0 = time.monotonic()
    q = (
        out.writeStream.format("memory")
        .queryName("soak_sat")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    elapsed = time.monotonic() - t0

    rate = N_KEYS / elapsed
    assert rate >= FLOOR_RECS_PER_SEC, f"{rate:.0f} rec/s < floor"

    final: dict = {}
    for r in spark.sql("SELECT * FROM soak_sat").collect():
        final[r.key] = r  # batch order: last row per key wins
    assert set(final) == {"web", "books", "code", "wiki"}
    # saturated source: 16 distinct ids over 250k rows -> ~0 permille
    web = final["web"]
    assert web.est_distinct == 16.0 and web.yield_permille == 0
    # fresh sources: every row new -> estimate near 250k, permille near 1000
    for key in ("books", "code", "wiki"):
        r = final[key]
        assert 100_000 <= r.est_distinct <= 500_000, (key, r.est_distinct)
        assert r.yield_permille >= 400, (key, r.yield_permille)

    state_mb = _state_bytes(ckpt) / 1e6
    # state per key = 1 counter + <=64 minima, 4 keys total
    assert state_mb < 16, f"state {state_mb:.1f} MB is not bounded"
    print(f"saturation soak: {rate:.0f} rec/s, state {state_mb:.2f} MB")
