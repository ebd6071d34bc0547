"""kstopic WRITE path (S1/S2 symmetry): the staged-commit producer.

Covers: batch produce round-trip through the kstopic reader, offset
continuity across appends, key->partition stability vs FileTopic.append,
the commit-time single-writer-per-partition check, streaming produce
with epoch-idempotent commits, and reader invisibility of staged files.
"""

import os

import pyspark.sql.functions as F
import pytest

from kafka_stream_spark.sources.datasource import prepare_produce, register


@pytest.fixture()
def kstopic(spark):
    register(spark)
    return spark


def _produce(spark, root, topic, df, n=4):
    (prepare_produce(df, n).write.format("kstopic")
     .option("root", root).option("topic", topic)
     .option("partitions", str(n)).mode("append").save())


def _read(spark, root, topic):
    return (spark.read.format("kstopic")
            .option("root", root).option("topic", topic).load())


def _records(spark, n, start=0):
    return spark.range(start, start + n).selectExpr(
        "cast(cast(id AS string) AS binary) AS key",
        "cast(concat('v', cast(id AS string)) AS binary) AS value",
        "timestamp_micros(1700000000000000 + id) AS timestamp",
    )


def test_batch_produce_roundtrip(kstopic, tmp_path):
    spark, root = kstopic, str(tmp_path)
    _produce(spark, root, "t1", _records(spark, 100))
    got = _read(spark, root, "t1")
    assert got.count() == 100
    rows = got.collect()
    assert {bytes(r.value).decode() for r in rows} == {f"v{i}" for i in range(100)}
    assert all(r.topic == "t1" and 0 <= r.partition < 4 for r in rows)
    # offsets dense per partition starting at 0
    for p in range(4):
        offs = sorted(r.offset for r in rows if r.partition == p)
        assert offs == list(range(len(offs)))
    # timestamps preserved
    by_key = {bytes(r.key).decode(): r for r in rows}
    assert by_key["7"].timestamp.microsecond == 7


def test_append_continues_offsets(kstopic, tmp_path):
    spark, root = kstopic, str(tmp_path)
    _produce(spark, root, "t2", _records(spark, 50))
    first_ends = {
        r.partition: r.mx
        for r in _read(spark, root, "t2")
        .groupBy("partition").agg(F.max("offset").alias("mx")).collect()
    }
    _produce(spark, root, "t2", _records(spark, 50, start=50))
    got = _read(spark, root, "t2")
    assert got.count() == 100
    for p, rows in [(p, sorted(r.offset for r in got.where(F.col("partition") == p).collect()))
                    for p in first_ends]:
        # still dense from 0: the second append started at end offset
        assert rows == list(range(len(rows)))


def test_partitioning_matches_filetopic_append(kstopic, tmp_path):
    """prepare_produce must land each key on the SAME partition as
    FileTopic.append (both pmod(xxhash64(key), n)) — producers and the
    engine's own topic layer stay mergeable."""
    from kafka_stream_spark.sources.topics import FileTopic

    spark, root = kstopic, str(tmp_path)
    recs = _records(spark, 60)
    _produce(spark, root, "mine", recs)
    ft = FileTopic(spark, root, "ft", partitions=4)
    ft.append(recs.select("key", "value"))
    mine = {bytes(r.key): r.partition
            for r in _read(spark, root, "mine").collect()}
    theirs = {bytes(r.key): r.partition for r in ft.read().collect()}
    assert mine == theirs


def test_commit_rejects_overlapping_writers(kstopic, tmp_path):
    """Two tasks carrying the same topic-partition -> overlapping offset
    ranges -> the driver commit fails loudly and promotes nothing."""
    spark, root = kstopic, str(tmp_path)
    # explicit partition column, spread over many input splits: several
    # tasks claim partition 0 concurrently
    df = spark.range(40).repartition(4).selectExpr(
        "cast(cast(id AS string) AS binary) AS value",
        "cast(0 AS int) AS partition",
    )
    with pytest.raises(Exception, match="more than\\s+one task|overlap"):
        (df.write.format("kstopic").option("root", root)
         .option("topic", "clash").mode("append").save())
    # nothing promoted: topic reads empty
    assert _read(spark, root, "clash").count() == 0


def test_staged_files_invisible_to_reader(kstopic, tmp_path):
    spark, root = kstopic, str(tmp_path)
    _produce(spark, root, "t3", _records(spark, 10))
    staging = os.path.join(root, "t3", ".staging")
    os.makedirs(staging, exist_ok=True)
    with open(os.path.join(staging, "p0-o999-dead"), "wb") as f:
        f.write(b"not parquet")
    assert _read(spark, root, "t3").count() == 10


def test_streaming_produce_epoch_idempotent(kstopic, tmp_path):
    spark, root = kstopic, str(tmp_path)
    src = str(tmp_path / "src")
    _records(spark, 30).write.parquet(src)
    stream = spark.readStream.schema(
        "key binary, value binary, timestamp timestamp"
    ).parquet(src)
    q = (prepare_produce(stream, 4).writeStream.format("kstopic")
         .option("root", root).option("topic", "st")
         .option("partitions", "4")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert _read(spark, root, "st").count() == 30
    # epoch marker written; a manual replay of the same batchId is a no-op
    epochs = os.listdir(os.path.join(root, "st", ".epochs"))
    assert epochs == ["0"]

    from kafka_stream_spark.sources.datasource import _Staged, _TopicStreamWriter

    w = _TopicStreamWriter(
        {"root": root, "topic": "st", "partitions": "4"}, False)
    w.commit([_Staged([])], batchId=0)  # replay: discarded, not promoted
    assert _read(spark, root, "st").count() == 30


def _stage_fake(root, topic, p, base, n, tag="x"):
    """Build a staged file the way _stage_batches would, without a job."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    staging = os.path.join(root, topic, ".staging")
    os.makedirs(staging, exist_ok=True)
    tbl = pa.table(
        {
            "key": pa.array([b"k%d" % i for i in range(n)], pa.binary()),
            "value": pa.array([b"s%d" % (base + i) for i in range(n)], pa.binary()),
            "topic": pa.array([topic] * n, pa.string()),
            "partition": pa.array([p] * n, pa.int32()),
            "offset": pa.array(list(range(base, base + n)), pa.int64()),
            "timestamp": pa.array([1700000000000000 + i for i in range(n)],
                                  pa.timestamp("us", tz="UTC")),
        }
    )
    staged = os.path.join(staging, f"p{p}-o{base}-{tag}")
    pq.write_table(tbl, staged)
    return staged


def test_xxh64_parity_with_spark(kstopic):
    """The Python fallback partitioner must hash bit-identically to the
    JVM xxhash64 (seed 42) prepare_produce/FileTopic.append use."""
    import os as _os

    from kafka_stream_spark.sources.datasource import _xxh64

    spark = kstopic
    samples = [b"", b"a", b"key-7", _os.urandom(31), _os.urandom(32),
               _os.urandom(33), _os.urandom(100)]
    df = spark.createDataFrame(
        [(i, bytearray(s)) for i, s in enumerate(samples)], "i int, k binary")
    got = {r.i: r.h for r in df.select("i", F.xxhash64("k").alias("h")).collect()}
    for i, s in enumerate(samples):
        assert got[i] == _xxh64(bytes(s))


def test_key_fallback_lands_on_engine_partitions(kstopic, tmp_path):
    """df.write with a key column but NO partition column must place keys
    exactly where prepare_produce/FileTopic.append would (one
    partitioner, not two)."""
    spark, root = kstopic, str(tmp_path)
    recs = _records(spark, 40).coalesce(1)  # 1 task: no overlap, pure fallback
    (recs.write.format("kstopic").option("root", root)
     .option("topic", "fb").option("partitions", "4").mode("append").save())
    got = {bytes(r.key): r.partition for r in _read(spark, root, "fb").collect()}
    want = {
        bytes(r.key): r.p
        for r in recs.select(
            "key", F.pmod(F.xxhash64("key"), F.lit(4)).cast("int").alias("p")
        ).collect()
    }
    assert got == want


def test_stream_writer_rejects_overwrite(kstopic, tmp_path):
    from kafka_stream_spark.sources.datasource import _TopicStreamWriter

    with pytest.raises(ValueError, match="append-only"):
        _TopicStreamWriter(
            {"root": str(tmp_path), "topic": "t", "partitions": "4"}, True)


def test_commit_rejects_stale_base(kstopic, tmp_path):
    """A staged range whose base is no longer the committed end (a
    concurrent writer promoted in between) must fail the commit instead
    of double-claiming offsets."""
    from kafka_stream_spark.sources.datasource import _Staged, _TopicWriter

    spark, root = kstopic, str(tmp_path)
    # stage AS IF the partition were empty...
    staged = _stage_fake(root, "race", p=0, base=0, n=5)
    # ...then a concurrent writer commits 10 rows to partition 0
    _produce(spark, root, "race",
             _records(spark, 10).withColumn("partition", F.lit(0)), n=1)
    w = _TopicWriter({"root": root, "topic": "race", "partitions": "1"}, False)
    with pytest.raises(ValueError, match="concurrent writer"):
        w.commit([_Staged([(0, 0, 5, staged)])])
    assert not os.path.exists(staged)  # discarded, not promoted
    assert _read(spark, root, "race").count() == 10


def test_crash_between_marker_and_promote_recovers(kstopic, tmp_path):
    """Crash window (ADVICE r4): the epoch marker (with its rename plan)
    is durable but the promote didn't finish. The replayed epoch must
    finish the recorded plan and discard its own re-staged files —
    every record lands exactly once, at the originally planned offsets."""
    import json

    from kafka_stream_spark.sources.datasource import _Staged, _TopicStreamWriter

    spark, root = kstopic, str(tmp_path)
    os.makedirs(os.path.join(root, "cw"), exist_ok=True)
    # crashed attempt: staged 2 partitions, marker written, only p0 promoted
    s0 = _stage_fake(root, "cw", p=0, base=0, n=3, tag="orig0")
    s1 = _stage_fake(root, "cw", p=1, base=0, n=4, tag="orig1")
    plan = [[s0, s0.replace(".staging" + os.sep, "") + ".parquet"],
            [s1, s1.replace(".staging" + os.sep, "") + ".parquet"]]
    epochs = os.path.join(root, "cw", ".epochs")
    os.makedirs(epochs, exist_ok=True)
    with open(os.path.join(epochs, "0"), "w") as f:
        f.write(json.dumps(plan))
    os.replace(plan[0][0], plan[0][1])  # p0 promoted, then crash
    # replay: Spark re-runs batch 0, tasks re-stage fresh files
    r0 = _stage_fake(root, "cw", p=0, base=3, n=3, tag="re0")  # stale-ish re-stage
    r1 = _stage_fake(root, "cw", p=1, base=0, n=4, tag="re1")
    w = _TopicStreamWriter({"root": root, "topic": "cw", "partitions": "4"}, False)
    w.commit([_Staged([(0, 3, 3, r0), (1, 0, 4, r1)])], batchId=0)
    got = _read(spark, root, "cw")
    assert got.count() == 7  # 3 + 4, exactly once
    for p, n in [(0, 3), (1, 4)]:
        offs = sorted(r.offset for r in got.where(F.col("partition") == p).collect())
        assert offs == list(range(n))
    assert not os.path.exists(r0) and not os.path.exists(r1)


def test_write_requires_value_and_append_mode(kstopic, tmp_path):
    spark, root = kstopic, str(tmp_path)
    df = spark.range(3).selectExpr("cast(cast(id AS string) AS binary) AS value")
    with pytest.raises(Exception, match="append-only"):
        (df.write.format("kstopic").option("root", root)
         .option("topic", "x").mode("overwrite").save())
    bad = spark.range(3).selectExpr("id AS not_value")
    with pytest.raises(Exception, match="value"):
        (bad.write.format("kstopic").option("root", root)
         .option("topic", "x").mode("append").save())


def test_vacuum_staging(kstopic, tmp_path):
    """Orphaned staged files (attempt died before its marker) are
    removed once old; marker-referenced stragglers are promoted;
    fresh files are left alone."""
    import json
    import time

    from kafka_stream_spark.sources.datasource import vacuum_staging

    spark, root = kstopic, str(tmp_path)
    _produce(spark, root, "gc", _records(spark, 10))
    tdir = os.path.join(root, "gc")
    orphan = _stage_fake(root, "gc", p=0, base=90, n=2, tag="orphan")
    straggler = _stage_fake(root, "gc", p=1, base=80, n=3, tag="strag")
    fresh = _stage_fake(root, "gc", p=2, base=70, n=1, tag="fresh")
    final = straggler.replace(".staging" + os.sep, "") + ".parquet"
    epochs = os.path.join(tdir, ".epochs")
    os.makedirs(epochs, exist_ok=True)
    with open(os.path.join(epochs, "7"), "w") as f:
        f.write(json.dumps([[straggler, final]]))
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    os.utime(straggler, (old, old))
    stats = vacuum_staging(tdir, min_age_s=3600)
    assert stats == {"promoted": 1, "removed": 1, "kept": 1}
    assert not os.path.exists(orphan) and os.path.exists(fresh)
    assert os.path.exists(final)
    # idempotent; second run keeps only the fresh file
    assert vacuum_staging(tdir, min_age_s=3600) == {
        "promoted": 0, "removed": 0, "kept": 1}
