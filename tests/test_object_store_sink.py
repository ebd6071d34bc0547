"""Confluent HDFS/S3-connector file-contract tests (S11/S12):
offset-encoded names, partitioner layouts, flush rotation, and the
filename-recovery exactly-once rule — with and without a checkpoint."""

import os
import re

import pyspark.sql.functions as F
import pytest

from kafka_stream_spark.functions.avro_ocf import read_ocf
from kafka_stream_spark.sources.topics import FileTopic
from kafka_stream_spark.streaming.object_store import (
    committed_offsets,
    default_partitioner,
    export_files,
    field_partitioner,
    object_store_sink,
    time_based_partitioner,
)

NAME_RE = re.compile(r"^events\+(\d+)\+(\d{10})\+(\d{10})\.(parquet|json|avro)$")


def _topic(spark, tmp_path, rows=40, partitions=3):
    t = FileTopic(spark, str(tmp_path), "events", partitions=partitions)
    df = spark.range(rows).select(
        F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("key"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("value"),
    )
    t.append(df)
    return t


def _committed_files(out_dir):
    # dot-prefixed = temp (invisible per the connector contract);
    # underscore-prefixed = control files (_WRITER pin — the Spark/
    # Hadoop convention readers already ignore)
    found = []
    for root, _d, files in os.walk(out_dir):
        for f in files:
            if not f.startswith((".", "_")):
                found.append((os.path.relpath(root, out_dir), f))
    return sorted(found)


def test_filenames_offsets_and_fidelity(spark, tmp_path):
    t = _topic(spark, tmp_path / "topics")
    out = str(tmp_path / "store")
    manifest = export_files(t.read(), out, "events", flush_size=8).collect()

    files = _committed_files(out)
    assert files and all(NAME_RE.match(f) for _, f in files)
    # per partition: files tile the offset range contiguously from 0
    per_part = {}
    for d, f in files:
        m = NAME_RE.match(f)
        p, start, end = int(m.group(1)), int(m.group(2)), int(m.group(3))
        assert d == f"events/partition={p}"  # DefaultPartitioner layout
        per_part.setdefault(p, []).append((start, end))
    for p, ranges in per_part.items():
        ranges.sort()
        assert ranges[0][0] == 0
        for (s1, e1), (s2, _e2) in zip(ranges, ranges[1:]):
            assert s2 == e1 + 1
    # manifest rows describe exactly the committed files
    assert sorted(r["file"] for r in manifest) == sorted(f for _, f in files)
    # read-back fidelity: the union of files equals the topic
    back = spark.read.option("recursiveFileLookup", "true").parquet(os.path.join(out, "events"))
    src = t.read()
    assert back.count() == src.count()
    assert (
        back.select(F.col("value").cast("string")).exceptAll(
            src.select(F.col("value").cast("string"))
        ).count()
        == 0
    )


def test_flush_size_rotation(spark, tmp_path):
    t = _topic(spark, tmp_path / "topics", rows=50)
    out = str(tmp_path / "store")
    manifest = export_files(t.read(), out, "events", flush_size=4).collect()
    assert all(r["records"] <= 4 for r in manifest)
    # every file's record count equals its offset span (dense offsets)
    assert all(
        r["records"] == r["end_offset"] - r["start_offset"] + 1 for r in manifest
    )


def test_field_and_time_partitioners(spark, tmp_path):
    t = _topic(spark, tmp_path / "topics")
    out_f = str(tmp_path / "by_field")
    export_files(
        t.read().withColumn("key", F.col("key").cast("string")),
        out_f, "events", partitioner=field_partitioner("events", "key"),
    ).collect()
    dirs = {d for d, _ in _committed_files(out_f)}
    assert dirs and all(re.match(r"^events/key=k\d$", d) for d in dirs)

    out_t = str(tmp_path / "by_time")
    export_files(
        t.read(), out_t, "events",
        partitioner=time_based_partitioner("events"),
    ).collect()
    dirs = {d for d, _ in _committed_files(out_t)}
    assert dirs and all(
        re.match(r"^events/year=\d{4}/month=\d{2}/day=\d{2}$", d) for d in dirs
    )


def test_exactly_once_replay_and_resume(spark, tmp_path):
    t = _topic(spark, tmp_path / "topics", rows=30)
    out = str(tmp_path / "store")
    export_files(t.read(), out, "events", flush_size=8).collect()
    first = _committed_files(out)
    total = t.read().count()

    # full replay over the same input (checkpoint lost): nothing new
    replay = export_files(t.read(), out, "events", flush_size=8).collect()
    assert replay == []
    assert _committed_files(out) == first

    # new appends: only offsets past the committed ends are written
    ends_before = committed_offsets(out, "events")
    t.append(
        spark.range(10).select(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("key"),
            F.concat(F.lit("new"), F.col("id").cast("string")).alias("value"),
        )
    )
    manifest = export_files(t.read(), out, "events", flush_size=8).collect()
    assert sum(r["records"] for r in manifest) == t.read().count() - total
    assert all(
        r["start_offset"] > ends_before.get((r["dir"], r["kafka_partition"]), -1)
        for r in manifest
    )
    back = spark.read.option("recursiveFileLookup", "true").parquet(os.path.join(out, "events"))
    assert back.count() == t.read().count()
    assert back.select("partition", "offset").distinct().count() == back.count()


def test_no_temp_files_survive_commit(spark, tmp_path):
    t = _topic(spark, tmp_path / "topics")
    out = str(tmp_path / "store")
    export_files(t.read(), out, "events").collect()
    for root, _d, files in os.walk(out):
        assert not [f for f in files if f.startswith(".")]


def test_json_and_avro_formats_round_trip(spark, tmp_path):
    t = _topic(spark, tmp_path / "topics", rows=12, partitions=2)
    src_values = {
        r["value"] for r in
        t.read().select(F.col("value").cast("string").alias("value")).collect()
    }

    out_j = str(tmp_path / "json_store")
    export_files(t.read(), out_j, "events", fmt="json").collect()
    got = set()
    for d, f in _committed_files(out_j):
        assert f.endswith(".json")
        with open(os.path.join(out_j, d, f)) as fh:
            import json

            for line in fh:
                got.add(json.loads(line)["value"])
    assert got == src_values

    out_a = str(tmp_path / "avro_store")
    export_files(t.read(), out_a, "events", fmt="avro").collect()
    got = set()
    for d, f in _committed_files(out_a):
        assert f.endswith(".avro")
        with open(os.path.join(out_a, d, f), "rb") as fh:
            _schema, recs = read_ocf(fh.read())
        got.update(r["value"].decode() for r in recs)
        assert all(isinstance(r["offset"], int) for r in recs)
    assert got == src_values


def test_streaming_sink_checkpoint_loss_is_exactly_once(spark, tmp_path):
    t = _topic(spark, tmp_path / "topics", rows=25)
    out = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    q = object_store_sink(t, out, ckpt, flush_size=6)
    q.awaitTermination(120)
    total = t.read().count()
    back = spark.read.option("recursiveFileLookup", "true").parquet(os.path.join(out, "events"))
    assert back.count() == total

    # wipe the checkpoint and re-run from scratch: filename recovery
    # must keep the store duplicate-free (the connector's guarantee)
    import shutil

    shutil.rmtree(ckpt)
    q = object_store_sink(t, out, str(tmp_path / "ckpt2"), flush_size=6)
    q.awaitTermination(120)
    back = spark.read.option("recursiveFileLookup", "true").parquet(os.path.join(out, "events"))
    assert back.count() == total
    assert back.select("partition", "offset").distinct().count() == total


def test_bad_format_rejected(spark, tmp_path):
    t = _topic(spark, tmp_path / "topics", rows=5)
    with pytest.raises(ValueError, match="unsupported format"):
        export_files(t.read(), str(tmp_path / "x"), "events", fmt="orc")


def test_register_export_table_queryable(spark, tmp_path):
    from kafka_stream_spark.streaming.object_store import register_export_table

    t = _topic(spark, tmp_path / "topics", rows=20)
    out = str(tmp_path / "store")
    export_files(t.read(), out, "events", flush_size=6).collect()
    name = register_export_table(spark, out, "events")
    got = spark.sql(f"SELECT count(*) AS n FROM {name}").first().n
    assert got == 20
    # refresh after a further export picks up the new files
    t.append(t.read().selectExpr("cast(key AS string) AS key", "cast(value AS string) AS value").limit(5))
    export_files(t.read(), out, "events", flush_size=6).collect()
    register_export_table(spark, out, "events")
    assert spark.sql(f"SELECT count(*) AS n FROM {name}").first().n == 25


def test_kcql_routed_s3_sink(spark, tmp_path):
    """INSERT INTO bucket SELECT ... FROM topic PARTITIONBY key STOREAS JSON
    routes to the object-store writer with the FieldPartitioner layout,
    keeping (partition, offset) bookkeeping despite the narrowed SELECT."""
    import json

    from kafka_stream_spark.streaming.connector_sinks import kcql_connector_sink

    t = _topic(spark, tmp_path / "topics", rows=15)
    stream = t.read_stream().selectExpr(
        "cast(key AS string) AS key", "cast(value AS string) AS value",
        "partition", "offset", "timestamp",
    )
    base = str(tmp_path / "cloud")
    q = kcql_connector_sink(
        stream,
        "INSERT INTO backups SELECT key, value FROM events PARTITIONBY key STOREAS JSON",
        system="s3",
        transport=base,
        checkpoint=str(tmp_path / "ck"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    files = _committed_files(os.path.join(base, "backups"))
    assert files and all(f.endswith(".json") for _, f in files)
    assert all(re.match(r"^events/key=k\d$", d) for d, _ in files)
    got = set()
    for d, f in files:
        with open(os.path.join(base, "backups", d, f)) as fh:
            for line in fh:
                rec = json.loads(line)
                got.add(rec["value"])
                assert {"key", "value", "partition", "offset"} <= rec.keys()
    assert len(got) == 15


def test_partial_commit_recovery_is_per_directory(spark, tmp_path):
    """With a Field partitioner, one Kafka partition's offsets interleave
    across directories. If a crash committed some directories' files but
    not others, replay must re-land ONLY the uncommitted directories'
    records — per-partition (rather than per-dir) recovery would drop
    them because the committed dirs' end offsets run past them."""
    import shutil

    t = _topic(spark, tmp_path / "topics", rows=40)
    out = str(tmp_path / "store")
    keyed = t.read().withColumn("key", F.col("key").cast("string"))
    part = field_partitioner("events", "key")
    export_files(keyed, out, "events", partitioner=part).collect()
    full = _committed_files(out)
    total = t.read().count()

    # simulate the crash: one directory's commit never happened
    victims = sorted({d for d, _ in full})[:2]
    for d in victims:
        shutil.rmtree(os.path.join(out, d))
    survivors = _committed_files(out)
    assert len(survivors) < len(full)

    # replay the whole batch: only the victims' records come back
    manifest = export_files(keyed, out, "events", partitioner=part).collect()
    assert {r["dir"] for r in manifest} == set(victims)
    back = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(out, "events")
    )
    assert back.count() == total
    assert back.select("partition", "offset").distinct().count() == total


from hypothesis import given, settings
from hypothesis import strategies as st

_topic_names = st.text(
    alphabet=list("abz09+._-"), min_size=1, max_size=12
).filter(lambda s: not s.startswith(".") and not s.endswith("+"))


@settings(max_examples=200, deadline=None)
@given(
    topic=_topic_names,
    parts=st.dictionaries(
        st.integers(0, 99),
        st.lists(
            st.tuples(st.integers(0, 10**9), st.integers(0, 10**9)),
            min_size=1, max_size=4,
        ),
        min_size=1, max_size=4,
    ),
)
def test_committed_offsets_parses_adversarial_names(tmp_path_factory, topic, parts):
    """Filename recovery must bind partition/offsets from the RIGHT even
    when the topic name itself contains '+' and digits — a mis-parse
    here silently corrupts the exactly-once filter."""
    import os

    out = str(tmp_path_factory.mktemp("store"))
    d = os.path.join(out, "dir")
    os.makedirs(d, exist_ok=True)
    expect = {}
    for p, ranges in parts.items():
        for a, b in ranges:
            start, end = min(a, b), max(a, b)
            open(os.path.join(d, f"{topic}+{p}+{start:010d}+{end:010d}.parquet"), "w").close()
            expect[("dir", p)] = max(expect.get(("dir", p), -1), end)
    # decoys: temp files and a different topic must be invisible
    open(os.path.join(d, f".{topic}+0+0+0.parquet.tmp"), "w").close()
    open(os.path.join(d, f"{topic}x+0+0000000000+0000000009.parquet"), "w").close()
    assert committed_offsets(out, topic) == expect

def test_recovery_scan_runs_once_across_batches(spark, tmp_path):
    # the committed-file tree walk is O(objects) driver work: the
    # streaming sink must scan once at the first batch and fold each
    # batch's own manifest afterwards (VERDICT r5 item 3); a restart
    # (fresh closure) rescans — that is the recovery path proper
    import kafka_stream_spark.streaming.object_store as mod
    from kafka_stream_spark.streaming.object_store import object_store_stream_sink

    src = str(tmp_path / "batches")
    for i in range(3):
        spark.range(i * 10, (i + 1) * 10).select(
            (F.col("id") % 2).cast("int").alias("partition"),
            F.col("id").alias("offset"),
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("value"),
        ).coalesce(1).write.parquet(os.path.join(src, f"b{i}"))

    real = mod.committed_offsets
    calls = []

    def counting(out_dir, topic):
        calls.append(out_dir)
        return real(out_dir, topic)

    out = str(tmp_path / "store")
    stream = (
        spark.readStream.schema("partition int, offset bigint, key string, value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    mod.committed_offsets = counting
    try:
        q = (
            object_store_stream_sink(stream, out, "events", str(tmp_path / "ck"), flush_size=4)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert len(calls) == 1, calls  # three batches, ONE tree walk

        # checkpoint loss + restart on a fresh one: records replay, the
        # rescan runs once more, and filename recovery keeps the store
        # dup-free (losing the checkpoint releases the _WRITER pin too)
        import shutil

        shutil.rmtree(str(tmp_path / "ck"))
        q = (
            object_store_stream_sink(stream, out, "events", str(tmp_path / "ck2"), flush_size=4)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert len(calls) == 2, calls
    finally:
        mod.committed_offsets = real
    back = spark.read.option("recursiveFileLookup", "true").parquet(os.path.join(out, "events"))
    assert back.count() == 30
    assert back.select("partition", "offset").distinct().count() == 30


def test_second_concurrent_exporter_rejected(spark, tmp_path):
    # two sinks feeding one (out_dir, topic) prefix race the in-driver
    # recovery cache — the second must fail loudly at construction
    # (VERDICT r6 item 5)
    from kafka_stream_spark.streaming.object_store import (
        claim_writer_pin,
        object_store_stream_sink,
    )

    out = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(
            "partition int, offset bigint, key string, value string"
        )
        .parquet(str(tmp_path / "nothing") + "/*")
    )
    ck1 = str(tmp_path / "ck1")
    os.makedirs(ck1)  # an owner whose checkpoint exists = maybe live
    object_store_stream_sink(stream, out, "events", ck1)
    with pytest.raises(ValueError, match="already.*owned|owned by"):
        object_store_stream_sink(stream, out, "events", str(tmp_path / "ck2"))
    # same checkpoint (a restart of the same exporter) reclaims
    object_store_stream_sink(stream, out, "events", ck1)
    # a DIFFERENT topic under the same out_dir is its own prefix
    object_store_stream_sink(stream, out, "other", str(tmp_path / "ck3"))

    # once the owner's checkpoint is gone it cannot restart — a
    # replacement exporter takes the pin over
    import shutil

    shutil.rmtree(ck1)
    claim_writer_pin(out, "events", str(tmp_path / "ck2"))
    with open(os.path.join(out, "_WRITER-events")) as f:
        assert f.read().strip() == os.path.abspath(str(tmp_path / "ck2"))
