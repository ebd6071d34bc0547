"""Debezium-envelope CDC (functions/cdc.py): decode, lsn-ordered fold,
tombstones, and the continuously-maintained streaming table."""

import json
import os

import pytest

import pyspark.sql.functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from kafka_stream_spark.functions.cdc import (
    cdc_table_sink,
    decode_envelopes,
    fold_latest_state,
    read_current_table,
)

ROW = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("qty", IntegerType()),
    ]
)


def _env(op, lsn, row=None, before=None, ts_ms="default"):
    return json.dumps(
        {
            "before": before,
            "after": row,
            "op": op,
            "ts_ms": 1_700_000_000_000 + lsn if ts_ms == "default" else ts_ms,
            "source": {"lsn": lsn, "db": "shop", "table": "items"},
        }
    )


EVENTS = [
    _env("c", 1, {"id": 1, "name": "ale", "qty": 5}),
    _env("u", 3, {"id": 1, "name": "ale", "qty": 9}),       # final image of id 1
    _env("u", 2, {"id": 1, "name": "ale", "qty": 7}),       # stale, arrives later
    _env("c", 4, {"id": 2, "name": "brew", "qty": 1}),
    _env("d", 5, before={"id": 2, "name": "brew", "qty": 1}),  # tombstone
    _env("r", 6, {"id": 3, "name": "cask", "qty": 2}),       # snapshot read
]


def test_decode_and_fold_with_out_of_order_and_tombstones(spark):
    df = spark.createDataFrame([(e,) for e in EVENTS], ["value"])
    changes = decode_envelopes(df, ROW)
    assert {"id", "name", "qty", "_op", "_lsn", "_ts_ms"} == set(changes.columns)
    state = {r.id: (r.name, r.qty) for r in fold_latest_state(changes, ["id"]).collect()}
    # id 1: lsn-3 update wins over the later-arriving lsn-2; id 2 deleted
    assert state == {1: ("ale", 9), 3: ("cask", 2)}


def test_delete_carries_before_image(spark):
    df = spark.createDataFrame([(EVENTS[4],)], ["value"])
    row = decode_envelopes(df, ROW).first()
    assert (row.id, row._op, row._lsn) == (2, "d", 5)


def test_streaming_table_maintenance_across_batches(spark, tmp_path):
    # batch 1: creates; batch 2: the out-of-order update pair; batch 3:
    # the delete + snapshot read — the delete must kill a row that was
    # inserted two batches earlier
    src = str(tmp_path / "cdc_topic")
    batches = [EVENTS[0:1] + EVENTS[3:4], EVENTS[1:3], EVENTS[4:6]]
    for i, evs in enumerate(batches):
        spark.createDataFrame([(e,) for e in evs], ["value"]).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    table = str(tmp_path / "table")
    q = (
        cdc_table_sink(stream, ROW, ["id"], table, str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.id: (r.name, r.qty) for r in read_current_table(spark, table).collect()}
    assert got == {1: ("ale", 9), 3: ("cask", 2)}

    # restart on the same checkpoint with no new data: state unchanged
    q = (
        cdc_table_sink(stream, ROW, ["id"], table, str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {
        r.id: (r.name, r.qty) for r in read_current_table(spark, table).collect()
    } == got


def _run_batches(spark, tmp_path, batches, name="t", **sink_kw):
    src = str(tmp_path / f"{name}_topic")
    for i, evs in enumerate(batches):
        spark.createDataFrame([(e,) for e in evs], ["value"]).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    table = str(tmp_path / f"{name}_table")
    q = (
        cdc_table_sink(stream, ROW, ["id"], table, str(tmp_path / f"{name}_ck"), **sink_kw)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return table


def test_stale_preimage_after_delete_stays_dead(spark, tmp_path):
    # insert(lsn 5) -> delete(lsn 10) -> STALE update(lsn 7), each in its
    # own micro-batch: the persisted tombstone must keep out-ranking the
    # late pre-image, so the key stays ABSENT (VERDICT r5 item 1)
    batches = [
        [_env("c", 5, {"id": 9, "name": "zed", "qty": 1})],
        [_env("d", 10, before={"id": 9, "name": "zed", "qty": 1})],
        [_env("u", 7, {"id": 9, "name": "zed", "qty": 3})],
    ]
    table = _run_batches(spark, tmp_path, batches, name="stale")
    assert read_current_table(spark, table).count() == 0
    # the tombstone IS retained in the raw state (op 'd', lsn 10 wins)
    raw = read_current_table(spark, table, drop_meta=False).collect()
    assert [(r.id, r._op, r._lsn) for r in raw] == [(9, "d", 10)]


def test_tombstone_retention_gc(spark, tmp_path):
    # with a retention horizon, a tombstone far older than the state's
    # max event time is compacted away (delete.retention.ms analog)
    batches = [
        [_env("c", 5, {"id": 1, "name": "old", "qty": 1})],
        [_env("d", 10, before={"id": 1, "name": "old", "qty": 1})],
        # much-later event advances the horizon past the tombstone
        [_env("c", 9_000_000, {"id": 2, "name": "new", "qty": 4})],
    ]
    table = _run_batches(
        spark, tmp_path, batches, name="gc", tombstone_retention_ms=1_000_000
    )
    raw = read_current_table(spark, table, drop_meta=False)
    assert raw.filter(F.col("_op") == "d").count() == 0  # GC'd
    got = {r.id: r.name for r in read_current_table(spark, table).collect()}
    assert got == {2: "new"}


def test_crash_mid_write_preserves_prior_state(spark, tmp_path):
    # batch 1 commits; batch 2's state write blows up mid-job — the
    # previous generation must remain the committed, readable state
    # (ADVICE r5 high: the old overwrite-in-place destroyed it)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = str(tmp_path / "crash_topic")
    spark.createDataFrame(
        [(_env("c", 1, {"id": 1, "name": "ale", "qty": 5}),)], ["value"]
    ).coalesce(1).write.parquet(os.path.join(src, "b0"))
    table = str(tmp_path / "crash_table")
    ck = str(tmp_path / "crash_ck")
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = cdc_table_sink(stream, ROW, ["id"], table, ck).trigger(availableNow=True).start()
    q.awaitTermination(120)
    before = {r.id: (r.name, r.qty) for r in read_current_table(spark, table).collect()}
    assert before == {1: ("ale", 5)}

    # crash batch 2's state write mid-job: the foreachBatch closure
    # runs in this driver process, so patch DataFrameWriter.parquet to
    # leave a TORN generation dir (partial file, no pointer flip) and
    # raise — simulating an executor/job failure during the publish
    from pyspark.sql.readwriter import DataFrameWriter

    spark.createDataFrame(
        [(_env("u", 2, {"id": 1, "name": "ale", "qty": 9}),)], ["value"]
    ).coalesce(1).write.parquet(os.path.join(src, "b1"))
    gen_dir = os.path.join(table, f"state-{1:020d}")
    real_parquet = DataFrameWriter.parquet

    def torn_write(self, wpath, *a, **kw):
        if wpath == gen_dir:
            os.makedirs(wpath, exist_ok=True)
            with open(os.path.join(wpath, "part-torn.parquet"), "wb") as f:
                f.write(b"not parquet")
            raise RuntimeError("injected mid-publish crash")
        return real_parquet(self, wpath, *a, **kw)

    DataFrameWriter.parquet = torn_write
    try:
        q = cdc_table_sink(stream, ROW, ["id"], table, ck).trigger(availableNow=True).start()
        try:
            q.awaitTermination(120)
            crashed = False
        except StreamingQueryException:
            crashed = True
    finally:
        DataFrameWriter.parquet = real_parquet
    assert crashed
    # prior committed state survives the failed publish: the torn
    # generation has no pointer, so readers never see it
    assert {
        r.id: (r.name, r.qty) for r in read_current_table(spark, table).collect()
    } == before

    # restart on the same checkpoint: the batch replays over the torn
    # dir (overwrite mode clears it) and the table converges
    q = cdc_table_sink(stream, ROW, ["id"], table, ck).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert {
        r.id: (r.name, r.qty) for r in read_current_table(spark, table).collect()
    } == {1: ("ale", 9)}


def test_replay_never_overwrites_the_generation_it_reads(spark, tmp_path):
    # pointer already flipped for batch 0, then batch 0 replays (fresh
    # checkpoint over the same source): the sink must write the
    # ALTERNATE slot, never read + overwrite one directory
    from kafka_stream_spark.functions.cdc import _current_state_dir

    table = _run_batches(
        spark,
        tmp_path,
        [[_env("c", 1, {"id": 1, "name": "ale", "qty": 5})]],
        name="slot",
    )
    prev = _current_state_dir(table)
    assert prev and prev.endswith(f"state-{0:020d}")

    src = str(tmp_path / "slot_topic")
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        cdc_table_sink(stream, ROW, ["id"], table, str(tmp_path / "slot_ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    cur = _current_state_dir(table)
    assert cur and cur.endswith("b"), cur  # alternate slot used
    assert {
        r.id: (r.name, r.qty) for r in read_current_table(spark, table).collect()
    } == {1: ("ale", 5)}


def test_decode_is_jvm_side(spark):
    df = spark.createDataFrame([(EVENTS[0],)], ["value"])
    plan = decode_envelopes(df, ROW)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

def test_bucketed_state_matches_single_dir(spark, tmp_path):
    # the bucketed sink is a pure layout change: same events, same
    # current table as the single-generation mode — including the
    # stale-after-delete tombstone case
    batches = [EVENTS[0:1] + EVENTS[3:4], EVENTS[1:3], EVENTS[4:6]]
    single = _run_batches(spark, tmp_path, batches, name="sg")
    bucketed = _run_batches(spark, tmp_path, batches, name="bk", n_buckets=8)
    want = {
        (r.id, r.name, r.qty)
        for r in read_current_table(spark, single).collect()
    }
    got = {
        (r.id, r.name, r.qty)
        for r in read_current_table(spark, bucketed).collect()
    }
    assert got == want == {(1, "ale", 9), (3, "cask", 2)}
    # raw state keeps the tombstone in its bucket
    raw = read_current_table(spark, bucketed, drop_meta=False)
    assert raw.filter(F.col("_op") == "d").count() == 1


def test_bucketed_batch_rewrites_only_touched_buckets(spark, tmp_path):
    # the 100 TB property: a batch's cost is O(touched buckets) — an
    # untouched bucket's pointer (and data dir) must not move
    from kafka_stream_spark.functions.cdc import _read_pointer

    n = 16
    # find two ids in DIFFERENT buckets under the sink's own hash
    # hash the same TYPE the sink hashes (the decoded IntegerType id)
    rows = spark.createDataFrame(
        [(i,) for i in range(1, 40)], "id int"
    )
    bk = {
        r.id: r.b
        for r in rows.select(
            "id", F.pmod(F.xxhash64("id"), F.lit(n)).cast("int").alias("b")
        ).collect()
    }
    id_a = 1
    id_b = next(i for i in bk if bk[i] != bk[id_a])
    batches = [
        [_env("c", 1, {"id": id_a, "name": "a", "qty": 1}),
         _env("c", 2, {"id": id_b, "name": "b", "qty": 2})],
        [_env("u", 3, {"id": id_a, "name": "a", "qty": 9})],  # touches only a's bucket
    ]
    table = _run_batches(spark, tmp_path, batches, name="tb", n_buckets=n)
    ptr_a = _read_pointer(table, f"_PTR-_bucket={bk[id_a]}")
    ptr_b = _read_pointer(table, f"_PTR-_bucket={bk[id_b]}")
    assert ptr_a == f"state-{1:020d}"  # moved by batch 1
    assert ptr_b == f"state-{0:020d}"  # untouched since batch 0
    got = {(r.id, r.qty) for r in read_current_table(spark, table).collect()}
    assert got == {(id_a, 9), (id_b, 2)}


def test_bucket_count_change_rejected(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    batches = [[_env("c", 1, {"id": 1, "name": "x", "qty": 1})]]
    table = _run_batches(spark, tmp_path, batches, name="bc", n_buckets=4)
    src = str(tmp_path / "bc_topic")
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        cdc_table_sink(stream, ROW, ["id"], table, str(tmp_path / "bc_ck2"),
                       n_buckets=8)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="n_buckets"):
        q.awaitTermination(120)


def test_bucketed_replay_uses_alternate_slot(spark, tmp_path):
    from kafka_stream_spark.functions.cdc import _read_pointer

    batches = [[_env("c", 1, {"id": 1, "name": "x", "qty": 1})]]
    table = _run_batches(spark, tmp_path, batches, name="br", n_buckets=4)
    src = str(tmp_path / "br_topic")
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        cdc_table_sink(stream, ROW, ["id"], table, str(tmp_path / "br_ck2"),
                       n_buckets=4)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    bkt = spark.createDataFrame([(1,)], "id int").select(
        F.pmod(F.xxhash64("id"), F.lit(4)).cast("int").alias("b")
    ).first().b
    assert _read_pointer(table, f"_PTR-_bucket={bkt}").endswith("b")
    got = {(r.id, r.qty) for r in read_current_table(spark, table).collect()}
    assert got == {(1, 1)}

ROW_AVRO_FIELDS = [
    {"name": "id", "type": "int"},
    {"name": "name", "type": ["null", "string"]},
    {"name": "qty", "type": ["null", "int"]},
]


def _avro_env(op, lsn, row=None, before=None, schema_id=7):
    import struct as _struct

    from kafka_stream_spark.functions.avro_codec import (
        compiled_record_encoder,
    )
    from kafka_stream_spark.functions.cdc import avro_envelope_schema

    enc = compiled_record_encoder(avro_envelope_schema(ROW_AVRO_FIELDS))
    body = enc(
        {
            "before": before,
            "after": row,
            # the full Postgres-connector source block, in registration
            # order — Avro encode/decode is positional
            "source": {
                "version": "2.5.0.Final",
                "connector": "postgresql",
                "name": "shop-server",
                "ts_ms": 1_700_000_000_000 + lsn,
                "snapshot": "false",
                "db": "shop",
                "sequence": None,
                "schema": "public",
                "table": "items",
                "txId": 700 + lsn,
                "lsn": lsn,
                "xmin": None,
            },
            "op": op,
            "ts_ms": 1_700_000_000_000 + lsn,
            "transaction": None,
        }
    )
    return b"\x00" + _struct.pack(">I", schema_id) + body  # Confluent frame


def test_avro_envelopes_decode_and_fold(spark):
    # the Debezium + Schema Registry pairing: Confluent-framed Avro
    # envelopes produce the SAME change-row contract as the JSON path,
    # so fold/table-sink work unchanged on either serialization
    from kafka_stream_spark.functions.cdc import decode_envelopes_avro

    blobs = [
        _avro_env("c", 1, {"id": 1, "name": "ale", "qty": 5}),
        _avro_env("u", 3, {"id": 1, "name": "ale", "qty": 9}),
        _avro_env("u", 2, {"id": 1, "name": "ale", "qty": 7}),  # stale
        _avro_env("c", 4, {"id": 2, "name": "brew", "qty": 1}),
        _avro_env("d", 5, before={"id": 2, "name": "brew", "qty": 1}),
        _avro_env("r", 6, {"id": 3, "name": "cask", "qty": 2}),
    ]
    df = spark.createDataFrame([(b,) for b in blobs], "value binary")
    changes = decode_envelopes_avro(df, ROW, ROW_AVRO_FIELDS)
    assert set(changes.columns) == {"id", "name", "qty", "_op", "_lsn", "_ts_ms"}
    state = {
        r.id: (r.name, r.qty)
        for r in fold_latest_state(changes, ["id"]).collect()
    }
    assert state == {1: ("ale", 9), 3: ("cask", 2)}
    # delete rows carry the before-image
    d = changes.filter(F.col("_op") == "d").first()
    assert (d.id, d._lsn) == (2, 5)

def test_bucketed_bucket_emptied_by_retention_gc(spark, tmp_path):
    # a tombstone GC can leave a touched bucket with NO rows: the
    # pointer then names a generation that has no dir for that bucket
    # (partitionBy writes nothing) — reads must treat it as empty and a
    # later batch must rebuild it from scratch
    n = 4
    ids = spark.createDataFrame([(i,) for i in range(1, 30)], "id int")
    bk = {
        r.id: r.b
        for r in ids.select(
            "id", F.pmod(F.xxhash64("id"), F.lit(n)).cast("int").alias("b")
        ).collect()
    }
    id_a = 1
    id_b = next(i for i in bk if bk[i] != bk[id_a])
    batches = [
        [_env("c", 5, {"id": id_a, "name": "a", "qty": 1})],
        # delete id_a AND advance the horizon far past the tombstone via
        # a much-later event in a DIFFERENT bucket: the tombstone GCs,
        # leaving id_a's bucket with zero rows in the new generation
        [_env("d", 10, before={"id": id_a, "name": "a", "qty": 1}),
         _env("c", 9_000_000, {"id": id_b, "name": "b", "qty": 2})],
    ]
    table = _run_batches(
        spark, tmp_path, batches, name="em", n_buckets=n,
        tombstone_retention_ms=1_000_000,
    )
    got = {(r.id, r.qty) for r in read_current_table(spark, table).collect()}
    assert got == {(id_b, 2)}
    raw = read_current_table(spark, table, drop_meta=False)
    assert raw.filter(F.col("_op") == "d").count() == 0  # GC'd

    # a later batch re-inserts into the emptied bucket
    src = str(tmp_path / "em_topic")
    spark.createDataFrame(
        [(_env("c", 9_000_001, {"id": id_a, "name": "a2", "qty": 7}),)],
        ["value"],
    ).coalesce(1).write.parquet(os.path.join(src, "b9"))
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        cdc_table_sink(stream, ROW, ["id"], table, str(tmp_path / "em_ck"),
                       n_buckets=n, tombstone_retention_ms=1_000_000)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.id, r.qty) for r in read_current_table(spark, table).collect()}
    assert got == {(id_a, 7), (id_b, 2)}


def test_avro_envelope_field_order_is_debezium(spark):
    # Avro decode is positional: the default envelope must match the
    # order Debezium's Envelope schema builder registers — before,
    # after, SOURCE (third), op, ts_ms, transaction — and the Postgres
    # connector's source-info block (ADVICE r6 medium)
    from kafka_stream_spark.functions.cdc import (
        avro_envelope_schema,
        envelope_schema,
    )

    avro = avro_envelope_schema(ROW_AVRO_FIELDS)
    assert [f["name"] for f in avro["fields"]] == [
        "before", "after", "source", "op", "ts_ms", "transaction",
    ]
    src = next(f for f in avro["fields"] if f["name"] == "source")
    assert [f["name"] for f in src["type"]["fields"]][:5] == [
        "version", "connector", "name", "ts_ms", "snapshot",
    ]
    # the Spark-side reader schema mirrors the same positional order
    assert envelope_schema(ROW).fieldNames() == [
        "before", "after", "source", "op", "ts_ms", "transaction",
    ]


def test_avro_caller_supplied_envelope(spark):
    # a connector whose registered envelope differs from the default
    # (here: a MySQL-flavored source that still exposes lsn) decodes
    # through the envelope_avro_schema override
    import struct as _struct

    from pyspark.sql.types import LongType, StringType

    from kafka_stream_spark.functions.avro_codec import (
        compiled_record_encoder,
    )
    from kafka_stream_spark.functions.cdc import decode_envelopes_avro

    row = {"type": "record", "name": "RowA", "fields": ROW_AVRO_FIELDS}
    row_b = {"type": "record", "name": "RowB", "fields": ROW_AVRO_FIELDS}
    env_avro = {
        "type": "record",
        "name": "MyEnv",
        "fields": [
            {"name": "before", "type": ["null", row]},
            {"name": "after", "type": ["null", row_b]},
            {
                "name": "source",
                "type": {
                    "type": "record",
                    "name": "MySource",
                    "fields": [
                        {"name": "server_id", "type": "long"},
                        {"name": "gtid", "type": ["null", "string"]},
                        {"name": "lsn", "type": "long"},
                    ],
                },
            },
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": "long"},
        ],
    }
    env_spark = StructType(
        [
            StructField("before", ROW),
            StructField("after", ROW),
            StructField(
                "source",
                StructType(
                    [
                        StructField("server_id", LongType()),
                        StructField("gtid", StringType()),
                        StructField("lsn", LongType()),
                    ]
                ),
            ),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
        ]
    )
    enc = compiled_record_encoder(env_avro)
    body = enc(
        {
            "before": None,
            "after": {"id": 7, "name": "keg", "qty": 3},
            "source": {"server_id": 1, "gtid": None, "lsn": 42},
            "op": "c",
            "ts_ms": 1_700_000_000_123,
        }
    )
    blob = b"\x00" + _struct.pack(">I", 9) + body
    df = spark.createDataFrame([(blob,)], "value binary")
    changes = decode_envelopes_avro(
        df, ROW, ROW_AVRO_FIELDS,
        envelope_avro_schema=env_avro, envelope_spark_schema=env_spark,
    )
    r = changes.first()
    assert (r.id, r.name, r.qty, r._op, r._lsn, r._ts_ms) == (
        7, "keg", 3, "c", 42, 1_700_000_000_123,
    )


def test_undated_tombstone_survives_retention_gc(spark, tmp_path):
    # a tombstone whose ts_ms is NULL cannot be aged against the
    # horizon — it must be RETAINED, not GC'd on arrival (ADVICE r6:
    # NULL fails the >= predicate and was silently dropped)
    batches = [
        [_env("c", 5, {"id": 1, "name": "old", "qty": 1})],
        [_env("d", 10, before={"id": 1, "name": "old", "qty": 1},
              ts_ms=None)],
        # much-later event: a DATED tombstone this old would be GC'd
        [_env("c", 9_000_000, {"id": 2, "name": "new", "qty": 4})],
        # the stale pre-image the retained tombstone must keep dead
        [_env("u", 7, {"id": 1, "name": "old", "qty": 3})],
    ]
    table = _run_batches(
        spark, tmp_path, batches, name="nullts",
        tombstone_retention_ms=1_000_000,
    )
    raw = read_current_table(spark, table, drop_meta=False)
    dead = raw.filter(F.col("_op") == "d").collect()
    assert [(r.id, r._lsn) for r in dead] == [(1, 10)]  # retained
    got = {r.id: r.name for r in read_current_table(spark, table).collect()}
    assert got == {2: "new"}  # id 1 stays absent despite the late lsn-7
