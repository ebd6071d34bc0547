"""Debezium-envelope CDC (functions/cdc.py): decode, lsn-ordered fold,
tombstones, and the continuously-maintained streaming table."""

import json
import os

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


def _env(op, lsn, row=None, before=None):
    return json.dumps(
        {
            "before": before,
            "after": row,
            "op": op,
            "ts_ms": 1_700_000_000_000 + lsn,
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


def test_decode_is_jvm_side(spark):
    df = spark.createDataFrame([(EVENTS[0],)], ["value"])
    plan = decode_envelopes(df, ROW)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
