"""transformWithState processors (streaming/tws.py): equivalence with the
applyInPandasWithState backend, and event-time timer punctuation.

Gated on protobuf: transformWithState's Python state client speaks
protobuf to the JVM state server, and this container has no
``google.protobuf`` (installs are off-limits) — same env-gated posture
as tests/test_kafka_broker.py. Where protobuf exists these run as-is."""

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_stream_spark.session import enable_rocksdb_state
from kafka_stream_spark.streaming import stateful
from kafka_stream_spark.streaming.tws import (
    idle_session_finalizer,
    running_counter_tws,
)


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf (absent here; no installs)",
)

PAY_SCHEMA = StructType(
    [StructField("card", StringType()), StructField("amount", DoubleType())]
)
EVENT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("event_time", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.fixture()
def rocksdb_conf(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    enable_rocksdb_state(spark)
    yield
    if old:
        spark.conf.set(key, old)
    else:
        spark.conf.unset(key)


def _write_file(dir_path, name, rows, schema, mtime):
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, name)
    pdf = pd.DataFrame(rows)
    if "event_time" in pdf.columns:
        pdf["event_time"] = pd.to_datetime(pdf["event_time"], unit="s", utc=True)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), path,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    os.utime(path, (mtime, mtime))
    return path


def test_running_counter_tws_matches_applyinpandas(spark, tmp_path, rocksdb_conf):
    rows = [
        {"card": "card1", "amount": 40.0},
        {"card": "card1", "amount": 70.0},
        {"card": "card2", "amount": 10.0},
        {"card": "card2", "amount": 20.0},
        {"card": "card3", "amount": 250.0},
    ]
    src_dir = str(tmp_path / "pay")
    _write_file(src_dir, "f1.parquet", rows, PAY_SCHEMA, time.time())

    stream = spark.readStream.schema(PAY_SCHEMA).parquet(src_dir)
    out = running_counter_tws(stream, "card", "amount")
    q = (
        out.writeStream.format("memory").queryName("tws_counter")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    tws = {
        r.key: (r.cnt, r.total)
        for r in spark.sql("SELECT * FROM tws_counter").collect()
    }

    stream2 = spark.readStream.schema(PAY_SCHEMA).parquet(src_dir)
    out2 = stateful.running_counter(stream2.groupBy("card"), "card", "amount")
    q2 = (
        out2.writeStream.format("memory").queryName("aip_counter")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("update").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    aip = {
        r.key: (r.n, r.total)
        for r in spark.sql("SELECT * FROM aip_counter").collect()
    }

    assert tws == aip == {
        "card1": (2, 110.0), "card2": (2, 30.0), "card3": (1, 250.0)
    }


def test_idle_session_finalizer_timer_punctuation(spark, tmp_path, rocksdb_conf):
    src_dir = str(tmp_path / "events")
    t0 = time.time()
    # batch 1: k1 at 10s,12s; k2 at 11s
    _write_file(
        src_dir, "f1.parquet",
        [
            {"key": "k1", "event_time": 10, "value": 1.0},
            {"key": "k1", "event_time": 12, "value": 2.0},
            {"key": "k2", "event_time": 11, "value": 5.0},
        ],
        EVENT_SCHEMA, t0,
    )
    # batch 2: k1 extends its session to 14s (re-arms the timer)
    _write_file(
        src_dir, "f2.parquet",
        [{"key": "k1", "event_time": 14, "value": 3.0}], EVENT_SCHEMA, t0 + 1,
    )
    # batch 3: a far-future key pushes the watermark to 40s…
    _write_file(
        src_dir, "f3.parquet",
        [{"key": "k3", "event_time": 40, "value": 1.0}], EVENT_SCHEMA, t0 + 2,
    )
    # …and batch 4 runs with that watermark, so k1/k2 timers (19s/16s)
    # fire WITHOUT any further event carrying those keys
    _write_file(
        src_dir, "f4.parquet",
        [{"key": "k4", "event_time": 41, "value": 1.0}], EVENT_SCHEMA, t0 + 3,
    )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = idle_session_finalizer(
        stream, "key", "event_time", "value", gap="5 seconds"
    )
    q = (
        out.writeStream.format("memory").queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        r.key: (r.session_start_ms, r.session_end_ms, r.events, r.value_sum)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # k1's two batches merged into ONE session (10s–14s) because the
    # re-armed timer replaced the 17s one; k2 finalized at 16s; the
    # still-open k3/k4 sessions have not emitted
    assert got == {
        "k1": (10_000, 14_000, 3, 6.0),
        "k2": (11_000, 11_000, 1, 5.0),
    }
