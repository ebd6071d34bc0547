"""KCQL-routed connector sinks: one declarative statement drives the
Redis / Cassandra / Influx renderers end-to-end through file transports."""

import datetime
import glob
import json

import pytest

from kafka_stream_spark.sources import resp_codec
from kafka_stream_spark.streaming.cassandra import file_cql_transport
from kafka_stream_spark.streaming.connector_sinks import kcql_connector_sink
from kafka_stream_spark.streaming.influx import file_write_transport

SCHEMA = "user_id long, event_type string, value double, ts timestamp"
TS = datetime.datetime(2026, 3, 1, 12, 0, 0)


def _src(spark, tmp_path, n=20):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "click", float(i), TS) for i in range(n)], SCHEMA
    ).write.parquet(src)
    return spark.readStream.schema(SCHEMA).parquet(src)


def _file_bytes_transport(directory: str):
    """Executor-safe RESP transport: one file per partition payload."""
    import os
    import uuid

    def send(payload: bytes) -> None:
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, f"p-{uuid.uuid4().hex}.resp"), "wb") as f:
            f.write(payload)

    return send


def _read_frames(directory: str):
    frames = []
    for p in glob.glob(f"{directory}/p-*.resp"):
        fs, rest = resp_codec.decode_stream(open(p, "rb").read())
        assert rest == b""
        frames += fs
    return frames


def test_kcql_redis_cache_mode(spark, tmp_path):
    out = str(tmp_path / "resp")
    q = kcql_connector_sink(
        _src(spark, tmp_path),
        "INSERT INTO user_state SELECT user_id, value FROM events PK user_id",
        system="redis",
        transport=_file_bytes_transport(out),
        checkpoint=str(tmp_path / "ck"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(60)
    frames = _read_frames(out)
    assert len(frames) == 20
    keys = set()
    for f in frames:
        assert f[0] == b"SET"
        keys.add(f[1].decode())
        doc = json.loads(f[2])
        assert set(doc) == {"user_id", "value"}  # KCQL projection applied
    assert keys == {f"user_state:{i}" for i in range(20)}


def test_kcql_redis_sorted_set_mode(spark, tmp_path):
    out = str(tmp_path / "resp")
    q = kcql_connector_sink(
        _src(spark, tmp_path, n=5),
        "INSERT INTO recent SELECT user_id, value FROM events PK user_id STOREAS SortedSet",
        system="redis",
        transport=_file_bytes_transport(out),
        checkpoint=str(tmp_path / "ck"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(60)
    frames = _read_frames(out)
    assert len(frames) == 5
    for f in frames:
        assert f[0] == b"ZADD" and f[1] == b"recent"
        float(f[2])  # score parses


def test_kcql_cassandra_routing(spark, tmp_path):
    out = str(tmp_path / "cql")
    q = kcql_connector_sink(
        _src(spark, tmp_path, n=8),
        "INSERT INTO iot.readings SELECT user_id, value FROM events PK user_id",
        system="cassandra",
        transport=file_cql_transport(out),
        checkpoint=str(tmp_path / "ck"),
        ttl=60,
    ).trigger(availableNow=True).start()
    q.awaitTermination(60)
    body = "".join(open(p, encoding="utf-8").read() for p in glob.glob(f"{out}/*.cql"))
    assert body.count("INSERT INTO iot.readings (user_id, value)") == 8
    assert "USING TTL 60;" in body


def test_kcql_cassandra_requires_keyspace(spark, tmp_path):
    with pytest.raises(ValueError, match="keyspace.table"):
        kcql_connector_sink(
            _src(spark, tmp_path),
            "INSERT INTO plain SELECT user_id FROM events PK user_id",
            system="cassandra",
            transport=lambda s: None,
            checkpoint=str(tmp_path / "ck"),
        )


def test_kcql_influx_routing(spark, tmp_path):
    out = str(tmp_path / "lp")
    q = kcql_connector_sink(
        _src(spark, tmp_path, n=6),
        "INSERT INTO cpu SELECT event_type, value, ts FROM events PK event_type",
        system="influx",
        transport=file_write_transport(out),
        checkpoint=str(tmp_path / "ck"),
        ts_col="ts",
    ).trigger(availableNow=True).start()
    q.awaitTermination(60)
    lines = []
    for p in glob.glob(f"{out}/*.lp"):
        lines += open(p, encoding="utf-8").read().split("\n")
    assert len(lines) == 6
    # PK -> tag, remaining non-ts column -> field
    assert all(l.startswith("cpu,event_type=click value=") for l in lines)


def test_kcql_hbase_routing(spark, tmp_path):
    from kafka_stream_spark.streaming.hbase import file_put_transport

    out = str(tmp_path / "puts")
    q = kcql_connector_sink(
        _src(spark, tmp_path, n=6),
        "INSERT INTO metrics SELECT user_id, event_type, value FROM events PK user_id, event_type",
        system="hbase",
        transport=file_put_transport(out),
        checkpoint=str(tmp_path / "ck"),
        family="m",
    ).trigger(availableNow=True).start()
    q.awaitTermination(60)
    cells = []
    for p in glob.glob(f"{out}/puts-*.tsv"):
        cells += [l.split("\t") for l in open(p, encoding="utf-8").read().splitlines()]
    assert len(cells) == 6  # one non-key column -> one cell per record
    assert all(c[1] == "m:value" for c in cells)
    assert {c[0] for c in cells} == {f"{i}|click" for i in range(6)}


def test_sink_checkpoint_no_replay(spark, tmp_path):
    """Restarting a connector sink on the same checkpoint with no new
    input must emit NOTHING new (offsets committed); new input emits
    only the delta — the at-least-once contract across restarts."""
    import pyspark.sql.functions as FF

    from kafka_stream_spark.streaming.influx import file_write_transport

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "click", float(i), TS) for i in range(10)], SCHEMA
    ).write.parquet(src)
    out = str(tmp_path / "lp")
    ck = str(tmp_path / "ck")

    def run():
        q = kcql_connector_sink(
            spark.readStream.schema(SCHEMA).parquet(src),
            "INSERT INTO cpu SELECT event_type, value, ts FROM events PK event_type",
            system="influx",
            transport=file_write_transport(out),
            checkpoint=ck,
            ts_col="ts",
        ).trigger(availableNow=True).start()
        q.awaitTermination(60)
        lines = []
        for p in glob.glob(f"{out}/*.lp"):
            lines += open(p, encoding="utf-8").read().split("\n")
        return lines

    assert len(run()) == 10
    assert len(run()) == 10  # restart, no new data -> no replay
    # append 5 more rows -> only the delta flows
    spark.createDataFrame(
        [(100 + i, "click", 100.0 + i, TS) for i in range(5)], SCHEMA
    ).write.mode("append").parquet(src)
    lines = run()
    assert len(lines) == 15
    assert sum("value=10" in l for l in lines) >= 5  # the new values arrived


def test_kcql_jms_routing(spark, tmp_path):
    from kafka_stream_spark.sources import stomp_codec

    out = str(tmp_path / "stomp")

    def transport(payload: bytes) -> None:
        import os
        import uuid

        os.makedirs(out, exist_ok=True)
        with open(f"{out}/w-{uuid.uuid4().hex}.stomp", "wb") as f:
            f.write(payload)

    q = kcql_connector_sink(
        _src(spark, tmp_path, n=5),
        "INSERT INTO /queue/events SELECT user_id, value FROM events PK user_id",
        system="jms",
        transport=transport,
        checkpoint=str(tmp_path / "ck"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(60)
    corr = set()
    for p in glob.glob(f"{out}/w-*.stomp"):
        frames, rest = stomp_codec.decode_stream(open(p, "rb").read())
        assert rest == b""
        for cmd, headers, body in frames:
            assert cmd == "SEND" and headers["destination"] == "/queue/events"
            corr.add(headers["JMSCorrelationID"])
            assert set(json.loads(body)) == {"user_id", "value"}
    assert corr == {str(i) for i in range(5)}
