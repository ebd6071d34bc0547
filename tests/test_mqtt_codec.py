"""MQTT 3.1.1 codec: byte-exact round-trips, split-boundary incremental
parsing, and the PUBLISH → topic-record Spark path."""

import pytest

from kafka_stream_spark.sources import mqtt_codec as m
from kafka_stream_spark.sources.topics import FileTopic


def test_varint_boundaries():
    for n, expect in [
        (0, b"\x00"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (16_383, b"\xff\x7f"),
        (16_384, b"\x80\x80\x01"),
        (268_435_455, b"\xff\xff\xff\x7f"),
    ]:
        assert m._varint(n) == expect
        assert m._read_varint(expect, 0) == (n, len(expect))
    with pytest.raises(ValueError):
        m._varint(268_435_456)


def test_connect_publish_roundtrip():
    session = [
        m.Frame(m.CONNECT, client_id="sensor-1", keepalive=60),
        m.Frame(m.CONNACK, return_code=0),
        m.Frame(m.SUBSCRIBE, packet_id=7, topics=[("telemetry/+", 1)]),
        m.Frame(m.SUBACK, packet_id=7, topics=[("", 1)]),
        m.Frame(m.PUBLISH, topic="telemetry/temp", payload=b'{"c":21.5}'),
        m.Frame(m.PUBLISH, topic="telemetry/rpm", payload=b"900",
                qos=1, packet_id=8, retain=True),
        m.Frame(m.PUBACK, packet_id=8),
        m.Frame(m.PINGREQ),
        m.Frame(m.PINGRESP),
        m.Frame(m.DISCONNECT),
    ]
    wire = b"".join(m.encode(f) for f in session)
    frames, rest = m.decode_stream(wire)
    assert rest == b""
    assert [f.type for f in frames] == [f.type for f in session]
    c = frames[0]
    assert c.client_id == "sensor-1" and c.keepalive == 60 and c.clean_session
    assert frames[2].topics == [("telemetry/+", 1)]
    p0, p1 = frames[4], frames[5]
    assert (p0.topic, p0.payload, p0.qos) == ("telemetry/temp", b'{"c":21.5}', 0)
    assert (p1.topic, p1.qos, p1.packet_id, p1.retain) == ("telemetry/rpm", 1, 8, True)


def test_incremental_parse_survives_any_split():
    frames = [
        m.Frame(m.PUBLISH, topic="t/a", payload=b"x" * 200),  # 2-byte varint
        m.Frame(m.PUBLISH, topic="t/b", payload=b"y"),
    ]
    wire = b"".join(m.encode(f) for f in frames)
    for chunk in range(1, 9):  # feed 1..8 bytes at a time
        got, buf = [], b""
        for i in range(0, len(wire), chunk):
            buf += wire[i : i + chunk]
            fs, buf = m.decode_stream(buf)
            got.extend(fs)
        assert buf == b""
        assert [(f.topic, f.payload) for f in got] == [
            ("t/a", b"x" * 200), ("t/b", b"y"),
        ]


def test_publishes_df_to_file_topic(spark, tmp_path):
    """The connector path: MQTT byte streams in a binary column →
    PUBLISH records → FileTopic with Kafka semantics."""
    stream1 = b"".join(
        m.encode(f) for f in [
            m.Frame(m.CONNECT, client_id="c1"),
            m.Frame(m.PUBLISH, topic="sensors/a", payload=b"1"),
            m.Frame(m.PINGREQ),
            m.Frame(m.PUBLISH, topic="sensors/b", payload=b"2",
                    qos=1, packet_id=3),
        ]
    )
    stream2 = m.encode(m.Frame(m.PUBLISH, topic="sensors/a", payload=b"3"))
    df = spark.createDataFrame([(stream1,), (stream2,)], "value binary")
    pubs = m.decode_publishes_df(df)
    rows = sorted(
        (r.mqtt_topic, bytes(r.payload), r.qos) for r in pubs.collect()
    )
    assert rows == [("sensors/a", b"1", 0), ("sensors/a", b"3", 0),
                    ("sensors/b", b"2", 1)]
    ft = FileTopic(spark, str(tmp_path), "mqtt_in", partitions=2)
    ft.append(pubs.selectExpr("cast(mqtt_topic as binary) as key",
                              "payload as value"))
    assert ft.read().count() == 3
    # keyed partitioning: both sensors/a records share a partition
    parts = {
        bytes(r.key): r.partition for r in ft.read().collect()
    }
    assert len({p for k, p in parts.items() if k == b"sensors/a"}) == 1
