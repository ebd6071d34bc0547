"""RESP2 codec: byte-exact round-trips, nested arrays, split-boundary
incremental parsing, and the Redis sink's cache/sorted-set command
rendering."""

import json

import pytest

from kafka_stream_spark.sources import resp_codec as r


def test_scalar_encodings():
    assert r.encode(42) == b":42\r\n"
    assert r.encode(None) == b"$-1\r\n"
    assert r.encode("OK?") == b"$3\r\nOK?\r\n"
    assert r.encode(b"\x00\xff") == b"$2\r\n\x00\xff\r\n"
    assert r.encode(Exception("ERR bad")) == b"-ERR bad\r\n"
    with pytest.raises(TypeError):
        r.encode(True)


def test_command_is_array_of_bulk_strings():
    assert r.encode_command("SET", "k", 7) == (
        b"*3\r\n$3\r\nSET\r\n$1\r\nk\r\n$1\r\n7\r\n"
    )


def test_nested_array_roundtrip():
    frame = [b"a", 1, None, [b"nested", 2], b"z"]
    frames, rest = r.decode_stream(r.encode(frame))
    assert frames == [frame]
    assert rest == b""


def test_decode_stream_multiple_frames():
    buf = r.encode(1) + r.encode("pong") + r.encode([b"x"])
    frames, rest = r.decode_stream(buf)
    assert frames == [1, b"pong", [b"x"]]
    assert rest == b""


def test_split_boundary_incremental():
    whole = r.encode_command("ZADD", "s", "1.5", '{"a": 1}') + r.encode("OK")
    for cut in range(1, len(whole)):
        f1, rest = r.decode_stream(whole[:cut])
        f2, rest2 = r.decode_stream(rest + whole[cut:])
        assert rest2 == b"", cut
        frames = f1 + f2
        assert frames[-1] == b"OK"
        assert frames[0][0] == b"ZADD"


def test_error_frames_surface_as_exceptions():
    frames, _ = r.decode_stream(b"-WRONGTYPE not a set\r\n")
    assert isinstance(frames[0], Exception)
    assert "WRONGTYPE" in str(frames[0])


def test_malformed_bulk_rejected():
    with pytest.raises(ValueError):
        r.decode_stream(b"$2\r\nabXX\r\n")


def test_cache_commands(spark):
    df = spark.createDataFrame([(5, "click", 1.5)], "user_id long, t string, v double")
    row = r.cache_commands(df, "user_id", prefix="evt:").collect()[0]
    assert (row.cmd, row.key) == ("SET", "evt:5")
    assert json.loads(row.value) == {"user_id": 5, "t": "click", "v": 1.5}
    # the rendered row encodes to a well-formed RESP command
    wire = r.encode_command(row.cmd, row.key, row.value)
    frames, rest = r.decode_stream(wire)
    assert rest == b"" and frames[0][0] == b"SET"


def test_sorted_set_commands(spark):
    df = spark.createDataFrame([(5, 1700000000, "x")], "k long, ts long, s string")
    row = r.sorted_set_commands(df, "events_by_time", "ts").collect()[0]
    assert (row.cmd, row.key, row.score) == ("ZADD", "events_by_time", 1700000000.0)
    assert json.loads(row.value)["k"] == 5
