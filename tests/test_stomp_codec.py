"""STOMP 1.2 codec (JMS family): byte-exact frame round-trips incl.
header escaping and NUL-bearing bodies, split-boundary incremental
parsing, heart-beat skipping, and the JMS sink shape end to end."""

import glob
import os
import uuid

from hypothesis import given, settings, strategies as st

from kafka_stream_spark.sources.stomp_codec import (
    decode_stream,
    encode_frame,
    jms_sink,
)

_HDR_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=0,
    max_size=20,
)
_FRAME = st.tuples(
    st.sampled_from(["SEND", "MESSAGE", "SUBSCRIBE", "ACK"]),
    st.dictionaries(
        _HDR_TEXT.filter(lambda s: s and s != "content-length"),
        _HDR_TEXT,
        min_size=0,
        max_size=4,
    ),
    st.binary(min_size=0, max_size=64),  # bodies may contain NUL
)


@given(_FRAME)
@settings(max_examples=150, deadline=None)
def test_frame_roundtrip(frame):
    command, headers, body = frame
    frames, rest = decode_stream(encode_frame(command, headers, body))
    assert rest == b""
    got_cmd, got_headers, got_body = frames[0]
    assert got_cmd == command and got_body == body
    for k, v in headers.items():
        assert got_headers[k] == v


@given(st.lists(_FRAME, min_size=1, max_size=4), st.integers(1, 400))
@settings(max_examples=100, deadline=None)
def test_arbitrary_split_boundary(frames, cut):
    whole = b"".join(encode_frame(*f) for f in frames)
    cut = min(cut, len(whole))
    first, rest = decode_stream(whole[:cut])
    more, tail = decode_stream(rest + whole[cut:])
    assert tail == b""
    got = first + more
    assert [(c, b) for c, _, b in got] == [(c, b) for c, _, b in frames]


def test_header_escaping_and_heartbeats():
    raw = encode_frame("SEND", {"weird:key": "line\nbreak\\x"}, b"ok")
    # heart-beat EOLs between frames must be skipped
    frames, rest = decode_stream(b"\n\n\r\n" + raw + b"\n" + raw)
    assert rest == b"" and len(frames) == 2
    assert frames[0][1]["weird:key"] == "line\nbreak\\x"


def test_repeated_header_keeps_first():
    raw = b"MESSAGE\ndest:a\ndest:b\ncontent-length:0\n\n\x00"
    frames, _ = decode_stream(raw)
    assert frames[0][1]["dest"] == "a"


def test_crlf_line_endings_accepted():
    # STOMP 1.2 EOL may be CRLF; parsers MUST accept both (spec §ABNF).
    raw = b"MESSAGE\r\ndest:a\r\ncontent-length:5\r\n\r\nhi\x00yo\x00"
    frames, rest = decode_stream(raw)
    assert rest == b""
    cmd, headers, body = frames[0]
    assert cmd == "MESSAGE"  # no trailing \r on the command line
    assert headers["dest"] == "a"
    assert body == b"hi\x00yo"


def test_crlf_incremental_and_mixed_endings():
    crlf = b"SEND\r\nd:x\r\n\r\nbody\x00"
    lf = encode_frame("ACK", {"id": "7"}, b"")
    whole = crlf + b"\r\n" + lf  # heart-beat CRLF between frames
    for cut in range(len(whole)):
        a, rest = decode_stream(whole[:cut])
        b, tail = decode_stream(rest + whole[cut:])
        assert tail == b""
        got = a + b
        assert [f[0] for f in got] == ["SEND", "ACK"]
        assert got[0][1]["d"] == "x" and got[0][2] == b"body"


def test_jms_sink_streams_send_frames(spark, tmp_path):
    schema = "order_id long, status string"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "NEW") for i in range(12)], schema
    ).write.parquet(src)
    out = str(tmp_path / "wire")

    def transport(payload: bytes) -> None:
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, f"w-{uuid.uuid4().hex}.stomp"), "wb") as f:
            f.write(payload)

    q = (
        jms_sink(
            spark.readStream.schema(schema).parquet(src),
            destination="/queue/orders",
            key_col="order_id",
            transport=transport,
            checkpoint=str(tmp_path / "ck"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    import json

    seen = {}
    for p in glob.glob(f"{out}/w-*.stomp"):
        frames, rest = decode_stream(open(p, "rb").read())
        assert rest == b""
        for cmd, headers, body in frames:
            assert cmd == "SEND"
            assert headers["destination"] == "/queue/orders"
            assert headers["content-type"] == "application/json"
            seen[headers["JMSCorrelationID"]] = json.loads(body)
    assert {k: v["status"] for k, v in seen.items()} == {
        str(i): "NEW" for i in range(12)
    }
