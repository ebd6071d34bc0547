"""CoAP RFC 7252 codec: byte-exact round-trips, extended option
delta/length encodings, known-bytes parity, and the message → record
Spark path."""

import pytest

from kafka_stream_spark.sources import coap_codec as c


def test_ext_nibble_boundaries():
    for value, expect in [
        (0, (0, b"")),
        (12, (12, b"")),
        (13, (13, b"\x00")),
        (268, (13, b"\xff")),
        (269, (14, b"\x00\x00")),
        (65804, (14, b"\xff\xff")),
    ]:
        assert c._ext(value) == expect
        nib, ext = expect
        assert c._read_ext(nib, ext, 0) == (value, len(ext))
    with pytest.raises(ValueError):
        c._ext(65805)
    with pytest.raises(ValueError):
        c._read_ext(15, b"", 0)


def test_get_request_known_bytes():
    # CON GET /temp, mid=0x1234, 1-byte token — assembled per §3 by hand:
    # header 0x41 (ver1, CON, tkl1), code 0.01, mid, token, then
    # Uri-Path(11): delta 11, len 4 -> 0xB4 'temp'
    m = c.Message(
        type=c.CON, code=c.GET, message_id=0x1234, token=b"\xaa",
        options=[(c.OPT_URI_PATH, b"temp")],
    )
    assert c.encode(m) == b"\x41\x01\x12\x34\xaa\xb4temp"
    assert c.decode(c.encode(m)) == m


def test_roundtrip_all_fields():
    m = c.Message(
        type=c.CON, code=c.POST, message_id=7, token=b"\x01\x02",
        options=[
            (c.OPT_URI_PATH, b"sensors"),
            (c.OPT_URI_PATH, b"humidity"),
            (c.OPT_CONTENT_FORMAT, b"\x00\x32"),  # 50 = application/json
            (c.OPT_URI_QUERY, b"unit=rh"),
        ],
        payload=b'{"v": 41.5}',
    )
    out = c.decode(c.encode(m))
    assert out == m
    assert out.uri_path == "sensors/humidity"
    assert out.content_format == 50
    assert c.code_str(out.code) == "0.02"


def test_repeated_option_zero_delta():
    # two Uri-Path segments: second has delta 0 — must still decode as 11
    m = c.Message(options=[(c.OPT_URI_PATH, b"a"), (c.OPT_URI_PATH, b"b")])
    raw = c.encode(m)
    assert c.decode(raw).options == [(11, b"a"), (11, b"b")]


def test_extended_delta_and_length():
    # option number 300 forces a 14-nibble delta; 20-byte value forces a
    # 13-nibble length; both extended forms must round-trip
    m = c.Message(options=[(300, b"x" * 20)], payload=b"p")
    assert c.decode(c.encode(m)).options == [(300, b"x" * 20)]
    # and a >268 length takes the 2-byte extended form
    m2 = c.Message(options=[(c.OPT_URI_PATH, b"y" * 300)])
    assert c.decode(c.encode(m2)).options == [(11, b"y" * 300)]


def test_piggybacked_response():
    # ACK 2.05 Content carrying the response payload, token echoed (§5.2.1)
    rsp = c.Message(
        type=c.ACK, code=c.CONTENT, message_id=0x1234, token=b"\xaa",
        options=[(c.OPT_CONTENT_FORMAT, b"")],  # 0 = text/plain, zero-len value
        payload=b"22.3 C",
    )
    out = c.decode(c.encode(rsp))
    assert (out.type, c.code_str(out.code), out.token) == (c.ACK, "2.05", b"\xaa")
    assert out.content_format == 0
    assert out.payload == b"22.3 C"


def test_malformed_rejected():
    with pytest.raises(ValueError):
        c.decode(b"\x41\x01")  # short header
    with pytest.raises(ValueError):
        c.decode(b"\x81\x01\x00\x01")  # version 2
    with pytest.raises(ValueError):
        c.decode(b"\x4f\x01\x00\x01" + b"t" * 15)  # reserved tkl 15
    with pytest.raises(ValueError):
        # payload marker with nothing after it
        c.decode(c.encode(c.Message(options=[(11, b"a")])) + b"\xff")


def test_decode_messages_df(spark):
    msgs = [
        c.encode(
            c.Message(
                type=c.NON, code=c.POST, message_id=i,
                options=[(c.OPT_URI_PATH, b"telemetry"),
                         (c.OPT_CONTENT_FORMAT, b"\x00\x32")],
                payload=f'{{"i": {i}}}'.encode(),
            )
        )
        for i in range(5)
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value binary")
    rows = c.decode_messages_df(df).orderBy("message_id").collect()
    assert [r.message_id for r in rows] == list(range(5))
    assert all(r.uri_path == "telemetry" for r in rows)
    assert all(r.code == "0.02" for r in rows)
    assert all(r.content_format == 50 for r in rows)
    assert rows[3].payload == b'{"i": 3}'
