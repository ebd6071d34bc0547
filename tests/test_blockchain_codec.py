"""Blockchain connector family: RFC 6455 WebSocket frame codec
(known-bytes parity, masking, 7/16/64-bit lengths, fragmentation,
incremental partial-frame handling) and the blockchain.info utx →
flat-record Spark path."""

import json
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_stream_spark.sources import blockchain_codec as bc


def test_known_bytes_unmasked_text():
    # RFC 6455 §5.7's first example: single-frame unmasked "Hello"
    raw = b"\x81\x05Hello"
    frames, rest = bc.decode_stream(raw)
    assert rest == b""
    assert frames == [bc.WsFrame(bc.OP_TEXT, b"Hello", fin=True, masked=False)]
    assert bc.encode_frame(frames[0]) == raw


def test_known_bytes_masked_text():
    # §5.7's second example: masked "Hello" with key 37 fa 21 3d
    raw = b"\x81\x85\x37\xfa\x21\x3d\x7f\x9f\x4d\x51\x58"
    frames, rest = bc.decode_stream(raw)
    assert rest == b""
    assert frames[0].payload == b"Hello"
    assert frames[0].masked
    assert bc.encode_frame(
        bc.WsFrame(bc.OP_TEXT, b"Hello", masked=True),
        mask_key=b"\x37\xfa\x21\x3d",
    ) == raw


def test_known_bytes_fragmented():
    # §5.7: fragmented unmasked "Hel" + "lo"
    raw = b"\x01\x03Hel\x80\x02lo"
    frames, rest = bc.decode_stream(raw)
    assert rest == b""
    msgs = bc.reassemble_messages(frames)
    assert msgs == [(bc.OP_TEXT, b"Hello")]


def test_known_bytes_ping_pong():
    # §5.7: unmasked ping + masked pong, both "Hello"
    frames, _ = bc.decode_stream(b"\x89\x05Hello")
    assert frames == [bc.WsFrame(bc.OP_PING, b"Hello", fin=True, masked=False)]
    frames, _ = bc.decode_stream(
        b"\x8a\x85\x37\xfa\x21\x3d\x7f\x9f\x4d\x51\x58")
    assert frames[0].opcode == bc.OP_PONG and frames[0].payload == b"Hello"


def test_16_and_64_bit_lengths():
    p16 = bytes(range(256)) * 2  # 512 B -> 16-bit length
    raw = bc.encode_frame(bc.WsFrame(bc.OP_BINARY, p16))
    assert raw[1] == 126 and struct.unpack(">H", raw[2:4])[0] == 512
    p64 = b"\xab" * 70000  # > 65535 -> 64-bit length
    raw64 = bc.encode_frame(bc.WsFrame(bc.OP_BINARY, p64))
    assert raw64[1] == 127 and struct.unpack(">Q", raw64[2:10])[0] == 70000
    frames, rest = bc.decode_stream(raw + raw64)
    assert rest == b"" and [f.payload for f in frames] == [p16, p64]


def test_partial_frames_left_in_remainder():
    full = bc.encode_frame(bc.WsFrame(bc.OP_TEXT, b"hello world"))
    for cut in range(1, len(full)):
        frames, rest = bc.decode_stream(full[:cut])
        assert frames == [] and rest == full[:cut]
        frames, rest = bc.decode_stream(rest + full[cut:])
        assert [f.payload for f in frames] == [b"hello world"]
        assert rest == b""


@settings(max_examples=60, deadline=None)
@given(
    payloads=st.lists(st.binary(max_size=300), min_size=1, max_size=6),
    masked=st.booleans(),
    opcode=st.sampled_from([bc.OP_TEXT, bc.OP_BINARY]),
)
def test_roundtrip_property(payloads, masked, opcode):
    raw = b"".join(
        bc.encode_frame(bc.WsFrame(opcode, p, masked=masked),
                        mask_key=b"\x01\x02\x03\x04")
        for p in payloads
    )
    frames, rest = bc.decode_stream(raw)
    assert rest == b""
    assert [f.payload for f in frames] == payloads
    assert all(f.opcode == opcode and f.masked == masked for f in frames)


def test_subscription_ops_decode_to_expected_json():
    for raw, expect in [
        (bc.sub_unconfirmed(), {"op": "unconfirmed_sub"}),
        (bc.sub_blocks(), {"op": "blocks_sub"}),
        (bc.sub_address("1A2b"), {"op": "addr_sub", "addr": "1A2b"}),
    ]:
        frames, _ = bc.decode_stream(raw)
        assert frames[0].masked  # client frames must be masked (§5.1)
        assert json.loads(frames[0].payload) == expect


def _utx(h, t, outs):
    return {
        "op": "utx",
        "x": {
            "hash": h, "time": t, "tx_index": 7,
            "inputs": [{"prev_out": {"value": 1}}],
            "out": [{"addr": a, "value": v} for a, v in outs],
            "relayed_by": "127.0.0.1",
        },
    }


def test_flatten_tx_totals():
    rec = bc.flatten_tx(_utx("ab", 1700000000, [("x", 5), ("y", 7)])["x"])
    assert rec["tx_hash"] == "ab"
    assert rec["total_out_satoshi"] == 12
    assert rec["vin_sz"] == 1 and rec["vout_sz"] == 2
    assert rec["out_addrs"] == ["x", "y"]


def test_parse_push_ignores_non_utx():
    assert bc.parse_push(bc.OP_TEXT, b'{"op":"block","x":{}}') is None
    assert bc.parse_push(bc.OP_PONG, b"") is None
    assert bc.parse_push(bc.OP_TEXT, b"not json") is None


def test_decode_txs_df(spark):
    # two captured socket chunks: chunk 1 carries two utx pushes (one
    # fragmented) + a pong; chunk 2 carries a block push (skipped) + utx
    m1 = json.dumps(_utx("t1", 100, [("a", 10), ("b", 20)])).encode()
    m2 = json.dumps(_utx("t2", 200, [("c", 30)])).encode()
    m3 = json.dumps(_utx("t3", 300, [])).encode()
    chunk1 = (
        bc.encode_frame(bc.WsFrame(bc.OP_TEXT, m1[:20], fin=False))
        + bc.encode_frame(bc.WsFrame(bc.OP_CONT, m1[20:], fin=True))
        + bc.encode_frame(bc.WsFrame(bc.OP_PONG, b""))
        + bc.encode_frame(bc.WsFrame(bc.OP_TEXT, m2))
    )
    chunk2 = (
        bc.encode_frame(bc.WsFrame(bc.OP_TEXT, b'{"op":"block","x":{}}'))
        + bc.encode_frame(bc.WsFrame(bc.OP_TEXT, m3))
    )
    df = spark.createDataFrame([(chunk1,), (chunk2,)], "value binary")
    rows = {r.tx_hash: r for r in bc.decode_txs_df(df).collect()}
    assert set(rows) == {"t1", "t2", "t3"}
    assert rows["t1"].total_out_satoshi == 30
    assert rows["t1"].out_addrs == ["a", "b"]
    assert rows["t2"].vout_sz == 1
    assert rows["t3"].total_out_satoshi == 0
