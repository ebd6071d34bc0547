"""Property-based tests (hypothesis) for the pure-Python layers.

These cover the codec/parser state spaces the example-based tests can't:
arbitrary ints through zig-zag, arbitrary unicode through string encoding,
arbitrary identifier combinations through the KCQL grammar.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_stream_spark.functions import avro_codec
from kafka_stream_spark.plans import kcql

INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(INT64)
@settings(max_examples=300)
def test_zigzag_roundtrip(v):
    buf = avro_codec._zigzag_encode(v)
    out, pos = avro_codec._zigzag_decode(buf, 0)
    assert out == v and pos == len(buf)


RECORD_SCHEMA = {
    "type": "record",
    "name": "P",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "d", "type": ["null", "double"]},
        {"name": "b", "type": "boolean"},
        {"name": "xs", "type": {"type": "array", "items": "int"}},
    ],
}


@given(
    s=st.text(max_size=80),
    n=INT64,
    d=st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False)),
    b=st.booleans(),
    xs=st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=10),
)
@settings(max_examples=200)
def test_record_roundtrip(s, n, d, b, xs):
    rec = {"s": s, "n": n, "d": d, "b": b, "xs": xs}
    out = avro_codec.decode_record(avro_codec.encode_record(rec, RECORD_SCHEMA), RECORD_SCHEMA)
    assert out == rec


IDENT = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,15}", fullmatch=True)


@given(
    target=IDENT,
    source=IDENT,
    fields=st.lists(st.tuples(IDENT, st.one_of(st.none(), IDENT)), min_size=1, max_size=5),
    pk=st.one_of(st.none(), IDENT),
    limit=st.one_of(st.none(), st.integers(min_value=1, max_value=10**6)),
)
@settings(max_examples=200)
def test_kcql_parse_roundtrip(target, source, fields, pk, limit):
    sel = ", ".join(f"{f} AS {a}" if a else f for f, a in fields)
    stmt = f"INSERT INTO {target} SELECT {sel} FROM {source}"
    if pk:
        stmt += f" PK {pk}"
    if limit:
        stmt += f" LIMIT {limit}"
    parsed = kcql.parse(stmt)
    assert parsed.target == target
    assert parsed.source == source
    assert parsed.projections == tuple((f, a) for f, a in fields)
    assert parsed.pk == ((pk,) if pk else ())
    assert parsed.limit == limit


MAP_ENUM_FIXED_SCHEMA = {
    "type": "record",
    "name": "MEF",
    "fields": [
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "e", "type": {"type": "enum", "name": "Color",
                               "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "f", "type": {"type": "fixed", "name": "F8", "size": 8}},
        {"name": "om", "type": ["null", {"type": "map", "values": "string"}]},
    ],
}


@given(
    st.dictionaries(st.text(max_size=20), INT64, max_size=8),
    st.sampled_from(["RED", "GREEN", "BLUE"]),
    st.binary(min_size=8, max_size=8),
    st.one_of(st.none(), st.dictionaries(st.text(max_size=5), st.text(max_size=10), max_size=4)),
)
@settings(max_examples=200)
def test_map_enum_fixed_roundtrip(m, e, f, om):
    rec = {"m": m, "e": e, "f": f, "om": om}
    buf = avro_codec.encode_record(rec, MAP_ENUM_FIXED_SCHEMA)
    out = avro_codec.decode_record(buf, MAP_ENUM_FIXED_SCHEMA)
    assert out == rec


# ---------------------------------------------------------------------------
# as-of step vs brute force
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_EVT = st.tuples(
    st.integers(0, 50),          # ts
    st.integers(0, 10_000),      # event_id
    st.integers(0, 1),           # side: 0 table / 1 stream
)


@given(st.lists(_EVT, min_size=0, max_size=30, unique_by=lambda e: e[1]))  # event_id is a key
@settings(max_examples=200, deadline=None)
def test_asof_step_matches_bruteforce(rows):
    """_asof_step (single batch, no prior state) must attribute each
    stream row to the max-(ts, id) table row at-or-before it."""
    from kafka_stream_spark.streaming.stateful import _asof_step

    _, out = _asof_step(None, rows)
    views = [(ts, eid) for ts, eid, side in rows if side == 0]
    expect = {}
    for ts, eid, side in rows:
        if side == 1:
            prior = [v for v in views if v[0] <= ts]
            expect[eid] = max(prior) if prior else None
    assert len(out) == len(expect)
    for eid, ts, got_view in out:
        assert got_view == expect[eid], (rows, out)


# --- wire codecs added in round 2: RESP, CoAP, FTP replies ----------------

from kafka_stream_spark.sources import coap_codec, ftp_codec, resp_codec

RESP_SCALAR = st.one_of(
    st.none(),
    INT64,
    st.binary(max_size=64),
    st.text(max_size=64),
)
RESP_VALUE = st.recursive(
    RESP_SCALAR, lambda inner: st.lists(inner, max_size=6), max_leaves=24
)


def _resp_canon(v):
    """Decoded form: text becomes bytes (bulk strings are binary-safe)."""
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, list):
        return [_resp_canon(x) for x in v]
    return v


@given(RESP_VALUE)
@settings(max_examples=200)
def test_resp_roundtrip(v):
    frames, rest = resp_codec.decode_stream(resp_codec.encode(v))
    assert rest == b""
    assert frames == [_resp_canon(v)]


@given(st.lists(RESP_VALUE, min_size=1, max_size=4), st.integers(1, 500))
@settings(max_examples=100)
def test_resp_arbitrary_split_boundary(vs, cut):
    whole = b"".join(resp_codec.encode(v) for v in vs)
    cut = min(cut, len(whole) - 1)
    f1, rest = resp_codec.decode_stream(whole[:cut])
    f2, rest2 = resp_codec.decode_stream(rest + whole[cut:])
    assert rest2 == b""
    assert f1 + f2 == [_resp_canon(v) for v in vs]


COAP_OPT = st.tuples(
    st.integers(min_value=0, max_value=2000),
    st.binary(max_size=300),
)


@given(
    st.integers(0, 3),
    st.integers(0, 255),
    st.integers(0, 0xFFFF),
    st.binary(max_size=8),
    st.lists(COAP_OPT, max_size=5),
    st.binary(min_size=1, max_size=64),
)
@settings(max_examples=200)
def test_coap_roundtrip(mtype, code, mid, token, options, payload):
    msg = coap_codec.Message(
        type=mtype, code=code, message_id=mid, token=token,
        options=sorted(options, key=lambda o: o[0]), payload=payload,
    )
    out = coap_codec.decode(coap_codec.encode(msg))
    assert out == msg


FTP_LINE = st.text(
    alphabet=st.characters(blacklist_characters="\r\n", max_codepoint=0xFF),
    max_size=40,
)


@given(st.integers(100, 599), st.lists(FTP_LINE, min_size=1, max_size=5), st.integers(1, 300))
@settings(max_examples=150)
def test_ftp_multiline_reply_any_split(code, inner, cut):
    body = f"{code}-{inner[0]}\r\n"
    for line in inner[1:]:
        if line.startswith(f"{code} "):
            line = " " + line  # RFC 959 §4.2: servers pad ambiguous lines
        body += line + "\r\n"
    body += f"{code} done\r\n"
    whole = body.encode("latin-1")
    cut = min(cut, len(whole) - 1)
    r1, rest = ftp_codec.decode_replies(whole[:cut])
    r2, rest2 = ftp_codec.decode_replies(rest + whole[cut:])
    replies = r1 + r2
    assert rest2 == b""
    assert len(replies) == 1
    assert replies[0].code == code
    assert replies[0].lines[-1] == "done"
