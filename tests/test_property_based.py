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
