"""Pure-Python Avro binary codec (record subset) + Spark integration.

Closes SURVEY.md S3 without the spark-avro jar: the reference's data path
is Confluent-framed Avro (magic byte + schema id + Avro binary body —
``kafka-tests.yml:231-238``); ``functions/confluent.py`` handles the
frame, this module handles the body. Implements the Avro 1.x binary
encoding (public spec): zig-zag varint longs/ints, little-endian
float/double, length-prefixed bytes/strings, 1-byte booleans, index-
prefixed unions, block-encoded arrays; records are field-ordered
concatenation.

Supported type surface = what `avro_schema.py` maps (the reference's six
schemas need exactly: int, long, float, double, boolean, string, bytes,
[null,T] unions, arrays, nested records) plus map/enum/fixed and the
Avro logical types (decimal over bytes/fixed, date, time-millis/-micros,
timestamp-millis/-micros, uuid) — logical values convert at the codec
boundary, the wire bytes stay pure base-type Avro.

Spark integration is Arrow-batched ``mapInPandas`` (decode) / pandas UDF
(encode) — the Python-side cost is paid only on topics that actually use
Avro; JSON topics stay JVM-side.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import struct
from collections.abc import Iterator
from typing import Any

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, StructField, StructType

from kafka_stream_spark.functions import confluent, wire

# ---------------------------------------------------------------------------
# binary primitives (Avro spec, public)
# ---------------------------------------------------------------------------


_zigzag_encode = wire.zigzag_encode


# bounds-checked shared primitives (see functions/wire.py): overlong
# varints and out-of-range lengths raise ValueError instead of feeding
# attacker-controlled sizes into slicing / read()
_zigzag_decode = wire.zigzag_decode
_take = wire.take


_EPOCH_DATE = _dt.date(1970, 1, 1)


def _logical_to_base(v: Any, schema: dict, raw_time: bool = False) -> Any:
    """Convert a logical-typed Python value to its Avro base representation.

    ``raw_time``: time-millis/micros stay raw ints — the DataFrame-path
    representation (Spark has no TIME type; avro_schema maps these to
    int/long, so encode_df receives int columns, not datetime.time).
    """
    lt = schema["logicalType"]
    if lt == "decimal":
        d = _decimal.Decimal(v)
        scaled = d.scaleb(schema.get("scale", 0))
        if scaled != scaled.to_integral_value():
            # match the Avro Java library: reject precision loss instead
            # of silently half-even rounding on the wire
            raise ValueError(
                f"decimal {v} does not fit scale {schema.get('scale', 0)}"
            )
        unscaled = int(scaled)
        n = max(1, (unscaled.bit_length() + 8) // 8)  # two's-complement width
        if schema["type"] == "fixed":
            n = schema["size"]
        return unscaled.to_bytes(n, "big", signed=True)
    if lt == "date":
        return (v - _EPOCH_DATE).days
    if lt == "time-millis":
        if raw_time:
            return int(v)
        return (v.hour * 3600 + v.minute * 60 + v.second) * 1000 + v.microsecond // 1000
    if lt == "time-micros":
        if raw_time:
            return int(v)
        return (v.hour * 3600 + v.minute * 60 + v.second) * 1_000_000 + v.microsecond
    if lt in ("timestamp-millis", "timestamp-micros"):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        us = (v - _dt.datetime(1970, 1, 1)) // _dt.timedelta(microseconds=1)
        return us // 1000 if lt == "timestamp-millis" else us
    if lt == "uuid":
        return str(v)
    return v  # unknown logical types pass through per Avro spec


def _logical_from_base(v: Any, schema: dict, raw_time: bool = False) -> Any:
    lt = schema["logicalType"]
    if raw_time and lt in ("time-millis", "time-micros"):
        return v  # stays int — matches the int/long Spark schema mapping
    if lt == "decimal":
        unscaled = int.from_bytes(v, "big", signed=True)
        return _decimal.Decimal(unscaled).scaleb(-schema.get("scale", 0))
    if lt == "date":
        return _EPOCH_DATE + _dt.timedelta(days=v)
    if lt == "time-millis":
        return (_dt.datetime.min + _dt.timedelta(milliseconds=v)).time()
    if lt == "time-micros":
        return (_dt.datetime.min + _dt.timedelta(microseconds=v)).time()
    if lt == "timestamp-millis":
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(milliseconds=v)
    if lt == "timestamp-micros":
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=v)
    return v


def _encode_value(v: Any, schema: Any, out: bytearray, raw_time: bool = False) -> None:
    if isinstance(schema, dict) and "logicalType" in schema:
        v = _logical_to_base(v, schema, raw_time)
    if isinstance(schema, list):  # [null, T] union: index then value
        if v is None:
            out += _zigzag_encode(schema.index("null"))
            return
        idx = 1 if schema[0] == "null" else 0
        out += _zigzag_encode(idx)
        _encode_value(v, schema[idx], out, raw_time)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        for f in schema["fields"]:
            _encode_value(v.get(f["name"]) if isinstance(v, dict) else getattr(v, f["name"]), f["type"], out, raw_time)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "boolean":
        out.append(1 if v else 0)
    elif t == "string":
        b = str(v).encode("utf-8")
        out += _zigzag_encode(len(b))
        out += b
    elif t == "bytes":
        out += _zigzag_encode(len(v))
        out += bytes(v)
    elif t == "array":
        items = list(v)
        if items:
            out += _zigzag_encode(len(items))
            for item in items:
                _encode_value(item, schema["items"], out, raw_time)
        out += _zigzag_encode(0)
    elif t == "map":
        entries = dict(v)
        if entries:
            out += _zigzag_encode(len(entries))
            for k, mv in entries.items():
                kb = str(k).encode("utf-8")
                out += _zigzag_encode(len(kb))
                out += kb
                _encode_value(mv, schema["values"], out, raw_time)
        out += _zigzag_encode(0)
    elif t == "enum":
        out += _zigzag_encode(schema["symbols"].index(v))
    elif t == "fixed":
        b = bytes(v)
        if len(b) != schema["size"]:
            raise ValueError(
                f"fixed size mismatch: got {len(b)}, schema says {schema['size']}"
            )
        out += b
    else:
        raise ValueError(f"unsupported Avro type for encode: {t!r}")


def _decode_value(
    buf: bytes, pos: int, schema: Any, raw_time: bool = False
) -> tuple[Any, int]:
    v, pos = _decode_base(buf, pos, schema, raw_time)
    if isinstance(schema, dict) and "logicalType" in schema:
        v = _logical_from_base(v, schema, raw_time)
    return v, pos


def _decode_base(
    buf: bytes, pos: int, schema: Any, raw_time: bool = False
) -> tuple[Any, int]:
    if isinstance(schema, list):
        idx, pos = _zigzag_decode(buf, pos)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch index {idx} out of range")
        branch = schema[idx]
        if branch == "null":
            return None, pos
        return _decode_value(buf, pos, branch, raw_time)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode_value(buf, pos, f["type"], raw_time)
        return rec, pos
    if t in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t == "string":
        n, pos = _zigzag_decode(buf, pos)
        raw, pos = _take(buf, pos, n, "string")
        return raw.decode("utf-8"), pos
    if t == "bytes":
        n, pos = _zigzag_decode(buf, pos)
        raw, pos = _take(buf, pos, n, "bytes")
        return bytes(raw), pos
    if t == "array":
        items = []
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                _, pos = _zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                item, pos = _decode_value(buf, pos, schema["items"], raw_time)
                items.append(item)
        return items, pos
    if t == "map":
        entries: dict = {}
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                _, pos = _zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                kn, pos = _zigzag_decode(buf, pos)
                kraw, pos = _take(buf, pos, kn, "map key")
                k = kraw.decode("utf-8")
                entries[k], pos = _decode_value(buf, pos, schema["values"], raw_time)
        return entries, pos
    if t == "enum":
        idx, pos = _zigzag_decode(buf, pos)
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise ValueError(f"enum index {idx} out of range")
        return symbols[idx], pos
    if t == "fixed":
        raw, pos = _take(buf, pos, schema["size"], "fixed")
        return bytes(raw), pos
    raise ValueError(f"unsupported Avro type for decode: {t!r}")


def encode_record(record: dict, avro_schema: dict, raw_time: bool = False) -> bytes:
    out = bytearray()
    _encode_value(record, avro_schema, out, raw_time)
    return bytes(out)


def decode_record(payload: bytes, avro_schema: dict, raw_time: bool = False) -> dict:
    rec, pos = _decode_value(payload, 0, avro_schema, raw_time)
    if pos != len(payload):
        raise ValueError(f"trailing bytes after Avro record: {len(payload) - pos}")
    return rec


# ---------------------------------------------------------------------------
# compiled decoder: the schema walk happens ONCE, the per-record path is
# nested closures (no dict inspection / string dispatch per value) —
# ~3-4x the interpreter's throughput, same results (parity-tested)
# ---------------------------------------------------------------------------


def compile_decoder(schema: Any, raw_time: bool = False):
    """Compile an Avro schema node to a reader closure (buf, pos) ->
    (value, pos). Semantics identical to `_decode_value`."""
    if isinstance(schema, list):
        branches = [
            None if b == "null" else compile_decoder(b, raw_time) for b in schema
        ]

        def read_union(buf, pos, _branches=branches):
            idx, pos = _zigzag_decode(buf, pos)
            if not 0 <= idx < len(_branches):
                raise ValueError(f"union branch index {idx} out of range")
            br = _branches[idx]
            if br is None:
                return None, pos
            return br(buf, pos)

        return read_union

    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        readers = [
            (f["name"], compile_decoder(f["type"], raw_time))
            for f in schema["fields"]
        ]

        def read_record(buf, pos, _readers=readers):
            rec = {}
            for name, r in _readers:
                rec[name], pos = r(buf, pos)
            return rec, pos

        base = read_record
    elif t in ("int", "long"):
        base = _zigzag_decode
    elif t == "float":

        def base(buf, pos):
            return struct.unpack_from("<f", buf, pos)[0], pos + 4

    elif t == "double":

        def base(buf, pos):
            return struct.unpack_from("<d", buf, pos)[0], pos + 8

    elif t == "boolean":

        def base(buf, pos):
            return buf[pos] == 1, pos + 1

    elif t == "string":

        def base(buf, pos):
            n, pos = _zigzag_decode(buf, pos)
            raw, pos = _take(buf, pos, n, "string")
            return raw.decode("utf-8"), pos

    elif t == "bytes":

        def base(buf, pos):
            n, pos = _zigzag_decode(buf, pos)
            raw, pos = _take(buf, pos, n, "bytes")
            return bytes(raw), pos

    elif t == "array":
        item = compile_decoder(schema["items"], raw_time)

        def base(buf, pos, _item=item):
            items = []
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    break
                if n < 0:
                    _, pos = _zigzag_decode(buf, pos)
                    n = -n
                if n > len(buf) - pos:
                    # zero-width items ("null", empty record) make a
                    # crafted 2^63-ish block count a hang, not an
                    # overrun — bound by bytes remaining like
                    # avro_ocf._read_meta (fuzz contract, ADVICE r4)
                    raise ValueError(
                        f"avro array block count {n} exceeds remaining "
                        f"bytes {len(buf) - pos}"
                    )
                for _ in range(n):
                    v, pos = _item(buf, pos)
                    items.append(v)
            return items, pos

    elif t == "map":
        val = compile_decoder(schema["values"], raw_time)

        def base(buf, pos, _val=val):
            entries = {}
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    break
                if n < 0:
                    _, pos = _zigzag_decode(buf, pos)
                    n = -n
                if n > len(buf) - pos:
                    raise ValueError(
                        f"avro map block count {n} exceeds remaining "
                        f"bytes {len(buf) - pos}"
                    )
                for _ in range(n):
                    kn, pos = _zigzag_decode(buf, pos)
                    kraw, pos = _take(buf, pos, kn, "map key")
                    entries[kraw.decode("utf-8")], pos = _val(buf, pos)
            return entries, pos

    elif t == "enum":
        symbols = schema["symbols"]

        def base(buf, pos, _symbols=symbols):
            idx, pos = _zigzag_decode(buf, pos)
            if not 0 <= idx < len(_symbols):
                raise ValueError(f"enum index {idx} out of range")
            return _symbols[idx], pos

    elif t == "fixed":
        size = schema["size"]

        def base(buf, pos, _n=size):
            raw, pos = _take(buf, pos, _n, "fixed")
            return bytes(raw), pos

    else:
        raise ValueError(f"unsupported Avro type for decode: {t!r}")

    if isinstance(schema, dict) and "logicalType" in schema:
        inner = base

        def read_logical(buf, pos, _inner=inner, _schema=schema):
            v, pos = _inner(buf, pos)
            return _logical_from_base(v, _schema, raw_time), pos

        return read_logical
    return base


def compiled_record_decoder(avro_schema: dict, raw_time: bool = False):
    """decode_record's compiled equivalent: payload -> record dict."""
    dec = compile_decoder(avro_schema, raw_time)

    def decode(payload: bytes) -> dict:
        rec, pos = dec(payload, 0)
        if pos != len(payload):
            raise ValueError(
                f"trailing bytes after Avro record: {len(payload) - pos}"
            )
        return rec

    return decode


def compile_encoder(schema: Any, raw_time: bool = False):
    """Compile an Avro schema node to a writer closure (v, out) -> None.
    Semantics identical to `_encode_value`."""
    if isinstance(schema, list):
        # Mirror _encode_value: a union without a null branch is legal for
        # non-None values; only raise when a None actually arrives.
        null_tok = (
            _zigzag_encode(schema.index("null")) if "null" in schema else None
        )
        val_idx = 1 if schema[0] == "null" else 0
        val_writer = compile_encoder(schema[val_idx], raw_time)
        val_tok = _zigzag_encode(val_idx)

        def write_union(v, out, _n=null_tok, _t=val_tok, _w=val_writer):
            if v is None:
                if _n is None:
                    raise ValueError("None for a union with no null branch")
                out += _n
            else:
                out += _t
                _w(v, out)

        return write_union

    logical = isinstance(schema, dict) and "logicalType" in schema
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        writers = [
            (f["name"], compile_encoder(f["type"], raw_time))
            for f in schema["fields"]
        ]

        def base(v, out, _writers=writers):
            get = v.get if isinstance(v, dict) else None
            if get is not None:
                for name, w in _writers:
                    w(get(name), out)
            else:
                for name, w in _writers:
                    w(getattr(v, name), out)

    elif t in ("int", "long"):

        def base(v, out):
            out += _zigzag_encode(int(v))

    elif t == "float":

        def base(v, out):
            out += struct.pack("<f", float(v))

    elif t == "double":

        def base(v, out):
            out += struct.pack("<d", float(v))

    elif t == "boolean":

        def base(v, out):
            out.append(1 if v else 0)

    elif t == "string":

        def base(v, out):
            b = str(v).encode("utf-8")
            out += _zigzag_encode(len(b))
            out += b

    elif t == "bytes":

        def base(v, out):
            out += _zigzag_encode(len(v))
            out += bytes(v)

    elif t == "array":
        item = compile_encoder(schema["items"], raw_time)

        def base(v, out, _item=item):
            items = list(v)
            if items:
                out += _zigzag_encode(len(items))
                for it in items:
                    _item(it, out)
            out += b"\x00"  # zigzag(0)

    elif t == "map":
        val = compile_encoder(schema["values"], raw_time)

        def base(v, out, _val=val):
            entries = dict(v)
            if entries:
                out += _zigzag_encode(len(entries))
                for k, mv in entries.items():
                    kb = str(k).encode("utf-8")
                    out += _zigzag_encode(len(kb))
                    out += kb
                    _val(mv, out)
            out += b"\x00"

    elif t == "enum":
        symbols = schema["symbols"]

        def base(v, out, _symbols=symbols):
            out += _zigzag_encode(_symbols.index(v))

    elif t == "fixed":
        size = schema["size"]

        def base(v, out, _n=size):
            b = bytes(v)
            if len(b) != _n:
                raise ValueError(
                    f"fixed size mismatch: got {len(b)}, schema says {_n}"
                )
            out += b

    else:
        raise ValueError(f"unsupported Avro type for encode: {t!r}")

    if logical:
        inner = base

        def write_logical(v, out, _inner=inner, _schema=schema):
            _inner(_logical_to_base(v, _schema, raw_time), out)

        return write_logical
    return base


def compiled_record_encoder(avro_schema: dict, raw_time: bool = False):
    """encode_record's compiled equivalent: record dict -> payload."""
    enc = compile_encoder(avro_schema, raw_time)

    def encode(record) -> bytes:
        out = bytearray()
        enc(record, out)
        return bytes(out)

    return encode


# ---------------------------------------------------------------------------
# Spark integration: framed encode/decode over DataFrames
# ---------------------------------------------------------------------------


def encode_df(df: DataFrame, avro_schema: dict, schema_id: int, out_col: str = "value") -> DataFrame:
    """struct columns → Confluent-framed Avro binary column.

    Python encode runs in a pandas UDF (Arrow batches); the 5-byte frame is
    prepended JVM-side (``confluent.frame``) so the frame logic is shared
    with jar-backed deployments.
    """
    import json as _json

    schema_json = _json.dumps(avro_schema)
    cols = [f["name"] for f in avro_schema["fields"]]

    @F.pandas_udf(BinaryType())
    def enc(*series: pd.Series) -> pd.Series:
        import json

        sch = json.loads(schema_json)
        encode = compiled_record_encoder(sch, raw_time=True)
        out = []
        for vals in zip(*series):
            rec = dict(zip(cols, (None if pd.isna(v) and not isinstance(v, (list, tuple, dict, bytes)) else v for v in vals)))
            out.append(encode(rec))
        return pd.Series(out)

    body = enc(*[F.col(c) for c in cols])
    return df.withColumn(out_col, confluent.frame(schema_id, body))


def decode_df(
    df: DataFrame,
    avro_schema: dict,
    spark_schema: StructType,
    value_col: str = "value",
    mode: str = "FAILFAST",
) -> DataFrame:
    """Confluent-framed Avro binary column → typed columns (S3 scan).

    Frame stripping is JVM-side; body decode is Arrow-batched Python.
    Emits the record fields as top-level columns typed by ``spark_schema``.

    ``mode``: FAILFAST raises on a corrupt record (whole-task failure);
    PERMISSIVE nulls the record's fields and captures the raw payload in a
    ``_corrupt_record`` binary column (the ``from_json`` convention).
    """
    import json as _json

    if mode not in ("FAILFAST", "PERMISSIVE"):
        raise ValueError(f"mode must be FAILFAST or PERMISSIVE, got {mode!r}")
    schema_json = _json.dumps(avro_schema)
    permissive = mode == "PERMISSIVE"
    stripped = df.withColumn("__body", confluent.unframe_body(F.col(value_col)))
    out_schema = spark_schema
    if permissive:
        # corrupt records null every field → all fields must be nullable
        out_schema = StructType(
            [StructField(f.name, f.dataType, True) for f in spark_schema.fields]
            + [StructField("_corrupt_record", BinaryType(), True)]
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        sch = json.loads(schema_json)
        names = [f["name"] for f in sch["fields"]]
        decode = compiled_record_decoder(sch, raw_time=True)
        for pdf in batches:
            recs, corrupt = [], []
            for b in pdf["__body"]:
                try:
                    recs.append(decode(bytes(b)))
                    corrupt.append(None)
                except Exception:
                    if not permissive:
                        raise
                    recs.append({n: None for n in names})
                    corrupt.append(bytes(b))
            data = {n: [r[n] for r in recs] for n in names}
            if permissive:
                data["_corrupt_record"] = corrupt
            yield pd.DataFrame(data)

    return stripped.select("__body").mapInPandas(gen, schema=out_schema)


def decode_df_evolving(
    df: DataFrame,
    writer_schemas: dict[int, dict],
    reader_schema: dict,
    spark_schema: StructType,
    value_col: str = "value",
) -> DataFrame:
    """Mixed-version topic decode with writer/reader schema resolution.

    The Confluent consumer's evolution behavior (the registry compat tests
    at kafka-tests.yml:144-156 exist precisely so this read works): each
    record's 4-byte schema id picks its WRITER schema; the decoded record
    is then resolved against the READER schema — missing fields take the
    reader field's Avro ``default`` (or null), dropped fields are ignored.
    A topic containing v1 and v2 records therefore decodes to ONE uniform
    reader-typed frame.

    Scale: schema-id extraction is JVM-side; per-batch schema dispatch is a
    dict lookup, so the Arrow path stays vectorized per record batch.
    """
    import json as _json

    writers_json = _json.dumps({str(k): v for k, v in writer_schemas.items()})
    reader_json = _json.dumps(reader_schema)
    stripped = df.select(
        confluent.unframe_schema_id(F.col(value_col)).alias("__sid"),
        confluent.unframe_body(F.col(value_col)).alias("__body"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        writers = {int(k): v for k, v in json.loads(writers_json).items()}
        reader = json.loads(reader_json)
        names = [f["name"] for f in reader["fields"]]
        defaults = {f["name"]: f.get("default") for f in reader["fields"]}
        for pdf in batches:
            recs = []
            for sid, b in zip(pdf["__sid"], pdf["__body"]):
                try:
                    writer = writers[int(sid)]
                except KeyError:
                    raise ValueError(f"unknown schema id {sid} (have {sorted(writers)})")
                raw = decode_record(bytes(b), writer, raw_time=True)
                recs.append({n: raw.get(n, defaults[n]) for n in names})
            yield pd.DataFrame({n: [r[n] for r in recs] for n in names})

    return stripped.mapInPandas(gen, schema=spark_schema)
