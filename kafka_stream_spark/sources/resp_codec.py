"""RESP (REdis Serialization Protocol) codec + Redis-sink command shape —
the Stream Reactor Redis-connector family (S12) at the protocol layer.

No Redis server exists in this container (same situation as Kafka
itself), so the honest testable surface is RESP2 framing — simple
strings, errors, integers, bulk strings (incl. null), arrays (incl.
nested), encoded and decoded byte-exactly, plus an incremental parser
that survives frames split across arbitrary read boundaries — and the
sink's two documented modes re-expressed over it:

- **cache mode**: each record → ``SET <prefix><key> <json>`` (the
  Stream Reactor Redis sink's ``INSERT INTO prefix SELECT ... PK k``);
- **sorted-set mode**: each record → ``ZADD <set> <score> <json>``
  (``STOREAS SortedSet(score=ts)``), giving time-ordered range reads.

Command rendering is JVM-side (``to_json`` over a struct, no Python
per-row cost); RESP encoding of the rendered commands is the transport
boundary, exercised via the codec below.

Public protocol: RESP2 (redis.io public spec); KCQL modes per Lenses'
public Stream Reactor docs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_CRLF = b"\r\n"


def encode(value) -> bytes:
    """Python value → RESP2 bytes. str → simple string is NOT assumed:
    all strings/bytes become bulk strings (binary-safe, what clients
    send); int → integer; None → null bulk; list/tuple → array;
    Exception → error."""
    if value is None:
        return b"$-1" + _CRLF
    if isinstance(value, bool):
        raise TypeError("RESP2 has no boolean type")
    if isinstance(value, int):
        return b":" + str(value).encode() + _CRLF
    if isinstance(value, str):
        value = value.encode("utf-8")
    if isinstance(value, (bytes, bytearray)):
        return b"$" + str(len(value)).encode() + _CRLF + bytes(value) + _CRLF
    if isinstance(value, Exception):
        return b"-" + str(value).encode() + _CRLF
    if isinstance(value, (list, tuple)):
        out = b"*" + str(len(value)).encode() + _CRLF
        return out + b"".join(encode(v) for v in value)
    raise TypeError(f"unsupported RESP value: {type(value)}")


def encode_command(*args) -> bytes:
    """A client command is an array of bulk strings (spec §'Sending
    commands to a Redis server')."""
    return encode([a if isinstance(a, (str, bytes)) else str(a) for a in args])


class Incomplete(Exception):
    """Internal: frame extends past the buffer end."""


def _decode_one(buf: bytes, pos: int):
    nl = buf.find(_CRLF, pos)
    if nl < 0:
        raise Incomplete
    t, head = buf[pos : pos + 1], buf[pos + 1 : nl]
    body_start = nl + 2
    if t == b"+":
        return head.decode("utf-8"), body_start
    if t == b"-":
        return Exception(head.decode("utf-8")), body_start
    if t == b":":
        return int(head), body_start
    if t == b"$":
        n = int(head)
        if n == -1:
            return None, body_start
        if body_start + n + 2 > len(buf):
            raise Incomplete
        if buf[body_start + n : body_start + n + 2] != _CRLF:
            raise ValueError("bulk string not CRLF-terminated")
        return bytes(buf[body_start : body_start + n]), body_start + n + 2
    if t == b"*":
        n = int(head)
        if n == -1:
            return None, body_start
        items, p = [], body_start
        for _ in range(n):
            item, p = _decode_one(buf, p)
            items.append(item)
        return items, p
    raise ValueError(f"unknown RESP type byte: {t!r}")


def decode_stream(buf: bytes) -> tuple[list, bytes]:
    """Parse every complete RESP frame; return (frames, rest). A frame
    split across reads stays in ``rest`` — feed ``rest + chunk`` back."""
    frames, pos = [], 0
    while pos < len(buf):
        try:
            frame, pos = _decode_one(buf, pos)
        except Incomplete:
            break
        frames.append(frame)
    return frames, buf[pos:]


# --- sink command rendering (distributed, JVM-side) ----------------------


def cache_commands(df: DataFrame, key_col: str, prefix: str = "") -> DataFrame:
    """Rows → (cmd='SET', key, value=json) — the cache-mode record shape.
    Rendering is pure column expressions; the executor-side transport
    turns each row into ``encode_command('SET', key, value)``."""
    doc_cols = [c for c in df.columns]
    return df.select(
        F.lit("SET").alias("cmd"),
        F.concat(F.lit(prefix), F.col(key_col).cast("string")).alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in doc_cols])).alias("value"),
    )


def sorted_set_commands(
    df: DataFrame, set_name: str, score_col: str
) -> DataFrame:
    """Rows → (cmd='ZADD', key=set, score, value=json) — sorted-set mode
    (score typically the event timestamp for time-range reads)."""
    doc_cols = [c for c in df.columns]
    return df.select(
        F.lit("ZADD").alias("cmd"),
        F.lit(set_name).alias("key"),
        F.col(score_col).cast("double").alias("score"),
        F.to_json(F.struct(*[F.col(c) for c in doc_cols])).alias("value"),
    )
