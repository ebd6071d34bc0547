"""CoAP (RFC 7252) message codec — the Stream Reactor CoAP-connector
family (S12) at the protocol layer.

Like the MQTT family (``mqtt_codec.py``), no CoAP endpoint exists in
this container, so the honest testable surface is the wire format:
the 4-byte fixed header (version/type/token-length, code, message id),
tokens, the delta-encoded option list with 13/14 extended deltas and
lengths (RFC 7252 §3.1 — the part naive codecs get wrong), the 0xFF
payload marker, and piggybacked responses. The Spark integration turns
request/response messages carried in a binary column into
(method, uri_path, content_format, payload) records via Arrow-batched
``mapInPandas`` — the same plumbing shape as the Avro and MQTT codecs.

Reference framing: the reference ships the Stream Reactor CoAP source
connector in its Connect distribution (Dockerfile:43-52); its job is
exactly this: CoAP message payloads → Kafka records.

Public protocol: CoAP, RFC 7252 (IETF standard, public spec).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# message types (§3)
CON, NON, ACK, RST = 0, 1, 2, 3

# method / response codes: class.detail packed as (cls << 5) | detail (§3, §5.9)
GET, POST, PUT, DELETE = 0x01, 0x02, 0x03, 0x04
CREATED, DELETED, VALID, CHANGED, CONTENT = 0x41, 0x42, 0x43, 0x44, 0x45
NOT_FOUND = 0x84

# option numbers (§5.10)
OPT_OBSERVE = 6
OPT_URI_PATH = 11
OPT_CONTENT_FORMAT = 12
OPT_URI_QUERY = 15

PAYLOAD_MARKER = 0xFF


def code_str(code: int) -> str:
    """0x45 -> '2.05' (the dotted class.detail notation of §3)."""
    return f"{code >> 5}.{code & 0x1F:02d}"


@dataclass
class Message:
    type: int = CON
    code: int = GET
    message_id: int = 0
    token: bytes = b""
    #: (number, value) pairs; encode() sorts by number as §3.1 requires
    options: list[tuple[int, bytes]] = field(default_factory=list)
    payload: bytes = b""

    # convenience accessors for the connector-relevant options
    @property
    def uri_path(self) -> str:
        return "/".join(
            v.decode("utf-8") for n, v in self.options if n == OPT_URI_PATH
        )

    @property
    def content_format(self) -> int | None:
        for n, v in self.options:
            if n == OPT_CONTENT_FORMAT:
                return int.from_bytes(v, "big") if v else 0
        return None


def _ext(value: int) -> tuple[int, bytes]:
    """Option delta/length nibble + extended bytes (§3.1): 0-12 inline,
    13 => one extended byte (value-13), 14 => two bytes (value-269)."""
    if value < 0:
        raise ValueError(f"negative option delta/length: {value}")
    if value <= 12:
        return value, b""
    if value <= 268:
        return 13, bytes([value - 13])
    if value <= 65804:
        return 14, (value - 269).to_bytes(2, "big")
    raise ValueError(f"option delta/length too large: {value}")


def _read_ext(nibble: int, buf: bytes, pos: int) -> tuple[int, int]:
    if nibble <= 12:
        return nibble, pos
    if nibble == 13:
        return buf[pos] + 13, pos + 1
    if nibble == 14:
        return int.from_bytes(buf[pos : pos + 2], "big") + 269, pos + 2
    raise ValueError("option nibble 15 is reserved (payload marker misparse)")


def encode(m: Message) -> bytes:
    if not 0 <= m.message_id <= 0xFFFF:
        raise ValueError(f"message id out of range: {m.message_id}")
    if len(m.token) > 8:
        raise ValueError("token longer than 8 bytes (§3)")
    out = bytearray()
    out.append((1 << 6) | (m.type << 4) | len(m.token))  # version 1
    out.append(m.code)
    out += m.message_id.to_bytes(2, "big")
    out += m.token
    prev = 0
    for number, value in sorted(m.options, key=lambda o: o[0]):
        dn, dext = _ext(number - prev)
        ln, lext = _ext(len(value))
        out.append((dn << 4) | ln)
        out += dext + lext + value
        prev = number
    if m.payload:
        out.append(PAYLOAD_MARKER)
        out += m.payload
    return bytes(out)


def decode(buf: bytes) -> Message:
    if len(buf) < 4:
        raise ValueError("CoAP message shorter than the fixed header")
    ver = buf[0] >> 6
    if ver != 1:
        raise ValueError(f"unsupported CoAP version {ver}")
    tkl = buf[0] & 0x0F
    if tkl > 8:
        raise ValueError(f"token length {tkl} is reserved (§3)")
    m = Message(
        type=(buf[0] >> 4) & 0x03,
        code=buf[1],
        message_id=int.from_bytes(buf[2:4], "big"),
        token=buf[4 : 4 + tkl],
    )
    pos = 4 + tkl
    number = 0
    while pos < len(buf):
        b = buf[pos]
        if b == PAYLOAD_MARKER:
            if pos + 1 >= len(buf):
                raise ValueError("payload marker with zero-length payload (§3.1)")
            m.payload = buf[pos + 1 :]
            return m
        pos += 1
        delta, pos = _read_ext(b >> 4, buf, pos)
        length, pos = _read_ext(b & 0x0F, buf, pos)
        number += delta
        m.options.append((number, buf[pos : pos + length]))
        pos += length
    return m


def decode_messages_df(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Binary column of CoAP datagrams → one row per message:
    (coap_type, code, message_id, uri_path, content_format, payload).
    Arrow-batched ``mapInPandas`` — partition-preserving, no shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            types, codes, mids, paths, fmts, payloads = [], [], [], [], [], []
            for raw in pdf[value_col]:
                m = decode(bytes(raw))
                types.append(m.type)
                codes.append(code_str(m.code))
                mids.append(m.message_id)
                paths.append(m.uri_path)
                fmts.append(m.content_format)
                payloads.append(m.payload)
            yield pd.DataFrame(
                {
                    "coap_type": pd.Series(types, dtype="int32"),
                    "code": pd.Series(codes, dtype="object"),
                    "message_id": pd.Series(mids, dtype="int32"),
                    "uri_path": pd.Series(paths, dtype="object"),
                    "content_format": pd.Series(fmts, dtype="object"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return df.select(F.col(value_col)).mapInPandas(
        gen,
        schema=(
            "coap_type int, code string, message_id int, uri_path string,"
            " content_format int, payload binary"
        ),
    )
