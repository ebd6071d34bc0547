"""MQTT 3.1.1 frame codec — the Stream Reactor MQTT-connector family
(S12) at the protocol layer.

No broker exists in this container (same situation as Kafka itself), so
the honest testable surface is the wire protocol: fixed-header framing
with the varint remaining-length, CONNECT/CONNACK, PUBLISH (QoS 0/1),
PUBACK, SUBSCRIBE/SUBACK, PINGREQ/PINGRESP, DISCONNECT — encoded and
decoded byte-exactly, plus an INCREMENTAL parser that survives frames
split across arbitrary socket read boundaries (the part naive codecs
get wrong). The Spark integration turns PUBLISH frames carried in a
binary column into (topic, payload) records via Arrow-batched
mapInPandas — the same plumbing shape as the Avro codec — from where
``FileTopic.append`` gives them Kafka record semantics.

Reference framing: the reference ships the Stream Reactor MQTT source
connector in its Connect distribution (Dockerfile:43-52); its job is
exactly this: MQTT PUBLISH payloads → Kafka records.

Public protocol: MQTT 3.1.1 (OASIS standard, public spec).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# packet types (spec §2.2.1)
CONNECT, CONNACK, PUBLISH, PUBACK = 1, 2, 3, 4
SUBSCRIBE, SUBACK = 8, 9
PINGREQ, PINGRESP, DISCONNECT = 12, 13, 14


def _varint(n: int) -> bytes:
    """Remaining-length encoding (spec §2.2.3): 7 bits per byte, MSB
    continues; max 4 bytes (268 435 455)."""
    if n < 0 or n > 268_435_455:
        raise ValueError(f"remaining length out of range: {n}")
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int] | None:
    """(value, next_pos), or None if the buffer ends mid-varint."""
    mult, val = 1, 0
    for i in range(4):
        if pos + i >= len(buf):
            return None
        b = buf[pos + i]
        val += (b & 0x7F) * mult
        if not (b & 0x80):
            return val, pos + i + 1
        mult *= 128
    raise ValueError("malformed remaining length (>4 bytes)")


def _utf8(s: str) -> bytes:
    b = s.encode("utf-8")
    return len(b).to_bytes(2, "big") + b


def _read_utf8(body: bytes, pos: int) -> tuple[str, int]:
    n = int.from_bytes(body[pos : pos + 2], "big")
    return body[pos + 2 : pos + 2 + n].decode("utf-8"), pos + 2 + n


@dataclass
class Frame:
    type: int
    flags: int = 0
    # type-specific fields (only the ones each type uses are set)
    client_id: str = ""
    keepalive: int = 0
    clean_session: bool = True
    topic: str = ""
    payload: bytes = b""
    qos: int = 0
    retain: bool = False
    packet_id: int | None = None
    return_code: int = 0
    topics: list[tuple[str, int]] = field(default_factory=list)


def encode(f: Frame) -> bytes:
    if f.type == CONNECT:
        flags = 0x02 if f.clean_session else 0x00
        body = (
            _utf8("MQTT") + bytes([4, flags]) + f.keepalive.to_bytes(2, "big")
            + _utf8(f.client_id)
        )
        head = bytes([CONNECT << 4])
    elif f.type == CONNACK:
        body = bytes([0, f.return_code])
        head = bytes([CONNACK << 4])
    elif f.type == PUBLISH:
        if f.qos not in (0, 1):
            raise ValueError("only QoS 0/1 supported")
        body = _utf8(f.topic)
        if f.qos:
            if f.packet_id is None:
                raise ValueError("QoS 1 PUBLISH needs a packet id")
            body += f.packet_id.to_bytes(2, "big")
        body += f.payload
        head = bytes([(PUBLISH << 4) | (f.qos << 1) | (1 if f.retain else 0)])
    elif f.type == PUBACK:
        body = (f.packet_id or 0).to_bytes(2, "big")
        head = bytes([PUBACK << 4])
    elif f.type == SUBSCRIBE:
        body = (f.packet_id or 0).to_bytes(2, "big")
        for t, q in f.topics:
            body += _utf8(t) + bytes([q])
        head = bytes([(SUBSCRIBE << 4) | 0x02])  # reserved flags (spec §3.8.1)
    elif f.type == SUBACK:
        body = (f.packet_id or 0).to_bytes(2, "big") + bytes(
            q for _, q in f.topics
        )
        head = bytes([SUBACK << 4])
    elif f.type in (PINGREQ, PINGRESP, DISCONNECT):
        body = b""
        head = bytes([f.type << 4])
    else:
        raise ValueError(f"unsupported packet type {f.type}")
    return head + _varint(len(body)) + body


def decode_stream(buf: bytes) -> tuple[list[Frame], bytes]:
    """Parse every complete frame from ``buf``; return (frames, rest).

    Incremental: a frame split across reads stays in ``rest`` until the
    next chunk arrives — feed ``rest + next_chunk`` back in.
    """
    frames: list[Frame] = []
    pos = 0
    while pos < len(buf):
        head = buf[pos]
        vl = _read_varint(buf, pos + 1)
        if vl is None:
            break
        length, body_start = vl
        if body_start + length > len(buf):
            break
        body = buf[body_start : body_start + length]
        ptype, flags = head >> 4, head & 0x0F
        f = Frame(type=ptype, flags=flags)
        if ptype == CONNECT:
            proto, p = _read_utf8(body, 0)
            if proto != "MQTT" or body[p] != 4:
                raise ValueError(f"unsupported protocol {proto!r} level {body[p]}")
            f.clean_session = bool(body[p + 1] & 0x02)
            f.keepalive = int.from_bytes(body[p + 2 : p + 4], "big")
            f.client_id, _ = _read_utf8(body, p + 4)
        elif ptype == CONNACK:
            f.return_code = body[1]
        elif ptype == PUBLISH:
            f.qos = (flags >> 1) & 0x03
            f.retain = bool(flags & 0x01)
            f.topic, p = _read_utf8(body, 0)
            if f.qos:
                f.packet_id = int.from_bytes(body[p : p + 2], "big")
                p += 2
            f.payload = body[p:]
        elif ptype in (PUBACK, SUBACK, SUBSCRIBE):
            f.packet_id = int.from_bytes(body[0:2], "big")
            if ptype == SUBSCRIBE:
                p = 2
                while p < len(body):
                    t, p = _read_utf8(body, p)
                    f.topics.append((t, body[p]))
                    p += 1
            elif ptype == SUBACK:
                f.topics = [("", q) for q in body[2:]]
        # PINGREQ/PINGRESP/DISCONNECT carry nothing
        frames.append(f)
        pos = body_start + length
    return frames, buf[pos:]


def decode_publishes_df(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Binary column of MQTT byte streams → one row per PUBLISH:
    (mqtt_topic, qos, retain, payload). Arrow-batched; non-PUBLISH
    frames are control traffic and are dropped (the connector's job is
    payload extraction)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            topics, qoss, retains, payloads = [], [], [], []
            for raw in pdf[value_col]:
                frames, rest = decode_stream(bytes(raw))
                if rest:
                    raise ValueError(f"truncated MQTT stream: {len(rest)} trailing bytes")
                for fr in frames:
                    if fr.type == PUBLISH:
                        topics.append(fr.topic)
                        qoss.append(fr.qos)
                        retains.append(fr.retain)
                        payloads.append(fr.payload)
            yield pd.DataFrame(
                {
                    "mqtt_topic": pd.Series(topics, dtype="object"),
                    "qos": pd.Series(qoss, dtype="int32"),
                    "retain": pd.Series(retains, dtype="bool"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return df.select(F.col(value_col)).mapInPandas(
        gen, schema="mqtt_topic string, qos int, retain boolean, payload binary"
    )
