"""Blockchain source — the last Stream Reactor connector family (S12)
at the protocol layer.

The reference ships the Stream Reactor Blockchain SOURCE connector in
its Connect distribution (Dockerfile:43-52); that connector subscribes
to ``wss://ws.blockchain.info/inv`` and turns each unconfirmed-
transaction push (``{"op": "utx", "x": {...}}``) into one Kafka record.
No live service (and no outbound network) exists in this container, so
— exactly like the MQTT / CoAP / STOMP / RESP families — the honest
testable surface is the wire:

* an RFC 6455 WebSocket frame codec (FIN/opcode bits, 7/16/64-bit
  payload lengths, client-side masking, continuation-frame reassembly,
  ping/pong/close control frames) — the part naive codecs get wrong;
* the blockchain.info subscription ops (``unconfirmed_sub``,
  ``addr_sub``, ``blocks_sub``) and their push messages (``utx``,
  ``block``);
* the transaction flattening the Stream Reactor source performs:
  one record per transaction keyed by tx hash, with input/output
  arrays and derived totals.

The Spark integration decodes a binary column of raw WebSocket bytes
into flat transaction rows via Arrow-batched ``mapInPandas`` — the
same plumbing shape as the Avro / MQTT / CoAP codecs, so a captured
socket stream (or a replayed capture file) scales out like any other
binary topic.

Public protocols only: RFC 6455 (IETF standard) and the public
blockchain.info WebSocket API message shapes.
"""

from __future__ import annotations

import json
import os
import struct
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# RFC 6455 §5.2 opcodes
OP_CONT, OP_TEXT, OP_BINARY = 0x0, 0x1, 0x2
OP_CLOSE, OP_PING, OP_PONG = 0x8, 0x9, 0xA


@dataclass
class WsFrame:
    opcode: int
    payload: bytes
    fin: bool = True
    masked: bool = False


def encode_frame(f: WsFrame, mask_key: bytes | None = None) -> bytes:
    """RFC 6455 §5.2 framing. Client→server frames MUST be masked
    (§5.1): pass ``masked=True`` (a 4-byte key is drawn from os.urandom
    unless given explicitly, which tests do for determinism)."""
    head = bytearray()
    head.append((0x80 if f.fin else 0x00) | (f.opcode & 0x0F))
    n = len(f.payload)
    mask_bit = 0x80 if f.masked else 0x00
    if n < 126:
        head.append(mask_bit | n)
    elif n < (1 << 16):
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if f.masked:
        key = mask_key if mask_key is not None else os.urandom(4)
        head += key
        body = bytes(b ^ key[i % 4] for i, b in enumerate(f.payload))
        return bytes(head) + body
    return bytes(head) + f.payload


def decode_stream(buf: bytes) -> tuple[list[WsFrame], bytes]:
    """Incremental RFC 6455 parser: returns (complete frames, unconsumed
    remainder). Handles 7/16/64-bit lengths and masked payloads; a
    partial frame (header or body) is left in the remainder untouched."""
    frames: list[WsFrame] = []
    pos = 0
    while True:
        if len(buf) - pos < 2:
            break
        b0, b1 = buf[pos], buf[pos + 1]
        fin, opcode = bool(b0 & 0x80), b0 & 0x0F
        masked, ln = bool(b1 & 0x80), b1 & 0x7F
        p = pos + 2
        if ln == 126:
            if len(buf) - p < 2:
                break
            ln = struct.unpack(">H", buf[p:p + 2])[0]
            p += 2
        elif ln == 127:
            if len(buf) - p < 8:
                break
            ln = struct.unpack(">Q", buf[p:p + 8])[0]
            p += 8
        key = b""
        if masked:
            if len(buf) - p < 4:
                break
            key = buf[p:p + 4]
            p += 4
        if len(buf) - p < ln:
            break
        payload = buf[p:p + ln]
        if masked:
            payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        frames.append(WsFrame(opcode=opcode, payload=payload, fin=fin,
                              masked=masked))
        pos = p + ln
    return frames, buf[pos:]


def reassemble_messages(frames: list[WsFrame]) -> list[tuple[int, bytes]]:
    """§5.4 fragmentation: a TEXT/BINARY frame with fin=0 is continued
    by CONT frames until one has fin=1. Control frames (§5.5) may be
    interleaved and are passed through as their own messages."""
    out: list[tuple[int, bytes]] = []
    cur_op: int | None = None
    cur = bytearray()
    for f in frames:
        if f.opcode in (OP_CLOSE, OP_PING, OP_PONG):
            out.append((f.opcode, f.payload))
            continue
        if f.opcode != OP_CONT:
            cur_op, cur = f.opcode, bytearray(f.payload)
        else:
            cur += f.payload
        if f.fin and cur_op is not None:
            out.append((cur_op, bytes(cur)))
            cur_op, cur = None, bytearray()
    return out


# -- blockchain.info subscription ops (public WebSocket API) --------------

def sub_unconfirmed() -> bytes:
    return encode_frame(WsFrame(OP_TEXT, b'{"op":"unconfirmed_sub"}',
                                masked=True, fin=True), mask_key=b"\0\0\0\0")


def sub_address(addr: str) -> bytes:
    msg = json.dumps({"op": "addr_sub", "addr": addr}).encode()
    return encode_frame(WsFrame(OP_TEXT, msg, masked=True, fin=True),
                        mask_key=b"\0\0\0\0")


def sub_blocks() -> bytes:
    return encode_frame(WsFrame(OP_TEXT, b'{"op":"blocks_sub"}',
                                masked=True, fin=True), mask_key=b"\0\0\0\0")


def ping() -> bytes:
    return encode_frame(WsFrame(OP_PING, b"", masked=True, fin=True),
                        mask_key=b"\0\0\0\0")


def flatten_tx(x: dict) -> dict:
    """One utx push → one flat record, the Stream Reactor source's
    output shape: tx identity + counts + derived satoshi totals +
    per-output (addr, value) pairs for downstream explode."""
    outputs = x.get("out", []) or []
    inputs = x.get("inputs", []) or []
    return {
        "tx_hash": x.get("hash"),
        "tx_time": int(x.get("time", 0)),
        "tx_index": int(x.get("tx_index", 0)),
        "vin_sz": len(inputs),
        "vout_sz": len(outputs),
        "relayed_by": x.get("relayed_by"),
        "total_out_satoshi": int(sum(int(o.get("value", 0)) for o in outputs)),
        "out_addrs": [o.get("addr") for o in outputs],
        "out_values": [int(o.get("value", 0)) for o in outputs],
    }


TX_SCHEMA = ("tx_hash string, tx_time long, tx_index long, vin_sz int, "
             "vout_sz int, relayed_by string, total_out_satoshi long, "
             "out_addrs array<string>, out_values array<long>")


def parse_push(opcode: int, payload: bytes) -> dict | None:
    """A reassembled TEXT message → the flat tx record, or None for
    non-utx ops (block pushes, status echoes, pongs)."""
    if opcode != OP_TEXT:
        return None
    try:
        msg = json.loads(payload)
    except ValueError:
        return None
    if msg.get("op") != "utx":
        return None
    return flatten_tx(msg.get("x", {}))


def decode_txs_df(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Binary column of raw WebSocket stream bytes (one captured socket
    chunk per row; chunks within a row are self-contained frame runs)
    → one row per unconfirmed transaction. Arrow-batched mapInPandas,
    partition-preserving: no shuffle, scales with the capture size."""
    src = df.select(F.col(value_col).alias("value"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["value"]:
                frames, _rest = decode_stream(bytes(raw))
                for opcode, payload in reassemble_messages(frames):
                    rec = parse_push(opcode, payload)
                    if rec is not None:
                        rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[c.split()[0] for c in TX_SCHEMA.split(", ")]
            )

    return src.mapInPandas(gen, schema=TX_SCHEMA)
