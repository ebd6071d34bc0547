"""Shared bounds-checked wire-format primitives for every hand-rolled
binary reader in the repo (Avro OCF/binary codec, Kafka segment files,
and the S12 connector codecs).

The contract (enforced fleet-wide by ``tests/test_codec_fuzz.py``):
a decoder fed arbitrary bytes must TERMINATE with a typed error from
the fuzz gate's ``OK_ERRORS`` set — never ``OverflowError`` (from
passing an attacker-controlled varint straight to ``BytesIO.read``),
never a hang (from a negative length rewinding the cursor into a
re-parse loop). Centralizing the two dangerous operations — varint
decode and length-prefixed reads — here keeps every codec on the same
validated path instead of drifting per file.

Both zigzag flavors in the repo share this encoding family (Avro spec
"binary encoding" / Kafka RecordBatch v2 varints); callers choose the
max width (10 bytes = 64-bit).
"""

from __future__ import annotations

import io

__all__ = [
    "zigzag_encode", "zigzag_decode", "take",
    "read_zigzag_io", "read_exact_io",
]


def zigzag_encode(n: int) -> bytes:
    """64-bit zigzag varint encode (Avro/Kafka shared encoding)."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(data, pos: int, max_bytes: int = 10) -> tuple[int, int]:
    """Decode a zigzag varint from ``data`` at ``pos`` → (value, pos').

    Truncated input raises ``IndexError`` (typed, cheap — no length
    pre-check in the hot path); an overlong varint (more than
    ``max_bytes`` continuation bytes, i.e. a value that cannot fit the
    wire type) raises ``ValueError`` instead of silently building an
    unbounded Python int.
    """
    shift = acc = 0
    stop = max_bytes * 7
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7
        if shift >= stop:
            raise ValueError(f"varint longer than {max_bytes} bytes")


def take(data, pos: int, n: int, what: str = "field") -> tuple[bytes, int]:
    """Bounds-checked slice read: ``data[pos:pos+n]`` after validating
    ``0 <= n <= len(data) - pos``. Negative lengths (cursor rewind →
    re-parse loops) and lengths past the buffer (silent short reads)
    both raise ``ValueError``."""
    if n < 0 or pos + n > len(data):
        raise ValueError(
            f"invalid {what} length {n} at offset {pos} "
            f"({len(data) - pos} bytes remain)"
        )
    return data[pos : pos + n], pos + n


def read_zigzag_io(buf: io.BytesIO, max_bytes: int = 10) -> int:
    """``zigzag_decode`` over a stream: truncation and overlong varints
    both raise ``ValueError``."""
    shift = acc = 0
    stop = max_bytes * 7
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return (acc >> 1) ^ -(acc & 1)
        shift += 7
        if shift >= stop:
            raise ValueError(f"varint longer than {max_bytes} bytes")


def read_exact_io(buf: io.BytesIO, n: int, what: str = "field") -> bytes:
    """Read exactly ``n`` bytes from a ``BytesIO`` after validating
    ``n`` against the bytes remaining — the safe replacement for the
    ``buf.read(attacker_controlled_varint)`` pattern, which raises
    ``OverflowError`` for lengths past ``Py_ssize_t`` and silently
    short-reads otherwise."""
    if n < 0:
        raise ValueError(f"negative {what} length {n}")
    remaining = len(buf.getbuffer()) - buf.tell()
    if n > remaining:
        raise ValueError(
            f"{what} length {n} exceeds remaining {remaining} bytes"
        )
    return buf.read(n)


def read_uvarint(data: bytes, pos: int = 0, max_bytes: int = 10) -> tuple[int, int]:
    """Plain (non-zigzag) little-endian base-128 varint → (value, next
    pos). The snappy preamble's length encoding; bounded like the
    zigzag reader so crafted streams can't spin it."""
    acc, shift = 0, 0
    stop = 7 * max_bytes
    for i in range(pos, min(len(data), pos + max_bytes)):
        b = data[i]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, i + 1
        shift += 7
        if shift >= stop:
            break
    raise ValueError("unterminated or oversized uvarint")
