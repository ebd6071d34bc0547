"""STOMP 1.2 frame codec + JMS-sink message shape — the Stream Reactor
JMS-connector family (S12) at the protocol layer.

The reference's Connect distribution ships the Stream Reactor JMS sink
(Dockerfile:43-52): KCQL-mapped records become messages on a JMS
destination. No broker (ActiveMQ et al.) exists in this container, so
— exactly like the Redis/CoAP/FTP families — the honest testable
surface is the wire protocol JMS brokers speak over TCP: STOMP 1.2
(public spec, stomp.github.io): frames of

    COMMAND\\n
    header:value\\n ...          (1.2 header escaping: \\n \\r \\c \\\\)
    \\n
    body NUL

with ``content-length`` framing for binary-safe bodies, an incremental
parser that survives frames split at arbitrary read boundaries (and
skips the heart-beat EOLs the spec allows between frames), and the
sink's message shape: each record → a ``SEND`` frame to the KCQL
target destination with the PK as ``JMSCorrelationID`` (the Stream
Reactor JMS sink's documented key mapping) and a JSON body rendered
JVM-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_ESC = {"\\": "\\\\", "\r": "\\r", "\n": "\\n", ":": "\\c"}
_UNESC = {"\\\\": "\\", "\\r": "\r", "\\n": "\n", "\\c": ":"}


def _escape_header(s: str) -> str:
    return "".join(_ESC.get(c, c) for c in s)


def _unescape_header(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\":
            if i + 1 >= len(s):
                raise ValueError("dangling escape in STOMP header")
            tok = s[i : i + 2]
            if tok not in _UNESC:
                raise ValueError(f"undefined STOMP escape: {tok!r}")
            out.append(_UNESC[tok])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def encode_frame(command: str, headers: dict[str, str], body: bytes = b"") -> bytes:
    """Frame → bytes. ``content-length`` is always emitted (the spec's
    binary-safe mode: bodies may contain NUL)."""
    out = [command.encode("utf-8"), b"\n"]
    for k, v in headers.items():
        out.append(_escape_header(str(k)).encode("utf-8"))
        out.append(b":")
        out.append(_escape_header(str(v)).encode("utf-8"))
        out.append(b"\n")
    out.append(b"content-length:" + str(len(body)).encode() + b"\n")
    out.append(b"\n")
    out.append(body)
    out.append(b"\x00")
    return b"".join(out)


def decode_stream(buf: bytes) -> tuple[list[tuple[str, dict, bytes]], bytes]:
    """Incremental parse: complete frames + unconsumed remainder.

    Handles frames split at ANY byte boundary (headers incomplete, body
    shorter than content-length, missing NUL) by returning the tail
    untouched; skips inter-frame EOLs (heart-beats, spec §Heart-beating).
    """
    frames = []
    pos = 0
    n = len(buf)
    while True:
        while pos < n and buf[pos : pos + 1] in (b"\n", b"\r"):
            pos += 1  # heart-beat EOLs between frames
        if pos >= n:
            return frames, b""
        # Spec (§Augmented BNF): EOL is LF or CRLF and parsers MUST accept
        # both, so the blank-line terminator may be "\n\n" or "\r\n\r\n"
        # (or a mix). Take whichever terminator starts earliest.
        lf_end = buf.find(b"\n\n", pos)
        crlf_end = buf.find(b"\r\n\r\n", pos)
        if crlf_end != -1 and (lf_end == -1 or crlf_end < lf_end):
            head_end, blank_len = crlf_end, 4
        else:
            head_end, blank_len = lf_end, 2
        if head_end == -1:
            return frames, buf[pos:]
        head = buf[pos:head_end].decode("utf-8")
        lines = head.split("\n")
        command = lines[0]
        if command.endswith("\r"):
            command = command[:-1]
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if line.endswith("\r"):
                line = line[:-1]
            k, sep, v = line.partition(":")
            if not sep:
                raise ValueError(f"malformed STOMP header line: {line!r}")
            k = _unescape_header(k)
            # spec: repeated headers keep the FIRST occurrence
            headers.setdefault(k, _unescape_header(v))
        body_start = head_end + blank_len
        if "content-length" in headers:
            clen = int(headers["content-length"])
            if body_start + clen + 1 > n:
                return frames, buf[pos:]
            body = buf[body_start : body_start + clen]
            if buf[body_start + clen : body_start + clen + 1] != b"\x00":
                raise ValueError("STOMP frame body not NUL-terminated")
            pos = body_start + clen + 1
        else:
            nul = buf.find(b"\x00", body_start)
            if nul == -1:
                return frames, buf[pos:]
            body = buf[body_start:nul]
            pos = nul + 1
        frames.append((command, headers, body))


def send_frames(
    df: DataFrame, destination: str, key_col: str, persistent: bool = True
) -> DataFrame:
    """Rows → (corr_id, headers-ready columns, body) for SEND frames.

    Body JSON renders JVM-side (``to_json`` over the full struct —
    whole-stage codegen, correct escaping); the per-partition transport
    loop only assembles already-rendered strings into wire frames."""
    cols = [c for c in df.columns]
    return df.select(
        F.col(key_col).cast("string").alias("corr_id"),
        F.lit(destination).alias("destination"),
        F.lit("persistent" if persistent else "non-persistent").alias("delivery"),
        F.to_json(F.struct(*cols)).alias("body"),
    )


def jms_sink(
    stream: DataFrame,
    destination: str,
    key_col: str,
    transport,
    checkpoint: str,
    persistent: bool = True,
):
    """Streaming JMS writer: render SEND-frame fields JVM-side, encode
    STOMP frames per partition, hand wire bytes to the transport (a
    real broker socket is a drop-in). At-least-once; consumers dedup on
    JMSCorrelationID, the Stream Reactor JMS sink's documented key."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rendered = send_frames(batch_df, destination, key_col, persistent)

        def send_partition(rows) -> None:
            buf = bytearray()
            for r in rows:
                buf += encode_frame(
                    "SEND",
                    {
                        "destination": r["destination"],
                        "JMSCorrelationID": r["corr_id"],
                        "persistent": r["delivery"],
                        "content-type": "application/json",
                    },
                    r["body"].encode("utf-8"),
                )
            if buf:
                transport(bytes(buf))

        rendered.foreachPartition(send_partition)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
