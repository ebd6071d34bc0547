"""FTP (RFC 959) control-protocol codec + directory-monitor logic — the
Stream Reactor FTP-connector family (S12) at the protocol layer.

Like the MQTT/CoAP families, no FTP server exists in this container, so
the honest testable surface is (a) the control-channel wire format —
command encoding, single- and MULTI-LINE reply parsing (the ``123-``
continuation form naive parsers break on), PASV/EPSV data-port replies,
MLSD fact lines (RFC 3659) — and (b) the monitor semantics the Stream
Reactor FTP source defines: each poll diffs the remote listing against
per-path (size, mtime) state and emits either the whole file ("update"
mode) or only the appended suffix ("tail" mode). The Spark integration
turns monitored-file records carried in a binary column into rows via
Arrow-batched ``mapInPandas``.

Reference framing: the reference ships the Stream Reactor FTP source in
its Connect distribution (Dockerfile:43-52); its job is exactly this:
poll FTP directories → Kafka records.

Public protocols: FTP RFC 959, MLSx RFC 3659 (IETF standards).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_CRLF = "\r\n"


def encode_command(verb: str, *args: str) -> bytes:
    """``CWD /data`` → ``b"CWD /data\\r\\n"`` (§4.1; args space-joined)."""
    if any("\r" in a or "\n" in a for a in (verb, *args)):
        raise ValueError("CR/LF inside an FTP command (injection)")
    line = " ".join((verb.upper(), *args)).strip()
    return (line + _CRLF).encode("latin-1")


@dataclass
class Reply:
    code: int
    lines: list[str] = field(default_factory=list)

    @property
    def text(self) -> str:
        return "\n".join(self.lines)


def decode_replies(buf: bytes) -> tuple[list[Reply], bytes]:
    """Parse complete control-channel replies; return (replies, rest).

    Handles the multi-line form (§4.2): ``123-First line`` opens a reply
    that runs until a line starting ``123 `` (same code, space). A reply
    split across reads stays in ``rest`` — feed ``rest + chunk`` back in.
    """
    replies: list[Reply] = []
    pos = 0
    text = buf.decode("latin-1")
    while True:
        nl = text.find(_CRLF, pos)
        if nl < 0:
            break
        first = text[pos:nl]
        m = re.match(r"^(\d{3})([ -])(.*)$", first)
        if not m:
            raise ValueError(f"malformed FTP reply line: {first!r}")
        code, sep = int(m.group(1)), m.group(2)
        lines = [m.group(3)]
        end = nl + 2
        if sep == "-":  # multi-line: scan for the terminator line
            closed = False
            scan = end
            while True:
                nl2 = text.find(_CRLF, scan)
                if nl2 < 0:
                    break
                line = text[scan:nl2]
                scan = nl2 + 2
                if re.match(rf"^{code} ", line):
                    lines.append(line[4:])
                    end = scan
                    closed = True
                    break
                lines.append(line)
            if not closed:
                break  # terminator not arrived yet — keep buffering
        replies.append(Reply(code, lines))
        pos = end
    return replies, buf[pos:]


def parse_pasv(reply: Reply) -> tuple[str, int]:
    """227 Entering Passive Mode (h1,h2,h3,h4,p1,p2) → (ip, port)."""
    if reply.code != 227:
        raise ValueError(f"not a PASV reply: {reply.code}")
    m = re.search(r"(\d+),(\d+),(\d+),(\d+),(\d+),(\d+)", reply.text)
    if not m:
        raise ValueError(f"no host/port tuple in: {reply.text!r}")
    h = m.groups()
    return ".".join(h[:4]), int(h[4]) * 256 + int(h[5])


def parse_epsv(reply: Reply) -> int:
    """229 Extended Passive Mode (|||port|) → port (RFC 2428)."""
    if reply.code != 229:
        raise ValueError(f"not an EPSV reply: {reply.code}")
    m = re.search(r"\(([^\d\s])\1\1(\d+)\1\)", reply.text)
    if not m:
        raise ValueError(f"no port in: {reply.text!r}")
    return int(m.group(2))


def parse_mlsd_line(line: str) -> dict:
    """``type=file;size=432;modify=20260301120000; data.csv`` → facts dict
    + ``name`` (RFC 3659 §7.2: facts are ``key=value;`` then SPACE name)."""
    facts_part, _, name = line.partition(" ")
    if not name:
        raise ValueError(f"malformed MLSD line (no name): {line!r}")
    out: dict = {"name": name}
    for fact in facts_part.split(";"):
        if fact:
            k, _, v = fact.partition("=")
            out[k.lower()] = v
    if "size" in out:
        out["size"] = int(out["size"])
    return out


# --- monitor semantics (the Stream Reactor FTP source state machine) -----

#: "update" emits the whole body on any change; "tail" emits only the
#: appended suffix when a file grew (re-emitting all on truncate/rewrite)
MODES = ("update", "tail")


def poll_monitor(
    state: dict[str, tuple[int, str]],
    listing: list[dict],
    fetch,
    mode: str = "update",
) -> list[dict]:
    """One poll round: diff ``listing`` (MLSD fact dicts) against
    ``state`` {name: (size, modify)}, call ``fetch(name, offset)`` for
    changed files, mutate state, and return emitted records
    ``{name, offset, body}``. Pure logic — testable without a server,
    identical contract to the connector's per-poll behaviour."""
    if mode not in MODES:
        raise ValueError(f"unknown monitor mode: {mode}")
    out: list[dict] = []
    for entry in listing:
        if entry.get("type", "file") != "file":
            continue
        name, size, modify = entry["name"], entry["size"], entry.get("modify", "")
        prev = state.get(name)
        if prev == (size, modify):
            continue
        if mode == "tail" and prev is not None and size > prev[0]:
            offset = prev[0]  # grew: fetch only the appended suffix
        else:
            offset = 0
        out.append({"name": name, "offset": offset, "body": fetch(name, offset)})
        state[name] = (size, modify)
    return out


def monitored_records_df(df: DataFrame, value_col: str = "body") -> DataFrame:
    """(name, offset, body) records → one row per non-empty line with its
    byte offset — the connector's line-per-record framing. Arrow-batched,
    partition-preserving."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, offsets, texts = [], [], []
            for name, base, raw in zip(pdf["name"], pdf["offset"], pdf[value_col]):
                at = int(base)
                for line in bytes(raw).split(b"\n"):
                    # CRLF files: strip the carriage return from the
                    # record text; byte offsets still count raw bytes
                    body = line[:-1] if line.endswith(b"\r") else line
                    if body:
                        names.append(name)
                        offsets.append(at)
                        texts.append(body.decode("utf-8", "replace"))
                    at += len(line) + 1
            yield pd.DataFrame(
                {
                    "file_name": pd.Series(names, dtype="object"),
                    "byte_offset": pd.Series(offsets, dtype="int64"),
                    "line": pd.Series(texts, dtype="object"),
                }
            )

    return df.select("name", "offset", F.col(value_col)).mapInPandas(
        gen, schema="file_name string, byte_offset long, line string"
    )
