"""Avro Object Container Files (OCF) — the on-disk format the
reference's Camus jobs actually write when draining topics to HDFS
(``binaries/camus-run``; SURVEY.md S11). The repo's ``export_parquet``
is the engine-native analog; this module adds the wire-true format so
an existing Camus consumer reads the engine's exports unchanged.

Public spec: the Avro 1.x specification, "Object Container Files"
section — magic ``Obj\\x01``, a file-metadata map carrying
``avro.schema``/``avro.codec``, a 16-byte sync marker, then blocks of
``(count, byte-size, payload, sync)``. The FULL spec codec set:
``null``, ``deflate`` (raw RFC-1951, stdlib zlib), ``snappy`` (snappy
block + 4-byte big-endian CRC32 of the uncompressed data, pyarrow's
bundled snappy), ``bzip2`` (stdlib bz2), ``xz`` (stdlib lzma, .xz
container) and ``zstandard`` (zstd frames, pyarrow's streaming
codec). Per-record encode/decode
rides the repo's compiled pure-Python codec (``avro_codec``), so the
whole path stays Arrow/stdlib-only.

Distributed shape: ``export_topic_ocf`` writes ONE container file per
topic partition from the executors (``foreachPartition``; a shared
filesystem is assumed at cluster scale, exactly as Camus assumed
HDFS) — no driver collect, no shuffle beyond the repartition to the
topic's own partitioning.
"""

from __future__ import annotations

import bz2
import io
import json
import lzma
import os
import zlib

from pyspark.sql import DataFrame

from kafka_stream_spark.functions import avro_codec
from kafka_stream_spark.functions.wire import (
    read_exact_io, read_uvarint, read_zigzag_io, zigzag_encode as _zigzag)

MAGIC = b"Obj\x01"

_CODECS = ("null", "deflate", "snappy", "bzip2", "xz", "zstandard")


def _zstd_compress(raw: bytes) -> bytes:
    import pyarrow as pa

    sink = pa.BufferOutputStream()
    with pa.CompressedOutputStream(sink, "zstd") as f:
        f.write(raw)
    return sink.getvalue().to_pybytes()


def _zstd_decompress(comp: bytes) -> bytes:
    import pyarrow as pa

    # zstd frames are streamable — no explicit size needed (unlike the
    # snappy path, whose raw format needs the preamble varint)
    return pa.CompressedInputStream(pa.BufferReader(comp), "zstd").read()


def _snappy_compress(raw: bytes) -> bytes:
    import pyarrow as pa

    body = pa.compress(raw, codec="snappy", asbytes=True)
    return body + (zlib.crc32(raw) & 0xFFFFFFFF).to_bytes(4, "big")


def _snappy_uncompressed_size(comp: bytes) -> int:
    """Raw snappy streams lead with the uncompressed length as a plain
    varint — pyarrow.decompress needs it passed explicitly."""
    try:
        size, _ = read_uvarint(comp, 0)
    except ValueError as e:
        raise ValueError(f"corrupt snappy preamble in OCF block: {e}") from e
    return size


def _snappy_decompress(payload: bytes) -> bytes:
    import pyarrow as pa

    if len(payload) < 5:
        raise ValueError("OCF snappy block too short for CRC framing")
    comp, crc = payload[:-4], payload[-4:]
    n = _snappy_uncompressed_size(comp)
    if n > max(1, len(payload)) * 200:  # snappy max ratio is well under this
        raise ValueError("OCF snappy block length implausible")
    raw = pa.decompress(comp, decompressed_size=n, codec="snappy", asbytes=True)
    if (zlib.crc32(raw) & 0xFFFFFFFF).to_bytes(4, "big") != crc:
        raise ValueError("OCF snappy block CRC mismatch")
    return raw

_read_long = read_zigzag_io  # Avro long = 64-bit zigzag varint, ≤10 bytes


def _write_meta(meta: dict[str, bytes]) -> bytes:
    out = bytearray(_zigzag(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag(len(kb)) + kb + _zigzag(len(v)) + v
    out += _zigzag(0)
    return bytes(out)


def _read_meta(buf: io.BytesIO) -> dict[str, bytes]:
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            return meta
        if n < 0:  # negative block count carries a byte size after it
            _read_long(buf)
            n = -n
        # a map block can't hold more entries than bytes remaining
        if n > len(buf.getbuffer()) - buf.tell():
            raise ValueError(f"OCF metadata block count {n} out of range")
        for _ in range(n):
            k = read_exact_io(buf, _read_long(buf), "OCF meta key").decode()
            meta[k] = read_exact_io(buf, _read_long(buf), "OCF meta value")


def write_ocf(records: list[dict], schema: dict, codec: str = "null",
              sync: bytes | None = None, block_size: int = 1000) -> bytes:
    """Records → one container file's bytes. ``sync`` defaults to a
    deterministic marker derived from the schema (the spec only asks
    for 16 bytes consistent within the file; determinism keeps
    byte-exact tests honest)."""
    if codec not in _CODECS:
        raise NotImplementedError(f"OCF codec {codec!r}")
    schema_json = json.dumps(schema).encode()
    if sync is None:
        sync = zlib.crc32(schema_json).to_bytes(4, "big") * 4
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out = bytearray(MAGIC)
    out += _write_meta({
        "avro.schema": schema_json,
        "avro.codec": codec.encode(),
    })
    out += sync
    for i in range(0, len(records), block_size):
        block = records[i : i + block_size]
        payload = b"".join(
            avro_codec.encode_record(r, schema) for r in block
        )
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw RFC-1951 stream
        elif codec == "snappy":
            payload = _snappy_compress(payload)
        elif codec == "bzip2":
            payload = bz2.compress(payload)
        elif codec == "xz":
            payload = lzma.compress(payload, format=lzma.FORMAT_XZ)
        elif codec == "zstandard":
            payload = _zstd_compress(payload)
        out += _zigzag(len(block)) + _zigzag(len(payload)) + payload + sync
    return bytes(out)


def read_ocf(data: bytes) -> tuple[dict, list[dict]]:
    """Container bytes → (writer schema, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = _read_meta(buf)
    schema = json.loads(meta["avro.schema"])
    codec = (meta.get("avro.codec") or b"null").decode()
    if codec not in _CODECS:
        raise NotImplementedError(f"OCF codec {codec!r}")
    sync = read_exact_io(buf, 16, "OCF sync marker")
    dec = avro_codec.compile_decoder(schema)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        payload = read_exact_io(buf, size, "OCF block")
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec == "snappy":
            payload = _snappy_decompress(payload)
        elif codec == "bzip2":
            payload = bz2.decompress(payload)
        elif codec == "xz":
            payload = lzma.decompress(payload, format=lzma.FORMAT_XZ)
        elif codec == "zstandard":
            payload = _zstd_decompress(payload)
        # records are ≥1 byte each for any non-degenerate schema; a
        # count past the decompressed payload is corrupt framing, not
        # data — reject before the decode loop can spin on it
        if n < 0 or n > max(1, len(payload)):
            raise ValueError(f"OCF block record count {n} out of range")
        pos = 0
        for _ in range(n):
            rec, pos = dec(payload, pos)
            records.append(rec)
        if pos != len(payload):
            raise ValueError("OCF block length mismatch")
        if buf.read(16) != sync:
            raise ValueError("OCF sync marker mismatch")
    return schema, records


def export_topic_ocf(topic_df: DataFrame, schema: dict, out_dir: str,
                     codec: str = "deflate") -> int:
    """Camus-true export: drain a (batch) topic frame into one ``.avro``
    container file per topic partition, records as
    ``{key: bytes|null, value: bytes}`` under the given writer schema's
    field mapping — callers pass a schema matching their decoded value
    shape and a ``prepare`` projection upstream if needed. Executor-side
    writes (foreachPartition): nothing is collected to the driver.
    Returns the number of partitions exported."""
    os.makedirs(out_dir, exist_ok=True)
    parts = [r.partition for r in
             topic_df.select("partition").distinct().collect()]

    def write_partition(rows) -> None:
        by_part: dict[int, list[dict]] = {}
        for r in rows:
            by_part.setdefault(int(r.partition), []).append({
                "key": bytes(r.key) if r.key is not None else None,
                "value": bytes(r.value),
                "offset": int(r.offset),
            })
        for p, recs in by_part.items():
            recs.sort(key=lambda d: d["offset"])
            blob = write_ocf(recs, schema, codec=codec)
            with open(os.path.join(out_dir, f"partition-{p}.avro"),
                      "wb") as f:
                f.write(blob)

    (topic_df.select("key", "value", "partition", "offset")
     .repartition("partition")
     .foreachPartition(write_partition))
    return len(parts)


#: the export record schema (Camus wrote the raw topic payload; offset
#: kept for ordering audits)
TOPIC_EXPORT_SCHEMA = {
    "type": "record",
    "name": "TopicRecord",
    "fields": [
        {"name": "key", "type": ["null", "bytes"]},
        {"name": "value", "type": "bytes"},
        {"name": "offset", "type": "long"},
    ],
}


def ocf_to_df(spark, path: str, schema: dict | None = None):
    """Distributed OCF ingestion: Spark's binaryFile source lists and
    reads the container files (one task per file — Camus dumps are
    per-partition files, so parallelism matches the original topic),
    and an Arrow-batched mapInPandas decodes blocks executor-side.
    Output columns follow the writer schema's fields; pass ``schema``
    as a READER schema to get Avro evolution semantics across
    mixed-version dumps (the ``decode_df_evolving`` convention): fields
    the writer lacks take the reader default (or null for [null,T]
    unions), writer-only fields drop, and a reader field with neither
    writer value nor default raises — the spec's resolution error."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def gen(batches):
        reader = schema or TOPIC_EXPORT_SCHEMA
        names = [f["name"] for f in reader["fields"]]
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                wschema, recs = read_ocf(bytes(blob))
                wnames = {f["name"] for f in wschema["fields"]}
                fill = {}
                for f in reader["fields"]:
                    if f["name"] in wnames:
                        continue
                    if "default" in f:
                        fill[f["name"]] = f["default"]
                    elif isinstance(f["type"], list) and "null" in f["type"]:
                        fill[f["name"]] = None
                    else:
                        raise ValueError(
                            f"OCF resolution: reader field {f['name']!r} "
                            f"missing from writer {wschema.get('name')!r} "
                            "and has no default"
                        )
                for r in recs:
                    rows.append({n: r.get(n, fill.get(n)) for n in names})
            yield pd.DataFrame(rows, columns=names)

    ddl = ", ".join(
        f"{f['name']} {_avro_to_ddl(f['type'])}"
        for f in (schema or TOPIC_EXPORT_SCHEMA)["fields"]
    )
    return files.mapInPandas(gen, schema=ddl)


def _avro_to_ddl(t) -> str:
    """Minimal Avro→Spark DDL type mapping for the flat export shapes."""
    if isinstance(t, list):  # ["null", T]
        inner = [x for x in t if x != "null"]
        return _avro_to_ddl(inner[0])
    return {
        "string": "string", "bytes": "binary", "long": "long",
        "int": "int", "double": "double", "float": "float",
        "boolean": "boolean",
    }[t]
