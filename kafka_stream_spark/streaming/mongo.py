"""MongoDB sink shape — the Stream Reactor MongoDB-connector family
(S12/K-sink) re-expressed the Spark-idiomatic way.

The reference's Connect distribution ships the Stream Reactor MongoDB
sink (Dockerfile:43-52): KCQL-mapped Kafka records become documents,
with INSERT INTO appending and UPSERT INTO replacing the document whose
``_id`` matches the KCQL PK. No Mongo driver exists in this container,
so the sink splits like ``cassandra.py``/``elastic.py``:

- the EXPENSIVE part — rendering every record into a MongoDB Extended
  JSON document (``$numberLong`` for 64-bit ints, ``$date`` for
  timestamps, everything JSON-escaped) — runs distributed and JVM-side
  via ``to_json`` over a re-typed struct (no Python per-row cost);
- documents are grouped into bulk-write command payloads per Spark
  partition (``insertMany`` for insert mode, ``replaceOne`` +
  ``upsert:true`` ops inside a ``bulkWrite`` for upsert mode — the
  MongoDB-documented idempotent replay shape), bounded by ``max_batch``;
- the TRANSPORT — posting one bulk command — is a pluggable callable
  invoked per Spark partition; the file transport used in tests writes
  the exact command JSON, a real ``pymongo`` bulk call is a drop-in.

Public interfaces: MongoDB Extended JSON v2 + bulkWrite (MongoDB public
docs), KCQL (Lenses' public connector language, ``plans/kcql.py``).
"""

from __future__ import annotations

import json
import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType


def file_bulk_transport(directory: str):
    """Test/dev transport: write each bulk command to a unique file."""

    def send(command_json: str) -> None:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"bulk-{uuid.uuid4().hex}.json")
        with open(path, "w", encoding="utf-8") as f:
            f.write(command_json)

    return send


def render_documents(df: DataFrame, pk_cols: list[str] | None = None) -> DataFrame:
    """Rows → (doc_id, doc) with one Extended-JSON document per row.

    Typed rendering is a projection swap before ONE ``to_json`` call
    (whole-stage codegen, correct escaping for free): 64-bit ints wrap
    as ``{"$numberLong": "n"}``, timestamps as ``{"$date": "ISO"}``.
    ``_id`` is the concatenated PK (the upsert filter key); without a PK
    the document ships without ``_id`` and Mongo assigns one.
    """
    if pk_cols:
        missing = [c for c in pk_cols if c not in df.columns]
        if missing:
            raise ValueError(f"PK columns not in frame: {missing}")
    fields = []
    for c in df.columns:
        t = df.schema[c].dataType
        if isinstance(t, LongType):
            fields.append(
                F.struct(F.col(c).cast("string").alias("$numberLong")).alias(c)
            )
        elif isinstance(t, (TimestampType, TimestampNTZType)):
            # TimestampType is an instant: render it in UTC before appending
            # the literal 'Z' designator (date_format alone uses the session
            # timezone — wrong $date values in any non-UTC session). NTZ has
            # no zone; its wall-clock fields are formatted as-is.
            ts = (
                F.to_utc_timestamp(F.col(c), F.expr("current_timezone()"))
                if isinstance(t, TimestampType)
                else F.col(c)
            )
            fields.append(
                F.struct(
                    F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("$date")
                ).alias(c)
            )
        else:
            fields.append(F.col(c).alias(c))
    doc_id = (
        F.concat_ws("|", *[F.col(c).cast("string") for c in pk_cols])
        if pk_cols
        else F.lit(None).cast("string")
    )
    return df.select(
        doc_id.alias("doc_id"),
        F.to_json(F.struct(*fields)).alias("doc"),
    )


def bulk_commands(
    docs: list[tuple[str | None, str]],
    database: str,
    collection: str,
    upsert: bool,
    max_batch: int,
) -> list[str]:
    """Rendered (doc_id, doc) rows → bulk command JSON payloads.

    Insert mode emits ``insertMany`` documents arrays; upsert mode emits
    ``bulkWrite`` op lists of ``replaceOne {filter: {_id}, upsert}`` —
    idempotent under at-least-once replay. Documents are already JSON
    strings, so payloads assemble by pure string joins (no reparse).
    """
    out = []
    for i in range(0, len(docs), max_batch):
        chunk = docs[i : i + max_batch]
        if upsert:
            ops = ",".join(
                '{"replaceOne":{"filter":{"_id":%s},"replacement":%s,"upsert":true}}'
                % (json.dumps(doc_id), doc)
                for doc_id, doc in chunk
            )
            out.append(
                '{"bulkWrite":"%s.%s","ops":[%s]}' % (database, collection, ops)
            )
        else:
            out.append(
                '{"insertMany":"%s.%s","documents":[%s]}'
                % (database, collection, ",".join(doc for _, doc in chunk))
            )
    return out


def mongo_sink(
    stream: DataFrame,
    database: str,
    collection: str,
    pk_cols: list[str] | None,
    transport,
    checkpoint: str,
    upsert: bool = False,
    max_batch: int = 100,
):
    """Streaming writer: render Extended-JSON docs JVM-side, then per
    Spark partition assemble bulk commands and send through the
    transport. Upsert co-locates each ``_id``'s ops in one partition so
    replays of the same key never race across tasks."""
    if upsert and not pk_cols:
        raise ValueError("upsert mode needs PK columns (the _id filter)")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rendered = render_documents(batch_df, pk_cols)
        if upsert:
            rendered = rendered.repartition("doc_id")

        def send_partition(rows) -> None:
            docs = [(r["doc_id"], r["doc"]) for r in rows]
            for cmd in bulk_commands(docs, database, collection, upsert, max_batch):
                transport(cmd)

        rendered.foreachPartition(send_partition)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
