"""ReThinkDB sink shape — the Stream Reactor ReThinkDB-connector family
(S12) re-expressed the Spark-idiomatic way.

The reference's Connect distribution ships the Stream Reactor ReThinkDB
sink (Dockerfile:43-52): KCQL-mapped Kafka records become ReQL
``table.insert`` operations, with the KCQL write mode selecting the
documented conflict policy — INSERT → ``conflict="error"``, UPSERT →
``conflict="replace"`` (the Stream Reactor mapping of ReThinkDB's
public insert options). No ReThinkDB driver exists in this container,
so the sink splits like ``mongo.py``:

- the EXPENSIVE part — rendering each record as a JSON document with
  the composite KCQL PK as ReThinkDB's ``id`` field — runs distributed
  and JVM-side (one ``to_json`` over a re-typed struct);
- documents batch per Spark partition into insert-op payloads
  (``{"db", "table", "conflict", "docs": [...]}``) bounded by
  ``max_batch`` — the shape a ``r.db(d).table(t).insert(docs,
  conflict=...)`` call consumes verbatim;
- the TRANSPORT is a pluggable callable; a real ``rethinkdb`` client
  run loop is a drop-in.

Public interfaces: ReQL insert semantics (rethinkdb.com public docs),
KCQL (``plans/kcql.py``).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def render_docs(df: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Rows → (doc): JSON documents with the composite PK as ``id``."""
    missing = [c for c in pk_cols if c not in df.columns]
    if missing:
        raise ValueError(f"PK columns not in frame: {missing}")
    doc_id = F.concat_ws("|", *[F.col(c).cast("string") for c in pk_cols])
    fields = [doc_id.alias("id")] + [F.col(c) for c in df.columns]
    return df.select(F.to_json(F.struct(*fields)).alias("doc"))


def insert_commands(
    docs: list[str], db: str, table: str, conflict: str, max_batch: int
) -> list[str]:
    """Rendered docs → ReQL insert-op JSON payloads of ≤max_batch docs."""
    out = []
    for i in range(0, len(docs), max_batch):
        chunk = docs[i : i + max_batch]
        out.append(
            '{"db": %s, "table": %s, "conflict": %s, "docs": [%s]}'
            % (
                json.dumps(db),
                json.dumps(table),
                json.dumps(conflict),
                ", ".join(chunk),
            )
        )
    return out


def rethink_sink(
    stream: DataFrame,
    db: str,
    table: str,
    pk_cols: list[str],
    transport,
    checkpoint: str,
    upsert: bool = False,
    max_batch: int = 100,
):
    """Streaming writer: render docs JVM-side, send batched insert ops.
    UPSERT (conflict=replace) is replay-idempotent; INSERT replays
    surface as ReThinkDB duplicate-primary-key errors, the connector's
    documented at-least-once posture."""
    conflict = "replace" if upsert else "error"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rendered = render_docs(batch_df, pk_cols)

        def send_partition(rows) -> None:
            docs = [r["doc"] for r in rows]
            for cmd in insert_commands(docs, db, table, conflict, max_batch):
                transport(cmd)

        rendered.foreachPartition(send_partition)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
