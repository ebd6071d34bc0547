"""Azure DocumentDB (Cosmos DB) sink shape — the Stream Reactor
DocumentDB-connector family (S12) re-expressed the Spark-idiomatic way.

The reference's Connect distribution ships the Stream Reactor DocumentDB
sink (Dockerfile:43-52): KCQL-mapped Kafka records become JSON documents
in a database/collection, with the KCQL PK as the document ``id`` and
UPSERT INTO mapping to the service's documented ``x-ms-documentdb-
is-upsert`` create option. No client exists in this container, so the
sink splits like the other document families:

- the EXPENSIVE part — rendering each record as a JSON document with
  the composite PK as ``id`` — runs distributed and JVM-side
  (one ``to_json`` per row, whole-stage codegen);
- documents batch per Spark partition into create-op payloads
  (``{"database", "collection", "is_upsert", "docs": [...]}``) bounded
  by ``max_batch``;
- the TRANSPORT is a pluggable callable; a real Cosmos REST/SDK
  ``create_item(..., upsert=...)`` loop is a drop-in.

Public interfaces: Azure Cosmos DB document API (public docs), KCQL
(``plans/kcql.py``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from kafka_stream_spark.streaming.rethink import render_docs


def create_commands(
    docs: list[str], database: str, collection: str, upsert: bool, max_batch: int
) -> list[str]:
    out = []
    for i in range(0, len(docs), max_batch):
        chunk = docs[i : i + max_batch]
        out.append(
            '{"database": %s, "collection": %s, "is_upsert": %s, "docs": [%s]}'
            % (
                json.dumps(database),
                json.dumps(collection),
                "true" if upsert else "false",
                ", ".join(chunk),
            )
        )
    return out


def documentdb_sink(
    stream: DataFrame,
    database: str,
    collection: str,
    pk_cols: list[str],
    transport,
    checkpoint: str,
    upsert: bool = False,
    max_batch: int = 100,
):
    """Streaming writer: render id-bearing JSON docs JVM-side (shared
    with the ReThinkDB family — both speak plain JSON documents keyed by
    ``id``), send batched create ops. Upsert replays are idempotent."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rendered = render_docs(batch_df, pk_cols)

        def send_partition(rows) -> None:
            docs = [r["doc"] for r in rows]
            for cmd in create_commands(docs, database, collection, upsert, max_batch):
                transport(cmd)

        rendered.foreachPartition(send_partition)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
