"""Elasticsearch sink shape (SURVEY.md §2.2 K3).

The reference ships Elasticsearch 2.4.1 jars for the Stream Reactor elastic
sink (`Dockerfile:48-52`) and its AIS schema even pre-formats a
`"lat,lon"` location string "for use with Elastic Search"
(`classAPositionReportSchema.json:42-46`). No ES client library exists in
this container, so the sink is split the Spark-idiomatic way:

- the EXPENSIVE part — rendering every record into ES bulk-API NDJSON
  (action line + document line) — runs distributed and JVM-side
  (``to_json`` over a struct; no Python per-row cost);
- the TRANSPORT — POSTing a partition's payload to ``/_bulk`` — is a
  pluggable callable each executor invokes per partition. The default
  file transport (used in tests) writes the exact bulk bodies to a
  directory; a real ``elasticsearch.Elasticsearch(...).bulk`` call is a
  drop-in replacement.

Scale: one transport call per partition per micro-batch (connection reuse
within a partition, bounded payloads via ``max_docs_per_call``); document
rendering scales with executors, never through the driver.
"""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def file_bulk_transport(directory: str):
    """Test/dev transport: write each bulk payload to a unique file."""

    def send(payload: str) -> None:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"bulk-{uuid.uuid4().hex}.ndjson")
        with open(path, "w", encoding="utf-8") as f:
            f.write(payload)

    return send


def bulk_actions(df: DataFrame, index: str, id_col: str | None) -> DataFrame:
    """Render rows to ES bulk-API line pairs, distributed + JVM-side."""
    doc_cols = [c for c in df.columns if c != "_action"]
    meta = (
        F.struct(F.col(id_col).cast("string").alias("_id"), F.lit(index).alias("_index"))
        if id_col
        else F.struct(F.lit(index).alias("_index"))
    )
    action = F.to_json(F.struct(meta.alias("index")))
    doc = F.to_json(F.struct(*[F.col(c) for c in doc_cols]))
    return df.select(F.concat_ws("\n", action, doc).alias("_action"))


def elastic_sink(
    stream: DataFrame,
    index: str,
    transport,
    id_col: str | None = None,
    max_docs_per_call: int = 1000,
) -> DataStreamWriter:
    """foreachBatch ES bulk sink: render distributed, send per partition."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        actions = bulk_actions(batch_df, index, id_col)

        def send_partition(rows) -> None:
            buf: list[str] = []
            for r in rows:
                buf.append(r["_action"])
                if len(buf) >= max_docs_per_call:
                    transport("\n".join(buf) + "\n")
                    buf = []
            if buf:
                transport("\n".join(buf) + "\n")

        actions.foreachPartition(send_partition)

    return stream.writeStream.foreachBatch(write_batch)


def with_es_location(df: DataFrame, lat_col: str, lon_col: str, out: str = "location") -> DataFrame:
    """The reference's ES geo-point prep: a ``"lat,lon"`` string column
    (classAPositionReportSchema.json:42-46)."""
    return df.withColumn(
        out, F.concat_ws(",", F.col(lat_col).cast("string"), F.col(lon_col).cast("string"))
    )
