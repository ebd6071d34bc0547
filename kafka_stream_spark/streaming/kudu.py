"""Kudu sink shape — the Stream Reactor Kudu-connector family (S12)
re-expressed the Spark-idiomatic way.

The reference's Connect distribution ships the Stream Reactor Kudu sink
(Dockerfile:43-52): KCQL-mapped Kafka records become Kudu row
operations, with ``DISTRIBUTEBY a,b INTO n BUCKETS`` declaring the
table's hash partitioning (the Stream Reactor Kudu KCQL extension) and
UPSERT vs INSERT selecting the Kudu operation type. No Kudu client
exists in this container, so the sink splits like ``cassandra.py``:

- the EXPENSIVE part — rendering every record into a fully-bound
  Impala-dialect statement (``UPSERT INTO tbl (...) VALUES (...)``, the
  public SQL surface over Kudu tables) — runs distributed and JVM-side;
- rows are routed to their Kudu HASH BUCKET (``pmod(hash(distribute
  cols), n_buckets)`` — murmur-alike routing mirroring Kudu's hash
  partitioning) so one transport call only carries statements for one
  tablet bucket, batched JDBC-style by ``max_batch``;
- the TRANSPORT — executing one statement batch — is a pluggable
  callable per bucket group; a real Impala JDBC ``executeBatch`` or
  Kudu client session is a drop-in.

Public interfaces: Impala/Kudu SQL (Apache public docs), KCQL
(``plans/kcql.py``).
"""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from kafka_stream_spark.streaming.cassandra import _literal


def file_sql_transport(directory: str, suffix: str = "sql"):
    """Test/dev transport: write each statement batch to a unique file."""

    def send(batch_sql: str) -> None:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"batch-{uuid.uuid4().hex}.{suffix}")
        with open(path, "w", encoding="utf-8") as f:
            f.write(batch_sql)

    return send


def render_row_ops(
    df: DataFrame,
    table: str,
    pk_cols: list[str],
    upsert: bool,
    distribute_cols: list[str] | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """Rows → (bucket, sql): one fully-bound UPSERT/INSERT per row plus
    its hash-bucket id. Rendering is pure column expressions (whole-stage
    codegen); bucket routing mirrors Kudu's HASH(cols) PARTITIONS n."""
    missing = [c for c in pk_cols if c not in df.columns]
    if missing:
        raise ValueError(f"PK columns not in frame: {missing}")
    cols = df.columns
    verb = "UPSERT" if upsert else "INSERT"
    stmt = F.concat(
        F.lit(f"{verb} INTO {table} ({', '.join(cols)}) VALUES ("),
        F.concat_ws(", ", *[_literal(df, c, ts_style="utc_naive") for c in cols]),
        F.lit(");"),
    )
    dcols = distribute_cols or pk_cols
    n = buckets or 1
    bucket = F.pmod(F.hash(*[F.col(c) for c in dcols]), F.lit(n))
    return df.select(bucket.alias("bucket"), stmt.alias("sql"))


def kudu_sink(
    stream: DataFrame,
    table: str,
    pk_cols: list[str],
    transport,
    checkpoint: str,
    upsert: bool = True,
    distribute_cols: list[str] | None = None,
    buckets: int | None = None,
    max_batch: int = 100,
):
    """Streaming writer: render row ops JVM-side, co-locate each hash
    bucket's statements in one Spark partition, send ≤max_batch-sized
    batches per bucket. At-least-once; UPSERT replays are idempotent
    (INSERT replays surface as Kudu 'already present' row errors, the
    connector's documented at-least-once posture)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rendered = render_row_ops(
            batch_df, table, pk_cols, upsert, distribute_cols, buckets
        )
        rendered = rendered.repartition("bucket")

        def send_partition(rows) -> None:
            by_bucket: dict[int, list[str]] = {}
            for r in rows:
                by_bucket.setdefault(r["bucket"], []).append(r["sql"])
            for stmts in by_bucket.values():
                for i in range(0, len(stmts), max_batch):
                    transport("\n".join(stmts[i : i + max_batch]))

        rendered.foreachPartition(send_partition)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
