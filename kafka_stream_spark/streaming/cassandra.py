"""Cassandra sink shape — the Stream Reactor Cassandra-connector family
(S12/K-sink) re-expressed the Spark-idiomatic way.

The reference's Connect distribution ships the Stream Reactor Cassandra
sink (Dockerfile:43-52): KCQL-mapped Kafka records become CQL INSERTs.
No Cassandra driver exists in this container, so the sink splits like
``elastic.py``:

- the EXPENSIVE part — rendering every record into a fully-bound CQL
  ``INSERT`` statement with correctly escaped literals — runs
  distributed and JVM-side (``format_string``/``concat`` over columns;
  no Python per-row cost);
- statements for the same PARTITION KEY are grouped into ``UNLOGGED
  BATCH`` blocks (the Cassandra best practice: single-partition batches
  are atomic and cheap, multi-partition batches are the documented
  anti-pattern — so grouping is BY partition key, bounded by
  ``max_batch``);
- the TRANSPORT — executing a batch — is a pluggable callable invoked
  per Spark partition; the file transport used in tests writes the
  exact CQL bodies, a real ``cassandra.cluster.Session.execute`` is a
  drop-in replacement.

Public interfaces: CQL 3 (DataStax/Apache Cassandra public docs), KCQL
(Lenses' public connector query language, parsed by ``plans/kcql.py``).
"""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import BooleanType, NumericType, TimestampType, TimestampNTZType


def file_cql_transport(directory: str):
    """Test/dev transport: write each executed batch to a unique file."""

    def send(batch_cql: str) -> None:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"batch-{uuid.uuid4().hex}.cql")
        with open(path, "w", encoding="utf-8") as f:
            f.write(batch_cql)

    return send


def _literal(df: DataFrame, col: str, ts_style: str = "cql"):
    """Render a column as a SQL literal, JVM-side: numbers/booleans bare,
    timestamps instant-preserving (see below), strings quoted with ''
    escaping.

    ``ts_style`` picks the dialect's timestamp literal:
    - ``"cql"``: ``'…T….SSS+0000'`` — a zoneless CQL literal is read in
      the COORDINATOR's timezone, so the zone must be explicit;
    - ``"utc_naive"``: ``'yyyy-MM-dd HH:mm:ss.SSS'`` in UTC digits with
      no suffix — Impala/Kudu and VoltDB TIMESTAMPs carry no zone and
      store UTC by convention, and neither parser accepts ``+0000``.
    Both convert the instant to UTC first; plain date_format would
    render session-TZ wall-clock (the Mongo $date sink's bug class).
    """
    t = df.schema[col].dataType
    if isinstance(t, (NumericType, BooleanType)):
        return F.col(col).cast("string")
    if isinstance(t, TimestampType):
        utc = F.to_utc_timestamp(F.col(col), F.expr("current_timezone()"))
        if ts_style == "cql":
            return F.concat(
                F.lit("'"),
                F.date_format(utc, "yyyy-MM-dd'T'HH:mm:ss.SSS"),
                F.lit("+0000'"),
            )
        return F.concat(
            F.lit("'"),
            F.date_format(utc, "yyyy-MM-dd HH:mm:ss.SSS"),
            F.lit("'"),
        )
    if isinstance(t, TimestampNTZType):
        # NTZ carries no instant: emit the wall-clock digits unchanged
        sep = "'T'" if ts_style == "cql" else " "
        return F.concat(
            F.lit("'"),
            F.date_format(col, f"yyyy-MM-dd{sep}HH:mm:ss.SSS"),
            F.lit("'"),
        )
    return F.concat(
        F.lit("'"), F.regexp_replace(F.col(col).cast("string"), "'", "''"), F.lit("'")
    )


def render_inserts(
    df: DataFrame,
    keyspace: str,
    table: str,
    pk_cols: list[str],
    ttl: int | None = None,
) -> DataFrame:
    """Rows → (partition_key, cql) with one fully-bound INSERT per row.

    Rendering is pure column expressions (whole-stage codegen). The
    partition key rides along so the sink can group same-partition
    statements into one atomic UNLOGGED BATCH.
    """
    missing = [c for c in pk_cols if c not in df.columns]
    if missing:
        raise ValueError(f"partition key columns not in frame: {missing}")
    cols = df.columns
    using = f" USING TTL {int(ttl)}" if ttl else ""
    values = []
    for c in cols:
        values.append(_literal(df, c))
    stmt = F.concat(
        F.lit(f"INSERT INTO {keyspace}.{table} ({', '.join(cols)}) VALUES ("),
        F.concat_ws(", ", *values),
        F.lit(f"){using};"),
    )
    pk = F.concat_ws("", *[F.col(c).cast("string") for c in pk_cols])
    return df.select(pk.alias("partition_key"), stmt.alias("cql"))


def batch_statements(stmts: list[str], max_batch: int) -> list[str]:
    """Same-partition statements → UNLOGGED BATCH blocks of ≤max_batch
    (a single statement skips the BATCH wrapper entirely)."""
    out = []
    for i in range(0, len(stmts), max_batch):
        chunk = stmts[i : i + max_batch]
        if len(chunk) == 1:
            out.append(chunk[0])
        else:
            out.append(
                "BEGIN UNLOGGED BATCH\n" + "\n".join(chunk) + "\nAPPLY BATCH;"
            )
    return out


def cassandra_sink(
    stream: DataFrame,
    keyspace: str,
    table: str,
    pk_cols: list[str],
    transport,
    checkpoint: str,
    ttl: int | None = None,
    max_batch: int = 50,
):
    """Streaming writer: render INSERTs JVM-side, then per Spark
    partition group by Cassandra partition key and send UNLOGGED
    BATCHes. One transport context per Spark partition per micro-batch
    (connection reuse); at-least-once with idempotent INSERTs (CQL
    upsert semantics make replays safe)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rendered = render_inserts(batch_df, keyspace, table, pk_cols, ttl)
        # co-locate each Cassandra partition's statements in one Spark
        # partition so a partition's batches never split across tasks
        rendered = rendered.repartition("partition_key")

        def send_partition(rows) -> None:
            by_pk: dict[str, list[str]] = {}
            for r in rows:
                by_pk.setdefault(r["partition_key"], []).append(r["cql"])
            for stmts in by_pk.values():
                for batch in batch_statements(stmts, max_batch):
                    transport(batch)

        rendered.foreachPartition(send_partition)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
