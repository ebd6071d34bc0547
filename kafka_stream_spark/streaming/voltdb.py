"""VoltDB sink shape — the Stream Reactor VoltDB-connector family (S12)
re-expressed the Spark-idiomatic way.

The reference's Connect distribution ships the Stream Reactor VoltDB
sink (Dockerfile:43-52): KCQL-mapped Kafka records invoke VoltDB's
auto-generated CRUD stored procedures — ``TABLE.insert`` /
``TABLE.upsert`` with one positional parameter per column, the
documented VoltDB ingest surface. No VoltDB client exists in this
container, so the sink splits like the other families:

- the EXPENSIVE part — rendering every record into a fully-bound
  ``exec TABLE.upsert p1, p2, ...;`` invocation (sqlcmd syntax, VoltDB
  public docs) — runs distributed and JVM-side;
- VoltDB routes single-partition procedures by the table's partitioning
  column, so rows group by the FIRST PK column's value hash before
  transport (one call per partition-key group, batched by
  ``max_batch`` like the client's bulk loader);
- the TRANSPORT is a pluggable callable; a real
  ``org.voltdb.client.Client.callProcedure`` loop or sqlcmd pipe is a
  drop-in.

Public interfaces: VoltDB sqlcmd/stored-procedure conventions (public
docs), KCQL (``plans/kcql.py``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from kafka_stream_spark.streaming.cassandra import _literal


def render_proc_calls(
    df: DataFrame, table: str, pk_cols: list[str], upsert: bool
) -> DataFrame:
    """Rows → (route_key, exec_stmt): one auto-CRUD procedure invocation
    per row, parameters in column order (the generated procedures'
    positional contract)."""
    missing = [c for c in pk_cols if c not in df.columns]
    if missing:
        raise ValueError(f"PK columns not in frame: {missing}")
    proc = f"{table}.{'upsert' if upsert else 'insert'}"
    stmt = F.concat(
        F.lit(f"exec {proc} "),
        F.concat_ws(", ", *[_literal(df, c, ts_style="utc_naive") for c in df.columns]),
        F.lit(";"),
    )
    return df.select(
        F.col(pk_cols[0]).cast("string").alias("route_key"), stmt.alias("exec_stmt")
    )


def voltdb_sink(
    stream: DataFrame,
    table: str,
    pk_cols: list[str],
    transport,
    checkpoint: str,
    upsert: bool = True,
    max_batch: int = 100,
):
    """Streaming writer: render procedure calls JVM-side, co-locate each
    partitioning-key group, send ≤max_batch invocations per transport
    call. At-least-once; upsert procedures are replay-idempotent."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rendered = render_proc_calls(batch_df, table, pk_cols, upsert)
        rendered = rendered.repartition("route_key")

        def send_partition(rows) -> None:
            by_key: dict[str, list[str]] = {}
            for r in rows:
                by_key.setdefault(r["route_key"], []).append(r["exec_stmt"])
            for stmts in by_key.values():
                for i in range(0, len(stmts), max_batch):
                    transport("\n".join(stmts[i : i + max_batch]))

        rendered.foreachPartition(send_partition)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
