"""HBase sink shape — the Stream Reactor HBase-connector family (S12)
re-expressed the Spark-idiomatic way.

The reference's Connect distribution ships the Stream Reactor HBase
sink (Dockerfile:43-52). Its data model: each record becomes a PUT of
one CELL per non-key column — ``(rowkey, column_family:qualifier,
value, ts)`` — where the ROWKEY is the KCQL PK fields joined by a
delimiter (the connector's documented composite-rowkey rule). Like the
other sink families here, the rendering runs distributed and JVM-side;
the transport (an HBase client `Table.put` batch) is a pluggable
callable fed per Spark partition, with cells for one rowkey kept
together (HBase row-level atomicity matches per-row batching).

Salting: monotonically increasing rowkeys (timestamps!) hotspot a
single region at scale; ``salt_buckets`` prefixes the rowkey with
``md5(rowkey) % buckets`` — the standard HBase write-sharding pattern —
rendered in the same JVM expression.

Public interfaces: HBase data model (Apache docs), KCQL (Lenses public
docs).
"""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def file_put_transport(directory: str):
    """Test/dev transport: write each put batch as tab-separated cells."""

    def send(cells: list[tuple]) -> None:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"puts-{uuid.uuid4().hex}.tsv")
        with open(path, "w", encoding="utf-8") as f:
            for rowkey, col, val in cells:
                f.write(f"{rowkey}\t{col}\t{val}\n")

    return send


def render_cells(
    df: DataFrame,
    family: str,
    pk_cols: list[str],
    delimiter: str = "|",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Rows → (rowkey, column, value) cells, one per non-key column.

    The explode to cells happens via a JVM-side stack() (no Python, no
    per-row UDF); at N data columns the blowup factor is exactly N —
    the same fan-out the HBase client's Put list carries anyway."""
    missing = [c for c in pk_cols if c not in df.columns]
    if missing:
        raise ValueError(f"rowkey columns not in frame: {missing}")
    data_cols = [c for c in df.columns if c not in pk_cols]
    if not data_cols:
        raise ValueError("no non-key columns to store")
    base = df.withColumn(
        "__rk", F.concat_ws(delimiter, *[F.col(c).cast("string") for c in pk_cols])
    )
    if salt_buckets:
        salt = F.expr(
            "cast(conv(substr(md5(cast(__rk as binary)), 1, 4), 16, 10)"
            f" as bigint) % {int(salt_buckets)}"
        )
        base = base.withColumn(
            "__rk", F.concat(salt.cast("string"), F.lit(delimiter), F.col("__rk"))
        )
    stack_args = ", ".join(
        f"'{family}:{c}', cast(`{c}` as string)" for c in data_cols
    )
    return base.select(
        F.col("__rk").alias("rowkey"),
        F.expr(f"stack({len(data_cols)}, {stack_args}) AS (column, value)"),
    )


def hbase_sink(
    stream: DataFrame,
    family: str,
    pk_cols: list[str],
    transport,
    checkpoint: str,
    delimiter: str = "|",
    salt_buckets: int | None = None,
    max_puts_per_call: int = 1000,
):
    """Streaming writer: render cells JVM-side; per Spark partition,
    group cells by rowkey (row-atomic puts) and send bounded batches.
    At-least-once; puts are idempotent per (rowkey, column, value)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cells = render_cells(batch_df, family, pk_cols, delimiter, salt_buckets)
        cells = cells.repartition("rowkey")

        def send_partition(rows) -> None:
            by_row: dict[str, list[tuple]] = {}
            for r in rows:
                by_row.setdefault(r["rowkey"], []).append(
                    (r["rowkey"], r["column"], r["value"])
                )
            buf: list[tuple] = []
            for row_cells in by_row.values():
                if buf and len(buf) + len(row_cells) > max_puts_per_call:
                    transport(buf)
                    buf = []
                buf.extend(row_cells)
            if buf:
                transport(buf)

        cells.foreachPartition(send_partition)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
