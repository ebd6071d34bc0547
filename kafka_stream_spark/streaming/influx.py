"""InfluxDB sink shape — the Stream Reactor InfluxDB-connector family
(S12) re-expressed the Spark-idiomatic way.

The reference's Connect distribution ships the Stream Reactor InfluxDB
sink (Dockerfile:43-52): records become line-protocol writes. No
InfluxDB exists in this container, so — like ``elastic.py`` and
``cassandra.py`` — the split is:

- the EXPENSIVE part, rendering every record into InfluxDB **line
  protocol** (``measurement,tag=v field=v,field2=v ts``) with the full
  escaping rules (commas/spaces in measurements; commas/equals/spaces
  in tag and field keys and tag values; quoted+backslash-escaped string
  field values; ``i``-suffixed integers; nanosecond timestamps), runs
  distributed and JVM-side via concat/regexp_replace expressions;
- the TRANSPORT — POSTing a partition's payload to ``/write`` — is a
  pluggable callable invoked once per Spark partition per micro-batch
  with newline-joined lines, exactly the bulk body the HTTP API takes.

Public format: InfluxDB line protocol (influxdata public docs).
"""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    FloatType,
    IntegralType,
    StringType,
)


def file_write_transport(directory: str):
    """Test/dev transport: write each bulk body to a unique file."""

    def send(payload: str) -> None:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"write-{uuid.uuid4().hex}.lp")
        with open(path, "w", encoding="utf-8") as f:
            f.write(payload)

    return send


def _esc(col, chars: str):
    """Backslash-escape each char in ``chars`` (order-safe: backslash
    itself is never in ``chars`` for line protocol keys/tags)."""
    out = col
    for ch in chars:
        out = F.regexp_replace(out, re_escape(ch), "\\\\" + ch)
    return out


def re_escape(ch: str) -> str:
    return "\\" + ch if ch in ".^$*+?()[]{}|\\" else ch


def _field_value(df: DataFrame, c: str):
    t = df.schema[c].dataType
    if isinstance(t, BooleanType):
        return F.when(F.col(c), "true").otherwise("false")
    if isinstance(t, IntegralType):
        return F.concat(F.col(c).cast("string"), F.lit("i"))
    if isinstance(t, (DoubleType, FloatType)):
        return F.col(c).cast("string")
    if isinstance(t, StringType):
        # strings: double-quoted, with backslash and quote escaped
        body = F.regexp_replace(F.col(c), "\\\\", "\\\\\\\\")
        body = F.regexp_replace(body, '"', '\\\\"')
        return F.concat(F.lit('"'), body, F.lit('"'))
    raise TypeError(f"unsupported field type for line protocol: {t}")


def line_protocol(
    df: DataFrame,
    measurement: str,
    tag_cols: list[str],
    field_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Rows → one ``line`` column of InfluxDB line protocol. Tags are
    sorted by key (the protocol's recommended canonical form), the
    timestamp is emitted in nanoseconds."""
    if not field_cols:
        raise ValueError("line protocol requires at least one field")
    m = measurement.replace(",", "\\,").replace(" ", "\\ ")
    parts = [F.lit(m)]
    for tc in sorted(tag_cols):
        key = tc.replace(",", "\\,").replace("=", "\\=").replace(" ", "\\ ")
        parts.append(F.lit(f",{key}="))
        parts.append(_esc(F.col(tc).cast("string"), ",= "))
    parts.append(F.lit(" "))
    field_parts = []
    for fc in field_cols:
        key = fc.replace(",", "\\,").replace("=", "\\=").replace(" ", "\\ ")
        field_parts.append(F.concat(F.lit(f"{key}="), _field_value(df, fc)))
    ts_ns = (F.unix_micros(F.col(ts_col).cast("timestamp")) * 1000).cast("string")
    return df.select(
        F.concat(
            F.concat(*parts),
            F.concat_ws(",", *field_parts),
            F.lit(" "),
            ts_ns,
        ).alias("line")
    )


def influx_sink(
    stream: DataFrame,
    measurement: str,
    tag_cols: list[str],
    field_cols: list[str],
    ts_col: str,
    transport,
    checkpoint: str,
    max_lines_per_call: int = 5000,
):
    """Streaming writer: render line protocol JVM-side; each Spark
    partition sends newline-joined chunks of ≤max_lines_per_call (the
    HTTP API's recommended batch size band). At-least-once; line
    protocol writes are idempotent at equal (measurement, tags, ts)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        lines = line_protocol(batch_df, measurement, tag_cols, field_cols, ts_col)

        def send_partition(rows) -> None:
            buf = []
            for r in rows:
                buf.append(r["line"])
                if len(buf) >= max_lines_per_call:
                    transport("\n".join(buf))
                    buf = []
            if buf:
                transport("\n".join(buf))

        lines.foreachPartition(send_partition)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
