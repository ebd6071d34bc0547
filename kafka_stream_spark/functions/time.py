"""Event-time helpers.

The reference carries nanosecond event time (AIS ``Timestamp`` ns,
``classAPositionReportSchema.json:87-91``) and epoch-millis bucketed time
(telecom ``TimeInterval``, ``TelecomItalia-...value.json:13-16``). Spark
timestamps are microsecond precision, so nanos are kept as ``long`` and a
derived µs timestamp column is used for windowing (SURVEY.md §4 known-hard
item 4). The driver's ``events.parquet`` stores TIMESTAMP(NANOS) which
Spark only reads via ``spark.sql.legacy.parquet.nanosAsLong`` — the
catalog loader enables that and derives a TIMESTAMP_NTZ column.

All conversions use integer arithmetic (``div``), never float division:
at 1.7e18 ns, double rounding error is ±hundreds of ns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def enable_nanos_as_long(spark: SparkSession) -> None:
    """Allow reading parquet TIMESTAMP(NANOS) columns as long (runtime conf)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def with_event_ts(df: DataFrame, ns_col: str = "ts", out_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to µs TIMESTAMP_NTZ.

    Accepts either a nanos-since-epoch long (the ``nanosAsLong`` read path,
    Spark ≤4.0) or an already-decoded timestamp (Spark 4.1+ reads parquet
    TIMESTAMP(NANOS) natively as TIMESTAMP_NTZ, truncating ns→µs). Both
    paths floor ns→µs — integer ``div 1000``, never float division (at
    1.7e18 ns, double rounding error is ±hundreds of ns) — matching
    DuckDB's parquet reader, so oracle comparisons are exact.
    """
    dt = df.schema[ns_col].dataType.typeName()
    if dt in ("long", "integer", "bigint"):
        return df.withColumn(
            out_col,
            F.expr(f"cast(timestamp_micros({ns_col} div 1000) as timestamp_ntz)"),
        )
    return df.withColumn(out_col, F.col(ns_col).cast("timestamp_ntz"))


def with_event_ts_ms(df: DataFrame, ms_col: str, out_col: str) -> DataFrame:
    """Epoch-millis long → TIMESTAMP_NTZ (telecom TimeInterval shape)."""
    return df.withColumn(
        out_col, F.expr(f"cast(timestamp_millis({ms_col}) as timestamp_ntz)")
    )
