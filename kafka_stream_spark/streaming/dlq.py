"""Dead-letter routing for decode failures (SURVEY.md §2.9 T5 delivery
semantics, Connect's errors.tolerance/dead-letter-queue analog).

A malformed record must never kill a pipeline: Connect workers route
bad records to a DLQ topic when ``errors.tolerance=all``; the engine
equivalent splits every decode into (ok, dead) by parse success.

``decode_json_with_dlq`` stays fully JVM-side: ``from_json`` yields null
on parse failure, ``to_json``-roundtrip detection distinguishes "parsed
to all-null struct" from "failed to parse" via the PERMISSIVE corrupt
column. Both branches share one scan (Catalyst CSE), so the split costs
no extra pass — the P5 branch pattern applied to error handling.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DLQ_COLUMNS = ("key", "raw_value", "topic", "partition", "offset", "error")


def decode_json_with_dlq(
    records: DataFrame, value_schema: str
) -> tuple[DataFrame, DataFrame]:
    """Split a topic-envelope DataFrame into (decoded, dead_letters).

    ``records`` needs the envelope columns (key, value, topic, partition,
    offset); ``value_schema`` is a DDL string for the JSON payload.

    Returns:
      decoded: envelope metadata + one column per schema field
      dead:    DLQ_COLUMNS rows (raw bytes preserved for replay, error tag)
    """
    raw = F.col("value").cast("string")
    # PERMISSIVE corrupt-record capture: add _corrupt to the struct schema
    schema_with_corrupt = value_schema + ", _corrupt STRING"
    parsed = records.withColumn(
        "__parsed",
        F.from_json(
            raw,
            schema_with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    ok = (
        parsed.filter(F.col("__parsed._corrupt").isNull() & F.col("value").isNotNull())
        .select(
            "key",
            "topic",
            "partition",
            "offset",
            F.col("__parsed.*"),
        )
        .drop("_corrupt")
    )
    dead = (
        parsed.filter(F.col("__parsed._corrupt").isNotNull() | F.col("value").isNull())
        .select(
            "key",
            F.col("value").alias("raw_value"),
            "topic",
            "partition",
            "offset",
            F.when(F.col("value").isNull(), F.lit("null_payload"))
            .otherwise(F.lit("json_parse_error"))
            .alias("error"),
        )
    )
    return ok, dead
