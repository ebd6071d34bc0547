"""Confluent wire-format framing for registry-encoded payloads.

The reference's Avro records travel as: 1 magic byte (0x00) + 4-byte
big-endian schema id + Avro body (implied by the AvroConverter + registry
config at ``integration-tests/kafka-tests.yml:231-238``; SURVEY.md §4
known-hard item 1). These helpers split/assemble that frame with pure
Catalyst binary expressions — no UDF, so framing is free at scale.

Avro body decode itself needs the spark-avro module (``from_avro``); this
container has no Kafka/avro jars, so ``decode_avro_value`` gates on its
availability and the framing layer is tested independently (the JSON path
needs no jar at all).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

MAGIC_BYTE = 0


def frame(schema_id: int, body: Column) -> Column:
    """binary body → magic byte + 4-byte BE schema id + body."""
    header = bytes([MAGIC_BYTE]) + int(schema_id).to_bytes(4, "big")
    return F.concat(F.lit(header), body)


def unframe_schema_id(value: Column) -> Column:
    """Extract the 4-byte big-endian schema id as int."""
    def byte_at(i: int) -> Column:
        # substring is 1-based on binary too; hex→int avoids signed tinyint
        return F.conv(F.hex(F.substring(value, i, 1)), 16, 10).cast("int")

    return (
        byte_at(2) * F.lit(16777216)
        + byte_at(3) * F.lit(65536)
        + byte_at(4) * F.lit(256)
        + byte_at(5)
    )


def unframe_body(value: Column) -> Column:
    """Strip the 5-byte header, returning the payload body."""
    return F.substring(value, 6, 2147483647)


def check_magic(value: Column) -> Column:
    """True when the payload carries the Confluent magic byte."""
    return F.substring(value, 1, 1) == F.lit(bytes([MAGIC_BYTE]))


def decode_avro_value(value: Column, avro_schema_json: str) -> Column:
    """Confluent-framed Avro → struct, when spark-avro is on the classpath."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "spark-avro module not available in this environment; "
            "framing helpers (frame/unframe_*) still apply"
        ) from e
    return from_avro(unframe_body(value), avro_schema_json)


def decode_json_value(value: Column, schema) -> Column:
    """Schemaless-JSON value path (backblaze_smart shape, put.sh:46-55)."""
    return F.from_json(value.cast("string"), schema)
