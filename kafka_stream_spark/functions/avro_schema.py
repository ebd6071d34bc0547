"""StructType ⇄ Avro schema JSON conversion.

The reference's data model is Avro-first: producers declare key/value Avro
schemas and register them (``sample-data/put.sh:23-32``). Our registry
stores Spark StructTypes; these converters translate to/from Avro record
schemas (the registry's wire format) so subjects can be exported to or
imported from a real Schema Registry. Nullable fields map to
``["null", T]`` unions, matching the reference schemas
(``TelecomItalia-...value.json:23-46``, ``reddit.value.json:31-38``).

Pure-Python, no avro library needed (schema translation only; payload
codec lives in functions/confluent.py).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

_SPARK_TO_AVRO = {
    StringType: "string",
    IntegerType: "int",
    LongType: "long",
    FloatType: "float",
    DoubleType: "double",
    BooleanType: "boolean",
    BinaryType: "bytes",
}
_AVRO_TO_SPARK = {
    "string": StringType,
    "int": IntegerType,
    "long": LongType,
    "float": FloatType,
    "double": DoubleType,
    "boolean": BooleanType,
    "bytes": BinaryType,
}


def _field_to_avro(dt: DataType, name_hint: str) -> Any:
    for t, avro in _SPARK_TO_AVRO.items():
        if isinstance(dt, t):
            return avro
    if isinstance(dt, ArrayType):
        items = _field_to_avro(dt.elementType, name_hint)
        if dt.containsNull:
            items = ["null", items]
        return {"type": "array", "items": items}
    if isinstance(dt, MapType):
        values = _field_to_avro(dt.valueType, name_hint)
        if dt.valueContainsNull:
            values = ["null", values]
        return {"type": "map", "values": values}
    if isinstance(dt, StructType):
        return _struct_to_record(dt, name_hint)
    raise ValueError(f"no Avro mapping for Spark type {dt.simpleString()}")


def _struct_to_record(s: StructType, name: str) -> dict:
    fields = []
    for f in s.fields:
        ftype = _field_to_avro(f.dataType, f"{name}_{f.name}")
        if f.nullable:
            ftype = ["null", ftype]  # reference-style nullable union
        fields.append({"name": f.name, "type": ftype})
    return {"type": "record", "name": name, "fields": fields}


def to_avro_json(schema: StructType, name: str = "Record", namespace: str | None = None) -> str:
    rec = _struct_to_record(schema, name)
    if namespace:
        rec["namespace"] = namespace
    return json.dumps(rec)


def _avro_to_spark(t: Any) -> tuple[DataType, bool]:
    """Returns (type, nullable)."""
    if isinstance(t, list):  # union
        nn = [x for x in t if x != "null"]
        if len(nn) != 1:
            raise ValueError(f"only [null, T] unions supported, got {t}")
        dt, _ = _avro_to_spark(nn[0])
        return dt, True
    if isinstance(t, str):
        if t not in _AVRO_TO_SPARK:
            raise ValueError(f"unsupported Avro primitive {t!r}")
        return _AVRO_TO_SPARK[t](), False
    if isinstance(t, dict):
        k = t["type"]
        lt = t.get("logicalType")
        # logical types first: the annotation refines the base primitive
        # (matches what the codec emits — Decimal / date / UTC-naive dt)
        if lt == "decimal":
            return DecimalType(t.get("precision", 38), t.get("scale", 0)), False
        if lt == "date":
            return DateType(), False
        if lt in ("timestamp-millis", "timestamp-micros"):
            return TimestampNTZType(), False
        if lt == "uuid":
            return StringType(), False
        # time-millis/micros deliberately degrade: Spark has no TIME type
        if k == "record":
            return from_avro_json(json.dumps(t)), False
        if k == "array":
            dt, item_null = _avro_to_spark(t["items"])
            return ArrayType(dt, containsNull=item_null), False
        if k == "map":
            dt, v_null = _avro_to_spark(t["values"])
            return MapType(StringType(), dt, valueContainsNull=v_null), False
        if k == "enum":
            return StringType(), False
        if k == "fixed":
            return BinaryType(), False
        # other annotated primitives degrade to their base type
        if isinstance(k, str) and k in _AVRO_TO_SPARK:
            return _AVRO_TO_SPARK[k](), False
    raise ValueError(f"unsupported Avro type {t!r}")


def from_avro_json(avro_json: str) -> StructType:
    rec = json.loads(avro_json)
    if rec.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    fields = []
    for f in rec["fields"]:
        dt, nullable = _avro_to_spark(f["type"])
        fields.append(StructField(f["name"], dt, nullable))
    return StructType(fields)
