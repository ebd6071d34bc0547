"""StructType ⇄ Avro schema JSON round-trips over the six reference schemas."""

import json

import pytest

from kafka_stream_spark import fixtures
from kafka_stream_spark.functions.avro_schema import from_avro_json, to_avro_json
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

ALL_SCHEMAS = {
    "AIS_KEY": fixtures.AIS_KEY,
    "AIS_VALUE": fixtures.AIS_VALUE,
    "REDDIT_KEY": fixtures.REDDIT_KEY,
    "REDDIT_VALUE": fixtures.REDDIT_VALUE,
    "TAXI_VALUE": fixtures.TAXI_VALUE,
    "SMART_KEY": fixtures.SMART_KEY,
    "SMART_VALUE": fixtures.SMART_VALUE,
    "TELECOM_KEY": fixtures.TELECOM_KEY,
    "TELECOM_VALUE": fixtures.TELECOM_VALUE,
    "GRID_VALUE": fixtures.GRID_VALUE,
}


@pytest.mark.parametrize("name", sorted(ALL_SCHEMAS))
def test_roundtrip_reference_schema(name):
    schema = ALL_SCHEMAS[name]
    avro = to_avro_json(schema, name=name)
    back = from_avro_json(avro)
    assert back == schema


def test_nullable_union_shape():
    # reference encodes nullables as ["null", T] (TelecomItalia value json)
    avro = json.loads(to_avro_json(fixtures.TELECOM_VALUE, "Telecom"))
    by_name = {f["name"]: f["type"] for f in avro["fields"]}
    assert by_name["SmsInActivity"] == ["null", "double"]
    assert by_name["SquareId"] == "int"


def test_nested_polygon_record():
    avro = json.loads(to_avro_json(fixtures.GRID_VALUE, "Grid"))
    poly = {f["name"]: f["type"] for f in avro["fields"]}["Polygon"]
    assert poly["type"] == "array"
    item = poly["items"][1] if isinstance(poly["items"], list) else poly["items"]
    assert item["type"] == "record"
    assert [f["name"] for f in item["fields"]] == ["longitude", "latitude"]


def test_user_evolution_fixture():
    # the kafka-tests.yml:144-156 evolution pair expressed through Avro text
    v1 = from_avro_json(
        '{"type":"record","name":"User","fields":[{"name":"name","type":"string"}]}'
    )
    assert v1 == StructType([StructField("name", StringType(), False)])
    from kafka_stream_spark.schema_registry import SchemaRegistry

    reg = SchemaRegistry()
    reg.register("coyote_test-value", v1)
    v2 = from_avro_json(
        '{"type":"record","name":"User","fields":['
        '{"name":"name","type":"string"},{"name":"address","type":["null","string"]}]}'
    )
    assert reg.is_compatible("coyote_test-value", v2)


def test_unsupported_types_rejected():
    with pytest.raises(ValueError):
        from_avro_json('{"type":"record","name":"X","fields":[{"name":"e","type":"enum"}]}')
    with pytest.raises(ValueError):
        from_avro_json('{"type":"array","items":"int"}')
