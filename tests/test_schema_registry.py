"""Schema registry behaviors mirroring integration-tests/kafka-tests.yml:127-159."""

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from kafka_stream_spark.schema_registry import (
    Compatibility,
    IncompatibleSchemaError,
    SchemaRegistry,
)

USER_V1 = StructType([StructField("name", StringType(), False)])
# evolution fixture from kafka-tests.yml:144-156: add nullable address
USER_V2 = StructType(
    [StructField("name", StringType(), False), StructField("address", StringType(), True)]
)
USER_BAD = StructType([StructField("name", IntegerType(), False)])


def test_register_and_versions():
    r = SchemaRegistry()
    id1 = r.register("coyote_test-value", USER_V1)
    assert r.subjects() == ["coyote_test-value"]
    assert r.versions("coyote_test-value") == [1]
    assert r.get("coyote_test-value") == USER_V1
    assert r.by_id(id1) == USER_V1


def test_idempotent_reregistration():
    r = SchemaRegistry()
    assert r.register("s", USER_V1) == r.register("s", USER_V1)
    assert r.versions("s") == [1]


def test_compatible_evolution_adds_version():
    r = SchemaRegistry()
    r.register("s", USER_V1)
    assert r.is_compatible("s", USER_V2)  # the is_compatible=true assertion
    r.register("s", USER_V2)
    assert r.versions("s") == [1, 2]
    assert r.get("s", 1) == USER_V1
    assert r.get("s", "latest") == USER_V2


def test_type_change_rejected():
    r = SchemaRegistry()
    r.register("s", USER_V1)
    assert not r.is_compatible("s", USER_BAD)
    with pytest.raises(IncompatibleSchemaError):
        r.register("s", USER_BAD)


def test_backward_rejects_new_required_field():
    r = SchemaRegistry()
    r.register("s", USER_V1)
    v2_required = StructType(
        [StructField("name", StringType(), False), StructField("addr", StringType(), False)]
    )
    assert not r.is_compatible("s", v2_required)


def test_forward_mode():
    r = SchemaRegistry()
    r.set_compatibility(Compatibility.FORWARD)
    r.register("s", USER_V2)
    # dropping the nullable field: old (v2) reader reads new (v1) data fine
    assert r.is_compatible("s", USER_V1)


def test_none_mode_allows_anything():
    r = SchemaRegistry(default_compatibility=Compatibility.NONE)
    r.register("s", USER_V1)
    r.register("s", USER_BAD)
    assert r.versions("s") == [1, 2]
