"""REST-proxy shim (S9) — mirrors the reference's three proxy flows
(kafka-tests.yml:35-43 Avro, :67-71 JSON, :95-113 binary base64):
produce over HTTP, create consumer, consume from smallest, delete."""

import json
import urllib.request

import pytest

from kafka_stream_spark.sources.rest_proxy import RestProxy, RestProxyServer


@pytest.fixture()
def server(spark, tmp_path):
    proxy = RestProxy(spark, str(tmp_path / "topics"), partitions=2)
    srv = RestProxyServer(proxy).start()
    yield srv, proxy
    srv.stop()


def _req(port, method, path, body=None, content_type=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method
    )
    if content_type:
        req.add_header("Content-Type", content_type)
    with urllib.request.urlopen(req) as resp:
        raw = resp.read()
        return resp.status, json.loads(raw) if raw else None


def test_avro_produce_consume_roundtrip(server):
    srv, _ = server
    schema = json.dumps({
        "type": "record", "name": "User",
        "fields": [{"name": "name", "type": "string"}],
    })
    status, resp = _req(
        srv.port, "POST", "/topics/coyote_test_avro",
        {"value_schema": schema, "records": [{"value": {"name": "testUser"}}]},
        "application/vnd.kafka.avro.v1+json",
    )
    assert status == 200 and resp["offsets"] and "value_schema_id" in resp
    status, resp = _req(
        srv.port, "POST", "/consumers/coyote_avro",
        {"name": "a_consumer", "format": "avro", "auto.offset.reset": "smallest"},
        "application/vnd.kafka.v1+json",
    )
    assert status == 200 and resp["instance_id"] == "a_consumer"
    status, msgs = _req(
        srv.port, "GET",
        "/consumers/coyote_avro/instances/a_consumer/topics/coyote_test_avro",
    )
    assert status == 200
    assert [m["value"] for m in msgs] == [{"name": "testUser"}]
    assert {"partition", "offset"} <= set(msgs[0])
    # second poll: nothing new (offsets advanced)
    _, again = _req(
        srv.port, "GET",
        "/consumers/coyote_avro/instances/a_consumer/topics/coyote_test_avro",
    )
    assert again == []
    status, _ = _req(
        srv.port, "DELETE", "/consumers/coyote_avro/instances/a_consumer"
    )
    assert status == 204


def test_json_produce_consume(server):
    srv, _ = server
    status, resp = _req(
        srv.port, "POST", "/topics/coyote_test_json",
        {"records": [{"value": {"foo": "bar"}}]},
        "application/vnd.kafka.json.v1+json",
    )
    assert status == 200 and resp["offsets"]
    _req(srv.port, "POST", "/consumers/coyote_json",
         {"name": "a_consumer", "format": "json"},
         "application/vnd.kafka.v1+json")
    _, msgs = _req(
        srv.port, "GET",
        "/consumers/coyote_json/instances/a_consumer/topics/coyote_test_json",
    )
    assert [m["value"] for m in msgs] == [{"foo": "bar"}]


def test_binary_b64_produce_consume(server):
    srv, _ = server
    status, resp = _req(
        srv.port, "POST", "/topics/coyote_test_binary",
        {"records": [{"value": "S2Fma2E="}]},  # b64("Kafka")
        "application/vnd.kafka.binary.v1+json",
    )
    assert status == 200 and resp["offsets"]
    _req(srv.port, "POST", "/consumers/coyote_binary",
         {"name": "a_consumer", "format": "binary"},
         "application/vnd.kafka.v1+json")
    _, msgs = _req(
        srv.port, "GET",
        "/consumers/coyote_binary/instances/a_consumer/topics/coyote_test_binary",
    )
    assert [m["value"] for m in msgs] == ["S2Fma2E="]


def test_avro_schema_lands_in_registry_and_spark_can_read(server, spark):
    """The shim is a thin front over the SAME storage+registry the engine
    uses: after an HTTP produce, the topic is directly scannable as a
    DataFrame and the schema is queryable in the registry."""
    srv, proxy = server
    schema = json.dumps({
        "type": "record", "name": "User",
        "fields": [{"name": "name", "type": "string"}],
    })
    for who in ("alice", "bob"):
        _req(srv.port, "POST", "/topics/users",
             {"value_schema": schema, "records": [{"value": {"name": who}}]},
             "application/vnd.kafka.avro.v1+json")
    assert "users-value" in proxy.registry.subjects()
    df = proxy._topic("users").read()
    assert df.count() == 2
    # Confluent frame intact: magic 0x00 + 4-byte schema id
    vals = [bytes(r.value) for r in df.collect()]
    assert all(v[0] == 0 for v in vals)


def test_keyed_produce_partitions_consistently(server):
    """Records with the same key land in the same partition (FileTopic's
    keyed partitioner runs under the shim unchanged)."""
    srv, proxy = server
    for i in range(6):
        _req(srv.port, "POST", "/topics/keyed",
             {"records": [{"key": "k1", "value": {"n": i}}]},
             "application/vnd.kafka.json.v1+json")
    parts = {r.partition for r in proxy._topic("keyed").read().collect()}
    assert len(parts) == 1


def test_topic_metadata_endpoints(server):
    """kafka-tests.yml:24-32: GET /topics, /topics/<t>, /topics/<t>/partitions."""
    srv, proxy = server
    _req(
        srv.port, "POST", "/topics/meta_demo",
        {"records": [{"value": {"a": 1}}, {"value": {"a": 2}}]},
        "application/vnd.kafka.json.v1+json",
    )
    status, topics = _req(srv.port, "GET", "/topics")
    assert status == 200 and "meta_demo" in topics
    status, info = _req(srv.port, "GET", "/topics/meta_demo")
    assert status == 200 and info["name"] == "meta_demo"
    status, parts = _req(srv.port, "GET", "/topics/meta_demo/partitions")
    assert status == 200 and len(parts) == proxy.partitions
    assert sum(p["records"] for p in parts) == 2
    assert all(p["leader"] == 0 for p in parts)
    import urllib.error

    try:
        _req(srv.port, "GET", "/topics/does_not_exist")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404
