"""The reference's full integration flow (integration-tests/
kafka-tests.yml + smoke-tests.sh), executed IN SEQUENCE against this
engine — the same groups, in the same order, on one shared topic root:

  Brokers        create topic → list → produce/read volume → delete
  REST Proxy     topic metadata → avro/json/binary produce+consume over
                 real HTTP → consumer lifecycle
  SchemaRegistry register → subjects → versions → fetch → complex schema
                 → compatibility check → configuration
  Connect        connector list → create (console-connector analog) →
                 status → consume output → delete;
                 SQLite standalone: db init → incremental read into
                 topic → console-consume → delete topic

Individual flows are covered by their own test modules; this file
asserts the reference's SEQUENCE (state flows from step to step: the
proxy's schema lands in the registry the later steps query; the
connector drains the topic the broker steps created) and emits the
same results shape smoke-tests.sh publishes ({"passed": N,
"failed": 0})."""

import json
import sqlite3
import urllib.request

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_stream_spark.schema_registry import Compatibility, SchemaRegistry
from kafka_stream_spark.sources.connectors import DbapiIncrementalSource
from kafka_stream_spark.sources.rest_proxy import RestProxy, RestProxyServer
from kafka_stream_spark.sources.topics import FileTopic, list_topics
from kafka_stream_spark.streaming.pipelines import PipelineRegistry


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


def test_coyote_flow_in_sequence(spark, tmp_path):
    results = {"passed": 0, "failed": 0}

    def step(name, ok):
        results["passed" if ok else "failed"] += 1
        assert ok, f"coyote step failed: {name}"

    root = str(tmp_path / "topics")

    # --- Brokers (kafka-tests.yml:4-18) -------------------------------
    basic = FileTopic(spark, root, "coyote_basic", partitions=1)
    vol = spark.range(5_000).select(
        F.col("id").cast("string").alias("key"),
        F.rpad(F.col("id").cast("string"), 100, "x").alias("value"),
    )
    basic.append(vol)
    step("Create Topic (basic kafka)", basic.exists())
    step("List Topics (basic kafka)", "coyote_basic" in list_topics(root))
    step("Performance Test (basic kafka)", basic.read().count() == 5_000)

    # --- REST Proxy (kafka-tests.yml:20-118) over real HTTP -----------
    registry = SchemaRegistry()
    proxy = RestProxy(spark, root, partitions=2, registry=registry)
    srv = RestProxyServer(proxy).start()
    try:
        status, topics = _req(srv.port, "GET", "/topics")
        step("List Topics (rest proxy)", status == 200 and "coyote_basic" in topics)
        status, info = _req(srv.port, "GET", "/topics/coyote_basic")
        step("Topic Information (rest proxy)", status == 200 and info["name"] == "coyote_basic")
        status, parts = _req(srv.port, "GET", "/topics/coyote_basic/partitions")
        step("Topic Partitions (rest proxy)", status == 200 and len(parts) == 1)
        basic.delete()
        step("Delete Topic (basic kafka)", not basic.exists())

        schema = json.dumps(
            {"type": "record", "name": "User",
             "fields": [{"name": "name", "type": "string"}]}
        )
        status, resp = _req(
            srv.port, "POST", "/topics/coyote_test_avro",
            {"value_schema": schema, "records": [{"value": {"name": "testUser"}}]},
            "application/vnd.kafka.avro.v1+json",
        )
        step("Produce Avro Message", status == 200 and resp["offsets"])
        status, _ = _req(
            srv.port, "POST", "/consumers/coyote_avro",
            {"name": "a_consumer", "format": "avro", "auto.offset.reset": "smallest"},
            "application/vnd.kafka.v1+json",
        )
        step("Create Consumer for Avro data", status == 200)
        status, msgs = _req(
            srv.port, "GET",
            "/consumers/coyote_avro/instances/a_consumer/topics/coyote_test_avro",
        )
        step("Consume Avro Message",
             status == 200 and [m["value"] for m in msgs] == [{"name": "testUser"}])
        status, _ = _req(srv.port, "DELETE", "/consumers/coyote_avro/instances/a_consumer")
        step("Delete Avro Consumer", status == 204)

        status, _ = _req(
            srv.port, "POST", "/topics/coyote_test_json",
            {"records": [{"value": {"foo": "bar"}}]},
            "application/vnd.kafka.json.v1+json",
        )
        step("Produce JSON Message", status == 200)
        _req(srv.port, "POST", "/consumers/coyote_json",
             {"name": "a_consumer", "format": "json", "auto.offset.reset": "smallest"},
             "application/vnd.kafka.v1+json")
        status, msgs = _req(
            srv.port, "GET",
            "/consumers/coyote_json/instances/a_consumer/topics/coyote_test_json",
        )
        step("Consume JSON Message",
             status == 200 and [m["value"] for m in msgs] == [{"foo": "bar"}])
        _req(srv.port, "DELETE", "/consumers/coyote_json/instances/a_consumer")

        status, _ = _req(
            srv.port, "POST", "/topics/coyote_test_binary",
            {"records": [{"value": "S2Fma2E="}]},  # base64("Kafka"), as the yml
            "application/vnd.kafka.binary.v1+json",
        )
        step("Produce Binary Message", status == 200)
        _req(srv.port, "POST", "/consumers/coyote_binary",
             {"name": "a_consumer", "format": "binary", "auto.offset.reset": "smallest"},
             "application/vnd.kafka.v1+json")
        status, msgs = _req(
            srv.port, "GET",
            "/consumers/coyote_binary/instances/a_consumer/topics/coyote_test_binary",
        )
        step("Consume Binary Message",
             status == 200 and [m["value"] for m in msgs] == ["S2Fma2E="])
        _req(srv.port, "DELETE", "/consumers/coyote_binary/instances/a_consumer")
    finally:
        srv.stop()

    # --- Schema Registry (kafka-tests.yml:123-159) --------------------
    # the avro produce above already registered its schema via the proxy
    step("Register a new Schema version (via proxy produce)",
         any("coyote_test_avro" in s for s in registry.subjects()))
    v1 = StructType([StructField("name", StringType(), False)])
    subject = "coyote_parity-value"
    registry.register(subject, v1)
    step("List subjects", subject in registry.subjects())
    step("List Schema versions", registry.versions(subject) == [1])
    step("Fetch Schema by name and version",
         registry.get(subject, 1).fieldNames() == ["name"])
    complex_schema = StructType(
        [
            StructField("name", StringType(), False),
            StructField("address", StringType(), True),
        ]
    )
    step("Register Complex Schema (backward-compatible evolution)",
         registry.register(subject, complex_schema) > 0)
    incompatible = StructType([StructField("name", LongType(), False)])
    step("Test Schema Compatibility",
         not registry.is_compatible(subject, incompatible))
    registry.set_compatibility(Compatibility.FULL, subject)
    step("Get Schema Registry Configuration",
         registry.get_compatibility(subject) == Compatibility.FULL)

    # --- Connect distributed (kafka-tests.yml:161-206) ----------------
    reg = PipelineRegistry(spark)
    step("Get list of Connectors", reg.list() == [])
    src_topic = FileTopic(spark, root, "coyote_connect_test", partitions=1)
    src_topic.append(
        spark.createDataFrame([("k", "hello connect")], ["key", "value"])
    )
    spec = {
        "name": "console_source",
        "source": {"format": "parquet", "path": src_topic.path,
                   "schema": src_topic.read().schema},
        "transform": "SELECT value FROM source",
        "sink": {"format": "memory", "table": "coyote_console_out"},
        "trigger": {"availableNow": True},
        "checkpoint": str(tmp_path / "ck_connect"),
    }
    p = reg.start(spec)
    step("Create a Console Connector", reg.list() == ["console_source"])
    step("Get Connector's Configuration",
         reg.status("console_source")["name"] == "console_source")
    p.query.awaitTermination(60)
    out = [
        bytes(r.value).decode()
        for r in spark.sql("SELECT * FROM coyote_console_out").collect()
    ]
    step("Run Console Consumer", out == ["hello connect"])
    reg.delete("console_source")
    step("Delete connector", reg.list() == [])
    src_topic.delete()
    step("Delete Connect Distributed Test Topic", not src_topic.exists())

    # --- Connect standalone: SQLite (kafka-tests.yml:209-261) ---------
    db = str(tmp_path / "coyote.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE accounts (id INTEGER PRIMARY KEY, name TEXT)")
    con.execute("INSERT INTO accounts (name) VALUES ('alice'), ('bob')")
    con.commit()
    con.close()
    step("Create and Init SQLite database", True)
    src = DbapiIncrementalSource(
        spark, lambda: sqlite3.connect(db), "accounts",
        incrementing_column="id", topic_prefix="coyote-ca-",
    )
    batch = src.poll()
    jdbc_topic = FileTopic(spark, root, src.topic, partitions=1)
    jdbc_topic.append(
        batch.select(
            F.col("id").cast("string").alias("key"),
            F.to_json(F.struct("id", "name")).alias("value"),
        )
    )
    step("Read SQLite into Topic", jdbc_topic.read().count() == 2)
    names = {
        json.loads(r.value)["name"] for r in jdbc_topic.read().collect()
    }
    step("Run Console Consumer (jdbc topic)", names == {"alice", "bob"})
    jdbc_topic.delete()
    step("Delete Connect Standalone Test Topic", not jdbc_topic.exists())

    # smoke-tests.sh publishes {"passed": N, "failed": M}
    assert results["failed"] == 0
    assert results["passed"] == 32
