"""ReThinkDB / HazelCast / DocumentDB sink families (S12 long tail):
rendered-payload round trips through the streaming path with file
transports, KCQL routing, STOREAS structure selection, and write-mode →
conflict/upsert mapping.
"""

import glob
import json

import pytest

from kafka_stream_spark.streaming.connector_sinks import kcql_connector_sink
from kafka_stream_spark.streaming.hazelcast import hazelcast_sink
from kafka_stream_spark.streaming.kudu import file_sql_transport
from kafka_stream_spark.streaming.rethink import rethink_sink

SCHEMA = "user_id long, name string, score double"
ROWS = [(i, f'u"{i}"', 1.5 * i) for i in range(9)]


def _stream(spark, tmp_path, sub="src"):
    src = str(tmp_path / sub)
    spark.createDataFrame(ROWS, SCHEMA).write.mode("overwrite").parquet(src)
    return spark.readStream.schema(SCHEMA).parquet(src)


def _run(writer):
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(60)


def _payloads(out):
    return [json.loads(open(p).read()) for p in glob.glob(f"{out}/batch-*.json")]


def test_rethink_sink_conflict_modes_and_ids(spark, tmp_path):
    out = str(tmp_path / "wire")
    _run(
        rethink_sink(
            _stream(spark, tmp_path), "analytics", "users", ["user_id"],
            file_sql_transport(out, "json"), str(tmp_path / "ck"),
            upsert=True, max_batch=4,
        )
    )
    payloads = _payloads(out)
    assert all(p["db"] == "analytics" and p["table"] == "users" for p in payloads)
    assert all(p["conflict"] == "replace" for p in payloads)  # UPSERT mapping
    assert all(len(p["docs"]) <= 4 for p in payloads)
    docs = {d["id"]: d for p in payloads for d in p["docs"]}
    assert set(docs) == {str(i) for i in range(9)}
    assert docs["3"]["name"] == 'u"3"'  # JSON escaping survived
    assert docs["3"]["score"] == 4.5


def test_hazelcast_map_and_ringbuffer_modes(spark, tmp_path):
    out = str(tmp_path / "wire")
    _run(
        hazelcast_sink(
            _stream(spark, tmp_path), "users-cache", ["user_id"],
            file_sql_transport(out, "json"), str(tmp_path / "ck"),
            storeas="MAP",
        )
    )
    entries = {
        e["key"]: json.loads(e["value"]) if isinstance(e["value"], str) else e["value"]
        for p in _payloads(out)
        for e in p["entries"]
        if p["structure"] == "map"
    }
    assert set(entries) == {str(i) for i in range(9)}

    out2 = str(tmp_path / "wire2")
    _run(
        hazelcast_sink(
            _stream(spark, tmp_path), "events-rb", [],
            file_sql_transport(out2, "json"), str(tmp_path / "ck2"),
            storeas="RING_BUFFER",
        )
    )
    vals = [e for p in _payloads(out2) for e in p["entries"]]
    assert len(vals) == 9 and all("user_id" in v for v in vals)

    with pytest.raises(ValueError, match="STOREAS"):
        hazelcast_sink(
            _stream(spark, tmp_path), "x", [], lambda s: None, "/tmp/ck",
            storeas="bogus",
        )


def test_documentdb_kcql_routing_upsert(spark, tmp_path):
    out = str(tmp_path / "wire")
    _run(
        kcql_connector_sink(
            _stream(spark, tmp_path),
            "UPSERT INTO crm.users SELECT user_id, name FROM people PK user_id",
            system="documentdb",
            transport=file_sql_transport(out, "json"),
            checkpoint=str(tmp_path / "ck"),
        )
    )
    payloads = _payloads(out)
    assert all(
        p["database"] == "crm" and p["collection"] == "users" and p["is_upsert"]
        for p in payloads
    )
    docs = {d["id"]: d for p in payloads for d in p["docs"]}
    assert set(docs) == {str(i) for i in range(9)}
    assert set(docs["2"]) == {"id", "user_id", "name"}  # projection applied


def test_rethink_and_hazelcast_kcql_routing(spark, tmp_path):
    out = str(tmp_path / "wire")
    _run(
        kcql_connector_sink(
            _stream(spark, tmp_path),
            "INSERT INTO analytics.users SELECT user_id, score FROM people PK user_id",
            system="rethink",
            transport=file_sql_transport(out, "json"),
            checkpoint=str(tmp_path / "ck"),
        )
    )
    assert all(p["conflict"] == "error" for p in _payloads(out))  # INSERT mapping

    out2 = str(tmp_path / "wire2")
    _run(
        kcql_connector_sink(
            _stream(spark, tmp_path),
            "INSERT INTO scores SELECT user_id, score FROM people "
            "PK user_id STOREAS MAP",
            system="hazelcast",
            transport=file_sql_transport(out2, "json"),
            checkpoint=str(tmp_path / "ck2"),
        )
    )
    payloads = _payloads(out2)
    assert all(p["structure"] == "map" and p["target"] == "scores" for p in payloads)
