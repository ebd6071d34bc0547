"""MongoDB sink shape tests: JVM-side Extended-JSON rendering
($numberLong/$date/escaping), bulk command assembly (insertMany vs
idempotent replaceOne upserts), streaming delivery through the file
transport, and KCQL routing incl. the UPSERT INTO write mode."""

import datetime
import glob
import json

import pytest

from kafka_stream_spark.streaming.connector_sinks import kcql_connector_sink
from kafka_stream_spark.streaming.mongo import (
    bulk_commands,
    file_bulk_transport,
    mongo_sink,
    render_documents,
)

SCHEMA = "user_id long, note string, score double, ts timestamp"
TS = datetime.datetime(2026, 3, 1, 12, 0, 0)


def test_render_documents_extended_json_types(spark):
    df = spark.createDataFrame([(7, 'say "hi"', 1.5, TS)], SCHEMA)
    row = render_documents(df, ["user_id"]).collect()[0]
    assert row.doc_id == "7"
    doc = json.loads(row.doc)
    assert doc["user_id"] == {"$numberLong": "7"}
    assert doc["note"] == 'say "hi"'  # escaping survived the round-trip
    assert doc["score"] == 1.5
    assert doc["ts"] == {"$date": "2026-03-01T12:00:00.000Z"}


def test_render_documents_date_is_utc_in_non_utc_session(spark):
    # $date carries a literal 'Z': the instant must be rendered in UTC
    # even when the session timezone is not UTC (2026-03-01 is EST=UTC-5).
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # build the timestamp SQL-side so the wall clock is parsed in the
        # session timezone (Python-datetime conversion follows the OS tz)
        df = spark.sql(
            "SELECT 7L AS user_id, 'x' AS note, 1.0D AS score, "
            "to_timestamp('2026-03-01 12:00:00') AS ts"
        )
        doc = json.loads(render_documents(df, ["user_id"]).collect()[0].doc)
        assert doc["ts"] == {"$date": "2026-03-01T17:00:00.000Z"}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_render_documents_composite_and_absent_pk(spark):
    df = spark.createDataFrame([(1, "a", 2.0, TS)], SCHEMA)
    assert render_documents(df, ["user_id", "note"]).collect()[0].doc_id == "1|a"
    assert render_documents(df, None).collect()[0].doc_id is None
    with pytest.raises(ValueError, match="nope"):
        render_documents(df, ["nope"])


def test_bulk_commands_insert_and_upsert_modes():
    docs = [(str(i), '{"v":%d}' % i) for i in range(5)]
    ins = bulk_commands(docs, "db", "c", upsert=False, max_batch=2)
    assert len(ins) == 3
    first = json.loads(ins[0])
    assert first["insertMany"] == "db.c"
    assert first["documents"] == [{"v": 0}, {"v": 1}]
    ups = bulk_commands(docs, "db", "c", upsert=True, max_batch=3)
    assert len(ups) == 2
    op = json.loads(ups[0])["ops"][0]["replaceOne"]
    assert op == {"filter": {"_id": "0"}, "replacement": {"v": 0}, "upsert": True}


def test_mongo_sink_streams_all_documents(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"n{i}", float(i), TS) for i in range(12)], SCHEMA
    ).write.parquet(src)
    out = str(tmp_path / "bulk")
    q = (
        mongo_sink(
            spark.readStream.schema(SCHEMA).parquet(src),
            database="app",
            collection="events",
            pk_cols=["user_id"],
            transport=file_bulk_transport(out),
            checkpoint=str(tmp_path / "ck"),
            upsert=True,
            max_batch=5,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    seen = {}
    for p in glob.glob(f"{out}/bulk-*.json"):
        cmd = json.loads(open(p, encoding="utf-8").read())
        assert cmd["bulkWrite"] == "app.events"
        assert len(cmd["ops"]) <= 5
        for op in cmd["ops"]:
            r = op["replaceOne"]
            assert r["upsert"] is True
            seen[r["filter"]["_id"]] = r["replacement"]["score"]
    assert seen == {str(i): float(i) for i in range(12)}


def test_mongo_upsert_requires_pk(spark, tmp_path):
    df = spark.readStream.schema(SCHEMA).parquet(str(tmp_path))
    with pytest.raises(ValueError, match="PK"):
        mongo_sink(df, "d", "c", None, lambda s: None, "ck", upsert=True)


def test_kcql_mongo_routing_upsert_mode(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "x", float(i), TS) for i in range(6)], SCHEMA
    ).write.parquet(src)
    out = str(tmp_path / "bulk")
    q = kcql_connector_sink(
        spark.readStream.schema(SCHEMA).parquet(src),
        "UPSERT INTO app.users SELECT user_id, score FROM events PK user_id",
        system="mongo",
        transport=file_bulk_transport(out),
        checkpoint=str(tmp_path / "ck"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(60)
    ops = []
    for p in glob.glob(f"{out}/bulk-*.json"):
        ops += json.loads(open(p, encoding="utf-8").read())["ops"]
    assert len(ops) == 6
    # KCQL projection reached the document: only user_id + score fields
    assert set(ops[0]["replaceOne"]["replacement"]) == {"user_id", "score"}


def test_kcql_mongo_requires_database_collection(spark, tmp_path):
    with pytest.raises(ValueError, match="database.collection"):
        kcql_connector_sink(
            spark.readStream.schema(SCHEMA).parquet(str(tmp_path)),
            "INSERT INTO plain SELECT user_id FROM events PK user_id",
            system="mongo",
            transport=lambda s: None,
            checkpoint=str(tmp_path / "ck"),
        )
