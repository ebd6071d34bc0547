"""Kudu and VoltDB sink families (S12 long tail): rendered-statement
round trips through the streaming path with file transports, KCQL
routing incl. the Kudu ``DISTRIBUTEBY ... INTO n BUCKETS`` extension,
and insert/upsert mode mapping.
"""

import glob
import re

from kafka_stream_spark.plans import kcql
from kafka_stream_spark.streaming.connector_sinks import kcql_connector_sink
from kafka_stream_spark.streaming.kudu import file_sql_transport, kudu_sink
from kafka_stream_spark.streaming.voltdb import voltdb_sink

SCHEMA = "device_id long, model string, temp double, failed boolean"
ROWS = [(i, f"ST4000-{i % 3}", 20.5 + i, i % 4 == 0) for i in range(12)]


def _stream(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).write.parquet(src)
    return spark.readStream.schema(SCHEMA).parquet(src)


def _run(writer):
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(60)


def _batches(out):
    return [open(p).read() for p in glob.glob(f"{out}/batch-*.sql")]


def test_kcql_distributeby_parses():
    stmt = kcql.parse(
        "UPSERT INTO metrics SELECT device_id, temp FROM telemetry "
        "PK device_id DISTRIBUTEBY device_id, model INTO 8 BUCKETS"
    )
    assert stmt.write_mode == "upsert"
    assert stmt.distributeby == ("device_id", "model")
    assert stmt.buckets == 8


def test_kudu_sink_renders_upserts_with_bucket_colocation(spark, tmp_path):
    out = str(tmp_path / "wire")
    _run(
        kudu_sink(
            _stream(spark, tmp_path),
            "impala::default.telemetry",
            ["device_id"],
            file_sql_transport(out),
            str(tmp_path / "ck"),
            buckets=4,
            max_batch=3,
        )
    )
    batches = _batches(out)
    stmts = [s for b in batches for s in b.splitlines()]
    assert len(stmts) == len(ROWS)
    assert all(
        s.startswith(
            "UPSERT INTO impala::default.telemetry "
            "(device_id, model, temp, failed) VALUES ("
        )
        for s in stmts
    )
    # literal rendering: numbers bare, strings quoted, booleans bare
    assert any("VALUES (0, 'ST4000-0', 20.5, true);" in s for s in stmts)
    # max_batch honored
    assert all(len(b.splitlines()) <= 3 for b in batches)
    # every id delivered exactly once
    ids = sorted(int(re.search(r"VALUES \((\d+),", s).group(1)) for s in stmts)
    assert ids == list(range(12))


def test_kudu_kcql_routing_and_insert_mode(spark, tmp_path):
    out = str(tmp_path / "wire")
    _run(
        kcql_connector_sink(
            _stream(spark, tmp_path),
            "INSERT INTO telemetry SELECT device_id, temp AS celsius "
            "FROM devices PK device_id DISTRIBUTEBY device_id INTO 2 BUCKETS",
            system="kudu",
            transport=file_sql_transport(out),
            checkpoint=str(tmp_path / "ck"),
        )
    )
    stmts = [s for b in _batches(out) for s in b.splitlines()]
    assert len(stmts) == len(ROWS)
    assert all(s.startswith("INSERT INTO telemetry (device_id, celsius) VALUES (") for s in stmts)


def test_voltdb_sink_renders_proc_calls(spark, tmp_path):
    out = str(tmp_path / "wire")
    _run(
        voltdb_sink(
            _stream(spark, tmp_path),
            "TELEMETRY",
            ["device_id"],
            file_sql_transport(out),
            str(tmp_path / "ck"),
            upsert=True,
        )
    )
    stmts = [s for b in _batches(out) for s in b.splitlines()]
    assert len(stmts) == len(ROWS)
    assert all(s.startswith("exec TELEMETRY.upsert ") for s in stmts)
    assert any("exec TELEMETRY.upsert 0, 'ST4000-0', 20.5, true;" == s for s in stmts)


def test_voltdb_kcql_routing_insert_mode(spark, tmp_path):
    out = str(tmp_path / "wire")
    _run(
        kcql_connector_sink(
            _stream(spark, tmp_path),
            "INSERT INTO TELEMETRY SELECT device_id, model FROM devices PK device_id",
            system="voltdb",
            transport=file_sql_transport(out),
            checkpoint=str(tmp_path / "ck"),
        )
    )
    stmts = [s for b in _batches(out) for s in b.splitlines()]
    assert len(stmts) == len(ROWS)
    assert all(s.startswith("exec TELEMETRY.insert ") for s in stmts)
