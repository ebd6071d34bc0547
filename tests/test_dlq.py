"""Dead-letter routing: bad records split out with raw bytes preserved;
good records decode; both branches work in batch and streaming."""

import pyspark.sql.functions as F

from kafka_stream_spark.sources.topics import FileTopic
from kafka_stream_spark.streaming.dlq import decode_json_with_dlq

SCHEMA = "serial_number STRING, failure INT"


def _topic(spark, tmp_path):
    t = FileTopic(spark, str(tmp_path), "smart", partitions=1)
    rows = [
        ("s1", '{"serial_number": "s1", "failure": 0}'),
        ("s2", '{"serial_number": "s2", "failure": 1}'),
        ("s3", "{definitely not json"),
        ("s4", None),
    ]
    t.append(spark.createDataFrame(rows, "key string, value string"))
    return t


def test_dlq_split_batch(spark, tmp_path):
    t = _topic(spark, tmp_path)
    ok, dead = decode_json_with_dlq(t.read(), SCHEMA)
    good = {(bytes(r.key).decode(), r.serial_number, r.failure) for r in ok.collect()}
    assert good == {("s1", "s1", 0), ("s2", "s2", 1)}
    dl = {(bytes(r.key).decode(), r.error) for r in dead.collect()}
    assert dl == {("s3", "json_parse_error"), ("s4", "null_payload")}
    # raw bytes preserved for replay after a schema fix
    raw = {
        bytes(r.key).decode(): (bytes(r.raw_value).decode() if r.raw_value else None)
        for r in dead.collect()
    }
    assert raw["s3"] == "{definitely not json"
    # offsets retained so the DLQ row is traceable to its source record
    assert all(r.offset >= 0 and r.partition == 0 for r in dead.collect())


def test_dlq_split_streaming(spark, tmp_path):
    t = _topic(spark, tmp_path / "t")
    stream = t.read_stream()
    ok, dead = decode_json_with_dlq(stream, SCHEMA)
    qs = []
    for name, df in (("dlq_ok", ok), ("dlq_dead", dead)):
        qs.append(
            df.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
    for q in qs:
        q.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM dlq_ok").first().c == 2
    errs = {r.error for r in spark.sql("SELECT error FROM dlq_dead").collect()}
    assert errs == {"json_parse_error", "null_payload"}
