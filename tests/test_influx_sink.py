"""InfluxDB line-protocol rendering: escaping rules, type suffixes,
nanosecond timestamps, canonical tag order, and streaming delivery."""

import datetime
import glob

from kafka_stream_spark.streaming.influx import (
    file_write_transport,
    influx_sink,
    line_protocol,
)

TS = datetime.datetime(2026, 3, 1, 12, 0, 0)
TS_NS = int(TS.replace(tzinfo=datetime.timezone.utc).timestamp()) * 10**9


def test_basic_line(spark):
    df = spark.createDataFrame(
        [("eu", "web", 42, 1.5, TS)],
        "region string, svc string, n long, load double, ts timestamp",
    )
    line = line_protocol(df, "metrics", ["region", "svc"], ["n", "load"], "ts").collect()[0].line
    assert line == f"metrics,region=eu,svc=web n=42i,load=1.5 {TS_NS}"


def test_tags_sorted_and_escaped(spark):
    df = spark.createDataFrame(
        [("us west", "a=b,c", 1.0, TS)],
        "zone string, app string, v double, ts timestamp",
    )
    line = line_protocol(df, "my metric", ["zone", "app"], ["v"], "ts").collect()[0].line
    # measurement space escaped; tags in key order (app before zone);
    # tag values escape comma/equals/space
    assert line.startswith("my\\ metric,app=a\\=b\\,c,zone=us\\ west ")


def test_string_and_bool_fields(spark):
    df = spark.createDataFrame(
        [('say "hi" \\ bye', True, TS)], "msg string, ok boolean, ts timestamp"
    )
    line = line_protocol(df, "m", [], ["msg", "ok"], "ts").collect()[0].line
    assert 'msg="say \\"hi\\" \\\\ bye",ok=true ' in line


def test_requires_fields(spark):
    df = spark.createDataFrame([(1.0, TS)], "v double, ts timestamp")
    try:
        line_protocol(df, "m", [], [], "ts")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_influx_sink_streams_batched_lines(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(f"h{i % 3}", float(i), TS) for i in range(40)],
        "host string, v double, ts timestamp",
    ).write.parquet(src)
    out = str(tmp_path / "lp_out")
    q = (
        influx_sink(
            spark.readStream.schema("host string, v double, ts timestamp").parquet(src),
            measurement="cpu",
            tag_cols=["host"],
            field_cols=["v"],
            ts_col="ts",
            transport=file_write_transport(out),
            checkpoint=str(tmp_path / "ckpt"),
            max_lines_per_call=16,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)

    values = set()
    for path in glob.glob(f"{out}/write-*.lp"):
        lines = open(path, encoding="utf-8").read().split("\n")
        assert 1 <= len(lines) <= 16  # batch bound honored
        for line in lines:
            assert line.startswith("cpu,host=h")
            values.add(line.split("v=")[1].split(" ")[0])
    assert values == {f"{float(i)}" for i in range(40)}  # all delivered
