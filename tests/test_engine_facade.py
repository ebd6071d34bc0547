"""Engine facade: the single front door composes catalog/shell/registry/
schemas/pipelines/topics without adding logic of its own."""

import pytest

from kafka_stream_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, sf_dir, tmp_path_factory):
    return Engine(spark, sf_dir, topic_root=str(tmp_path_factory.mktemp("topics")))


def test_sql_and_browse(eng):
    n = eng.sql("SELECT count(*) AS n FROM orders").collect()[0].n
    assert n > 0
    rows = eng.browse("orders", where="o_totalprice > 0", limit=5).collect()
    assert 0 < len(rows) <= 5


def test_shell_dialect(eng):
    topics = {r[0] for r in eng.shell("SHOW TOPICS").collect()}
    assert {"orders", "events", "documents"} <= topics


def test_registered_queries(eng):
    names = eng.queries()
    assert "q1_pricing_summary" in names and len(names) >= 160
    assert eng.query("q1_pricing_summary").count() > 0
    assert "dedup" in eng.describe("dedup_minhash_lsh").lower() or eng.describe(
        "dedup_minhash_lsh"
    )
    with pytest.raises(KeyError):
        eng.query("nope")


def test_schema_and_pipeline_surfaces(eng):
    # surfaces exist and are live objects (full behavior covered in their
    # own suites) — the facade must hand back the real things
    from kafka_stream_spark.schema_registry import SchemaRegistry
    from kafka_stream_spark.streaming.pipelines import PipelineRegistry

    assert isinstance(eng.schemas, SchemaRegistry)
    assert isinstance(eng.pipelines, PipelineRegistry)


def test_topics_roundtrip(eng, spark):
    t = eng.topic("clicks", partitions=2)
    df = spark.createDataFrame([("k1", b"v1"), ("k2", b"v2")], "key string, value binary")
    t.append(df)
    got = {bytes(r.value) for r in t.read().collect()}
    assert got == {b"v1", b"v2"}


def test_topics_require_root(spark, sf_dir):
    with pytest.raises(ValueError, match="topic_root"):
        Engine(spark, sf_dir).topic("x")


def test_proxy_surface(eng):
    """The fourth reference surface: a started REST proxy sharing the
    engine's topic root and schema registry."""
    import json
    import urllib.request

    srv = eng.proxy()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/topics/facade_demo",
            data=json.dumps({"records": [{"value": {"k": 1}}]}).encode(),
            method="POST",
        )
        req.add_header("Content-Type", "application/vnd.kafka.json.v1+json")
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
        assert eng.topic("facade_demo").read().count() == 1
    finally:
        srv.stop()


def test_topic_df_and_stream_surface(eng, spark, tmp_path):
    t = eng.topic("ds_clicks", partitions=2)
    df = spark.createDataFrame(
        [("a", b"x1"), ("b", b"x2"), ("c", b"x3")], "key string, value binary")
    t.append(df)
    got = eng.topic_df("ds_clicks").collect()
    assert {bytes(r.value) for r in got} == {b"x1", b"x2", b"x3"}
    # streaming leg through the same source
    out, ck = str(tmp_path / "o"), str(tmp_path / "c")
    q = (eng.topic_stream("ds_clicks")
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 3


def test_dump_and_load_segments(eng, tmp_path):
    t = eng.topic("segfacade", partitions=2)
    t.append(
        eng.spark.createDataFrame(
            [(f"k{i}".encode(), f"v{i}".encode()) for i in range(6)],
            "key binary, value binary",
        )
    )
    out = str(tmp_path / "segs")
    files = eng.dump_segments("segfacade", out)
    assert files and all(f.endswith(".log") for f in files)
    back = eng.load_segments(out).collect()
    assert sorted(bytes(r.value) for r in back) == sorted(
        f"v{i}".encode() for i in range(6)
    )
