"""Lenses-SQL dialect shell tests (SURVEY.md §3.3 entry point C +
§2.11 admin surface: SHOW/DESCRIBE/SET alongside plain Catalyst SQL)."""

from kafka_stream_spark.catalog import Catalog
from kafka_stream_spark.plans.lenses_sql import LensesShell

SF_DIR = "/root/testdata/sf0.001"


def _shell(spark):
    return LensesShell(Catalog(spark, SF_DIR))


def test_show_topics(spark):
    out = _shell(spark).execute("SHOW TOPICS").collect()
    topics = {r.topic for r in out}
    assert {"lineitem", "orders", "events", "documents"} <= topics
    row = {r.topic: r.n_columns for r in out}
    assert row["lineitem"] == 11


def test_describe_topic(spark):
    out = _shell(spark).execute("DESCRIBE TOPIC orders").collect()
    cols = {r.column: r.type for r in out}
    assert cols["o_orderkey"] == "bigint"
    assert cols["o_totalprice"] == "double"
    # DESCRIBE without the TOPIC keyword also works
    assert _shell(spark).execute("DESCRIBE orders").count() == len(cols)


def test_set_statement(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    sh = _shell(spark)
    try:
        sh.execute("SET 'spark.sql.shuffle.partitions' = '17';")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "17"
        sh.execute("SET spark.sql.shuffle.partitions=32")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "32"
    finally:  # don't leak the SET into the rest of the shared session
        sh.execute(f"SET spark.sql.shuffle.partitions={prev}")


def test_plain_sql_passthrough(spark):
    out = _shell(spark).execute(
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    assert out.count() == 5


def test_insert_into_select_materializes_view(spark):
    sh = _shell(spark)
    res = sh.execute(
        "INSERT INTO big_orders SELECT o_orderkey, o_totalprice "
        "FROM orders WHERE o_totalprice > 400000"
    )
    n = res.count()
    # the processor target is queryable as a view afterwards
    assert sh.execute("SELECT count(*) AS n FROM big_orders").collect()[0].n == n


def test_show_queries_lists_active(spark):
    out = _shell(spark).execute("SHOW QUERIES")
    assert out.columns == ["name", "id", "active"]


def test_register_topic_system_fields_browse(spark, tmp_path):
    # Lenses browse conventions: _key / _value.field / _partition / _offset
    # / _ts queryable verbatim (AIS-shaped JSON values, the reference's
    # sea_vessel topic shape)
    import pyspark.sql.functions as F

    from kafka_stream_spark.sources.topics import FileTopic

    t = FileTopic(spark, str(tmp_path), "vessels", partitions=2)
    rows = [
        ('{"MMSI": 1}', '{"MMSI": 1, "Speed": 0.0, "Latitude": 37.1}'),
        ('{"MMSI": 2}', '{"MMSI": 2, "Speed": 5.5, "Latitude": 37.2}'),
        ('{"MMSI": 3}', '{"MMSI": 3, "Speed": 9.9, "Latitude": 37.3}'),
    ]
    t.append(spark.createDataFrame(rows, ["key", "value"]))
    shell = _shell(spark)
    shell.register_topic(t, "MMSI LONG, Speed DOUBLE, Latitude DOUBLE")
    out = shell.execute(
        "SELECT _key, _value.Speed AS speed, _partition, _offset "
        "FROM vessels WHERE _value.Speed > 0 ORDER BY speed LIMIT 10"
    ).collect()
    assert [r.speed for r in out] == [5.5, 9.9]
    assert all(r._key is not None and r._offset >= 0 for r in out)
    # metadata predicate: partition addressing works like Lenses
    parts = {r._partition for r in shell.execute(
        "SELECT _partition FROM vessels").collect()}
    assert parts <= {0, 1}


def test_explain_returns_plan_rows(spark):
    sh = _shell(spark)
    sh.execute("SELECT 1").count()  # warm
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView(
        "sh_orders"
    )
    out = sh.execute(
        "EXPLAIN SELECT o_orderpriority, count(*) FROM sh_orders"
        " WHERE o_totalprice > 1000 GROUP BY o_orderpriority;"
    ).collect()
    text = "\n".join(r.plan for r in out)
    assert "HashAggregate" in text or "Aggregate" in text
    # the physical plan must show the filter pushed into the scan
    assert "PushedFilters" in text or "Filter" in text
    ext = sh.execute(
        "EXPLAIN EXTENDED SELECT count(*) FROM sh_orders"
    ).collect()
    ext_text = "\n".join(r.plan for r in ext)
    for phase in ("Parsed Logical Plan", "Analyzed Logical Plan",
                  "Optimized Logical Plan", "Physical Plan"):
        assert phase in ext_text
