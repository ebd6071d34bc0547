"""SQL-declared scalar functions: registration, parity with the
operator-module expressions, plan inlining (no Python stage), and use
from the Lenses shell's SQL fall-through."""

import pyspark.sql.functions as F
import pytest

from kafka_stream_spark.functions.sql_udfs import register_sql_functions


@pytest.fixture(scope="module")
def funcs(spark):
    return register_sql_functions(spark)


def test_registration_idempotent(spark, funcs):
    assert "quality_score" in funcs
    assert register_sql_functions(spark) == funcs  # re-register is fine


def test_parity_with_dataframe_expressions(spark, funcs, sf_dir):
    from kafka_stream_spark.operators._common import load

    (docs,) = load(spark, sf_dir, "documents")
    docs.limit(50).createOrReplaceTempView("d50")
    got = {
        r.doc_id: r
        for r in spark.sql(
            "SELECT doc_id, ws_token_count(text) AS n, "
            "doc_fingerprint(text) AS fp, quality_score(text) AS q "
            "FROM d50"
        ).collect()
    }
    want = {
        r.doc_id: r
        for r in docs.limit(50).select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n"),
            F.md5(F.array_join(
                F.array_sort(F.array_distinct(F.split("text", " "))), " "
            ).cast("binary")).alias("fp"),
        ).collect()
    }
    assert set(got) == set(want)
    for d in got:
        assert got[d].n == want[d].n
        assert got[d].fp == want[d].fp
        assert 0.0 <= got[d].q <= 1.0


def test_partitioner_matches_filetopic(spark, funcs, tmp_path):
    from kafka_stream_spark.sources.topics import FileTopic

    t = FileTopic(spark, str(tmp_path / "topics"), "pf", partitions=4)
    t.append(spark.createDataFrame(
        [(f"key-{i}", f"v{i}".encode()) for i in range(30)],
        "key string, value binary"))
    actual = {bytes(r.key).decode(): r.partition
              for r in t.read().collect()}
    rows = spark.sql(
        "SELECT k, topic_partition_for(k, 4) AS p FROM "
        "VALUES " + ", ".join(f"('key-{i}')" for i in range(30)) + " AS t(k)"
    ).collect()
    assert {r.k: r.p for r in rows} == actual


def test_ns_to_ts(spark, funcs):
    row = spark.sql(
        "SELECT ns_to_ts(1700000000123456789) AS ts").collect()[0]
    assert str(row.ts).startswith("2023-11-14")


def test_sql_udf_inlines_no_python_stage(spark, funcs, sf_dir):
    from kafka_stream_spark.operators._common import load

    (docs,) = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_v")
    plan = spark.sql(
        "SELECT quality_score(text) FROM docs_v"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # inlined Catalyst expression, not a UDF
    assert "BatchEvalPython" not in plan


def test_shell_can_call_sql_udfs(spark, funcs, sf_dir):
    from kafka_stream_spark.catalog import Catalog
    from kafka_stream_spark.plans.lenses_sql import LensesShell

    shell = LensesShell(Catalog(spark, sf_dir))
    rows = shell.execute(
        "SELECT doc_id, ws_token_count(text) AS n FROM documents "
        "ORDER BY doc_id LIMIT 5"
    ).collect()
    assert len(rows) == 5 and all(r.n > 0 for r in rows)
