"""KCQL-subset parser tests (SURVEY.md §2.3 P1; KCQL 0.3.0 public grammar)."""

import pytest

from kafka_stream_spark.plans import kcql


def test_parse_full_statement():
    s = kcql.parse(
        "INSERT INTO target SELECT f1, f2 AS x FROM topicA IGNORE f3 PK f1 "
        "WITHWHERE f2 > 5 LIMIT 10 AUTOCREATE STOREAS AVRO"
    )
    assert s.target == "target"
    assert s.source == "topicA"
    assert s.projections == (("f1", None), ("f2", "x"))
    assert s.ignore == ("f3",)
    assert s.pk == ("f1",)
    assert s.where == "f2 > 5"
    assert s.limit == 10
    assert s.storeas == "AVRO"


def test_parse_star():
    s = kcql.parse("INSERT INTO t SELECT * FROM src")
    assert s.is_star


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        kcql.parse("SELECT nope")


def test_apply_projection_rename(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["f1", "f2", "f3"])
    s = kcql.parse("INSERT INTO t SELECT f1, f2 AS x FROM src")
    out = kcql.apply(df, s)
    assert out.columns == ["f1", "x"]


def test_apply_star_with_ignore(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["f1", "f2", "f3"])
    s = kcql.parse("INSERT INTO t SELECT * FROM src IGNORE f2")
    assert kcql.apply(df, s).columns == ["f1", "f3"]


def test_apply_where_and_limit(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    s = kcql.parse("INSERT INTO t SELECT v FROM src WITHWHERE v >= 5 LIMIT 3")
    assert kcql.apply(df, s).count() == 3


def test_run_unknown_source(spark):
    with pytest.raises(KeyError):
        kcql.run("INSERT INTO t SELECT a FROM nope", {})
