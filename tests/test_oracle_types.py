"""Static oracle audits over the WHOLE registry (no Spark needed).

Rule from round 1's only correctness failure (dq_audit): DuckDB
promotes integer sums to HUGEINT and fixed-point literals to DECIMAL,
which the driver's typed-value hash treats as a different value class
than Spark's BIGINT/DOUBLE — so no oracle may emit
HUGEINT/DECIMAL/unsigned columns. This was a NOTES.md checklist item;
now it is a test: every registered oracle is PLANNED in DuckDB (types
come from the planner — nothing executes) and its output types checked.
"""

import duckdb
import pytest

from kafka_stream_spark.registry import load_all

SPECS = load_all()
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
BAD = ("HUGEINT", "DECIMAL", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "name", sorted(n for n, s in SPECS.items() if s.oracle is not None)
)
def test_oracle_output_types_are_hashable(name, duck):
    rel = duck.sql(SPECS[name].oracle)
    offenders = [
        (col, str(t))
        for col, t in zip(rel.columns, rel.types)
        if any(b in str(t).upper() for b in BAD)
    ]
    assert not offenders, (
        f"{name}: oracle emits driver-unhashable types {offenders} — "
        "CAST to BIGINT/DOUBLE at the final projection"
    )
