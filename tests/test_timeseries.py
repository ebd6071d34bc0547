"""Semantic invariants for the time-series operators (beyond the oracle
equality that test_queries.py already enforces for each of them)."""

from collections import defaultdict

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.operators.timeseries import (
    rolling_stats_events,
    scd2_user_state,
    zscore_outlier_events,
)


def test_rolling_frame_counts_trailing_hour_exactly(spark, sf_dir):
    """Brute-force the trailing-hour count per event and compare."""
    rows = rolling_stats_events(spark, sf_dir).collect()
    assert rows
    (events,) = load(spark, sf_dir, "events")
    by_user = defaultdict(list)
    for r in events.select("user_id", "ts").collect():
        by_user[r.user_id].append(r.ts)
    for r in rows[:500]:
        lo = r.ts.timestamp() - 3600
        expect = sum(1 for t in by_user[r.user_id] if lo <= t.timestamp() <= r.ts.timestamp())
        assert r.n_1h == expect, (r.event_id, r.n_1h, expect)


def test_scd2_intervals_tile_per_user(spark, sf_dir):
    """Per user: versions are 1..n, each valid_to equals the next
    valid_from, exactly one open (NULL valid_to) interval, and no
    consecutive intervals share a state (lag-collapse really collapsed)."""
    rows = scd2_user_state(spark, sf_dir).collect()
    assert rows
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    for user, ivs in per_user.items():
        ivs.sort(key=lambda r: r.version)
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        opens = [r for r in ivs if r.valid_to is None]
        assert opens == [ivs[-1]], user  # only the last interval is open
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, user  # intervals tile
            assert a.state != b.state, user  # real transitions only


def test_zscore_stats_side_broadcast(spark, sf_dir):
    p = (
        zscore_outlier_events(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_rolling_stats_single_data_exchange(spark, sf_dir):
    """The rolling window must cost ONE hash exchange (user_id); the only
    other exchange allowed is the presentation orderBy's range partition."""
    p = (
        rolling_stats_events(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange hashpartitioning") == 1
