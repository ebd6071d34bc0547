"""Fold-law tests on adversarial synthetic events: the fixed parquet
exercises one benign distribution; these frames force the edge shapes
(single-day users, all-debit users, clamp chains, missing calendar
days) and check the operators against independent pure-Python folds."""

import datetime
import random

from kafka_stream_spark.registry import load_all

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
T0 = datetime.datetime(2026, 1, 1)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        f"{path}/events.parquet"
    )


def test_capped_balance_matches_python_fold(spark, tmp_path):
    rng = random.Random(7)
    rows, eid = [], 0
    for uid in range(40):
        style = rng.choice(["normal", "all_debit", "one_day", "gappy"])
        days = (
            [0] if style == "one_day"
            else sorted(rng.sample(range(20), rng.randint(2, 12)))
        )
        for d in days:
            for _ in range(rng.randint(1, 3)):
                if style == "all_debit":
                    etype = "error"
                else:
                    etype = rng.choice(["purchase", "error", "click"])
                rows.append(
                    (eid, T0 + datetime.timedelta(days=d, seconds=eid % 100),
                     uid, etype, round(rng.uniform(0.01, 99.99), 2), "{}")
                )
                eid += 1
    _write_events(spark, str(tmp_path), rows)

    got = {
        r.user_id: (r.n_days, r.balance_cents, r.n_clamped_days)
        for r in load_all()["capped_running_balance"]
        .build(spark, str(tmp_path))
        .collect()
    }

    # independent python fold over the same definition
    daily = {}
    for (_, ts, uid, etype, value, _p) in rows:
        if etype not in ("purchase", "error"):
            continue
        cents = round(value * 100)
        key = (uid, ts.date())
        daily[key] = daily.get(key, 0) + (cents if etype == "purchase" else -cents)
    by_user = {}
    for (uid, day), delta in daily.items():
        by_user.setdefault(uid, []).append((day, delta))
    for uid, series in by_user.items():
        series.sort()
        bal, nc = 0, 0
        for i, (_, delta) in enumerate(series):
            if i == 0:
                bal = max(delta, 0)
                nc = 1 if delta < 0 else 0
            else:
                nxt = bal + delta
                if nxt < 0:
                    nc += 1
                bal = max(nxt, 0)
        assert got[uid] == (len(series), bal, nc), uid
        assert bal >= 0
    assert set(got) == set(by_user)


def test_holt_matches_python_fold(spark, tmp_path):
    rng = random.Random(11)
    rows, eid = [], 0
    # three types with different day coverage incl. a 2-day minimal series
    coverage = {"alpha": range(15), "beta": [0, 1], "gamma": [0, 3, 4, 9, 10]}
    for etype, days in coverage.items():
        for d in days:
            rows.append(
                (eid, T0 + datetime.timedelta(days=d), eid % 5, etype,
                 round(rng.uniform(1, 500), 2), "{}")
            )
            eid += 1
    _write_events(spark, str(tmp_path), rows)

    got = {
        r.event_type: (r.n_days, r.level_value, r.trend_value, r.forecast_next)
        for r in load_all()["holt_trend_forecast"].build(spark, str(tmp_path)).collect()
    }

    daily = {}
    for (_, ts, _u, etype, value, _p) in rows:
        key = (etype, ts.date())
        daily[key] = daily.get(key, 0) + round(value * 100)
    series = {}
    for (etype, day), cents in daily.items():
        series.setdefault(etype, []).append((day, float(cents)))
    for etype, ser in series.items():
        ser.sort()
        xs = [v for _, v in ser]
        level, trend = xs[1], xs[1] - xs[0]
        for x in xs[2:]:
            new_level = 0.5 * x + 0.5 * (level + trend)
            trend = 0.5 * (new_level - level) + 0.5 * trend
            level = new_level
        assert got[etype] == (
            len(xs),
            round(level / 100, 6),
            round(trend / 100, 6),
            round((level + trend) / 100, 6),
        ), etype
