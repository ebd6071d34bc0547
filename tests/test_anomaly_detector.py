"""Welford streaming anomaly detector: state equals the one-pass batch
computation regardless of micro-batching; planted outliers alert."""

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_stream_spark.streaming.stateful import anomaly_detector

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("event_id", LongType()),
        StructField("v", DoubleType()),
    ]
)


def _reference_alerts(rows, z_threshold=3.0, min_n=10):
    """Causal one-pass reference: score against prior stats, then fold."""
    state: dict = {}
    alerts = []
    for k, eid, v in sorted(rows, key=lambda r: (r[0], r[1])):
        n, mean, m2 = state.get(k, (0, 0.0, 0.0))
        if n >= min_n:
            var = m2 / (n - 1)
            if var > 0:
                z = (v - mean) / var**0.5
                if abs(z) >= z_threshold:
                    alerts.append((k, eid, round(z, 6), n))
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)
        state[k] = (n, mean, m2)
    return alerts, state


@pytest.fixture()
def anomaly_rows():
    # steady signal around 10 with two planted spikes per key
    rows = []
    for k in ("a", "b"):
        base = 10.0 if k == "a" else 50.0
        for i in range(40):
            rows.append((k, i, base + (i % 7) * 0.5))
        rows.append((k, 100, base + 40.0))   # clear spike
        rows.append((k, 101, base - 35.0))   # clear dip
    return rows


def test_alerts_match_causal_reference(spark, tmp_path, anomaly_rows):
    path = str(tmp_path / "src")
    # three CONTIGUOUS micro-batches (ids stay increasing per key across
    # batches): the processor replays in id order within each batch, so
    # contiguous batching reproduces the causal full-stream order
    ordered = sorted(anomaly_rows, key=lambda r: (r[0], r[1]))
    third = (len(ordered) + 2) // 3
    for i in range(3):
        chunk = ordered[i * third : (i + 1) * third]
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = anomaly_detector(stream.groupBy("k"), "k", "v", "event_id")
    q = (
        out.writeStream.format("memory")
        .queryName("anomalies")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.key, r.event_id): (r.zscore, r.n_seen)
        for r in spark.sql("SELECT * FROM anomalies").collect()
    }

    # NOTE: the reference replays each key's FULL stream in id order; the
    # processor replays in id order *within* each micro-batch. With the
    # modulo split, ids stay globally ordered across batches per key, so
    # the two must agree exactly.
    expect_alerts, _ = _reference_alerts(anomaly_rows)
    assert got == {
        (k, eid): (z, n) for k, eid, z, n in expect_alerts
    }
    # both planted anomalies per key fired; steady traffic did not
    for k in ("a", "b"):
        fired = {eid for kk, eid in got if kk == k}
        assert {100, 101} <= fired
        assert all(eid >= 100 for eid in fired)
