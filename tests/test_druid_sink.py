"""Druid sink analog (streaming/druid.py): ingest rollup, segment
versioning/overshadowing, shard-additive streaming, torn-publish
invisibility."""

import os

import pyspark.sql.functions as F
import pytest

from kafka_stream_spark.streaming.druid import (
    IngestionSpec,
    druid_sink,
    publish_segments,
    query_rollup,
    read_datasource,
    rollup,
    used_segments,
)

SPEC = IngestionSpec(
    datasource="wiki",
    ts_col="ts",
    dimensions=("page",),
    metrics={
        "edits": ("count", "ts"),
        "chars": ("longSum", "delta"),
        "max_delta": ("longMax", "delta"),
    },
    query_granularity="hour",
    segment_granularity="day",
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, page string, delta bigint")


@pytest.fixture()
def raw(spark):
    import datetime as dt

    def t(day, hour, minute):
        return dt.datetime(2024, 3, day, hour, minute)

    return _events(
        spark,
        [
            (t(1, 10, 5), "a", 100),
            (t(1, 10, 40), "a", 50),   # same hour+page → rolls up
            (t(1, 10, 55), "b", 10),
            (t(1, 23, 1), "a", 7),
            (t(2, 0, 2), "b", 30),     # second day → second segment
        ],
    )


def _as_map(df):
    return {
        (str(r["__time"]), r["page"]): (r["edits"], r["chars"], r["max_delta"])
        for r in df.collect()
    }


def test_rollup_aggregates_at_query_granularity(spark, raw):
    got = _as_map(rollup(raw, SPEC))
    assert got[("2024-03-01 10:00:00", "a")] == (2, 150, 100)
    assert got[("2024-03-01 10:00:00", "b")] == (1, 10, 10)
    assert got[("2024-03-01 23:00:00", "a")] == (1, 7, 7)
    assert got[("2024-03-02 00:00:00", "b")] == (1, 30, 30)


def test_publish_and_overshadow(spark, raw, tmp_path):
    out = str(tmp_path / "deep")
    descs = publish_segments(rollup(raw, SPEC), SPEC, out, version="0000000000")
    assert {d["interval_start"] for d in descs} == {
        "2024-03-01T00.00.00", "2024-03-02T00.00.00"
    }
    before = _as_map(query_rollup(spark, out, SPEC))

    # re-publish day 1 only, higher version, different values
    fix = _events(spark, [(__import__("datetime").datetime(2024, 3, 1, 10, 5), "a", 999)])
    publish_segments(rollup(fix, SPEC), SPEC, out, version="0000000001")
    after = _as_map(query_rollup(spark, out, SPEC))

    # day 1 is served ONLY by the new version (old shards overshadowed)…
    assert after[("2024-03-01 10:00:00", "a")] == (1, 999, 999)
    assert ("2024-03-01 23:00:00", "a") not in after
    # …day 2 still serves the old version untouched
    assert after[("2024-03-02 00:00:00", "b")] == before[("2024-03-02 00:00:00", "b")]


def test_republish_same_slot_is_idempotent(spark, raw, tmp_path):
    out = str(tmp_path / "deep")
    publish_segments(rollup(raw, SPEC), SPEC, out, version="0000000000")
    first = _as_map(query_rollup(spark, out, SPEC))
    publish_segments(rollup(raw, SPEC), SPEC, out, version="0000000000")
    assert _as_map(query_rollup(spark, out, SPEC)) == first
    assert len(used_segments(out, "wiki")) == 2


def test_streaming_shards_reaggregate_to_batch_rollup(spark, raw, tmp_path):
    # land the raw rows as 3 files → 3 micro-batches → 3 additive shards
    src = str(tmp_path / "src")
    for i, chunk in enumerate([(0, 2), (2, 4), (4, 5)]):
        rows = raw.collect()[chunk[0] : chunk[1]]
        _events(spark, rows).coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
    stream = (
        spark.readStream.schema("ts timestamp, page string, delta bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    out = str(tmp_path / "deep")
    q = druid_sink(stream, SPEC, out, str(tmp_path / "ck"))
    q.awaitTermination(120)

    shards = used_segments(out, "wiki")
    assert len(shards) >= 3  # additive partitionNums, one per batch
    assert _as_map(query_rollup(spark, out, SPEC)) == _as_map(rollup(raw, SPEC))

    # restart on the same checkpoint: no new input → nothing changes
    q = druid_sink(stream, SPEC, out, str(tmp_path / "ck"))
    q.awaitTermination(120)
    assert _as_map(query_rollup(spark, out, SPEC)) == _as_map(rollup(raw, SPEC))


def test_torn_publish_is_invisible(spark, raw, tmp_path):
    out = str(tmp_path / "deep")
    publish_segments(rollup(raw, SPEC), SPEC, out, version="0000000000")
    n = len(used_segments(out, "wiki"))
    # a crash between data land and descriptor write leaves a dir
    # without the marker — readers must not see it
    torn = os.path.join(out, "wiki", "2024-03-03T00.00.00_0000000007_0")
    os.makedirs(torn)
    assert len(used_segments(out, "wiki")) == n
    read_datasource(spark, out, "wiki")  # still readable


def test_bad_aggregator_rejected():
    with pytest.raises(ValueError, match="unsupported aggregator"):
        IngestionSpec("x", "ts", ("d",), {"m": ("avg", "v")})

def test_version_pattern_enforced(spark, raw, tmp_path):
    # used_segments picks the top version lexicographically; free-form
    # versions ('2' vs '10', underscores) would overshadow the wrong
    # shards, so publish rejects them up front (ADVICE r5)
    rolled = rollup(raw, SPEC)
    out = str(tmp_path / "druid")
    for bad in ["2", "10", "v_1", "0001_0002", "release-1"]:
        with pytest.raises(ValueError, match="zero-padded"):
            publish_segments(rolled, SPEC, out, version=bad)
    # the two sanctioned families pass validation (one datasource each —
    # the family pins at first publish)
    publish_segments(rolled, SPEC, out, version="0000000003")
    publish_segments(
        rolled, SPEC, str(tmp_path / "druid_ts"), version="2026-08-15T12.30.00"
    )


def test_version_family_pinned_per_datasource(spark, raw, tmp_path):
    # counter and timestamp versions are each lexicographically ordered
    # WITHIN their family, but a timestamp always outranks a counter
    # ('2026-…' > '0000000042') — mixing them would silently overshadow
    # newer counter-versioned shards, so the family pins at first publish
    out = str(tmp_path / "deep")
    publish_segments(rollup(raw, SPEC), SPEC, out, version="0000000042")
    with pytest.raises(ValueError, match="pinned at first publish"):
        publish_segments(
            rollup(raw, SPEC), SPEC, out, version="2026-01-01T00.00.00"
        )
    # same family keeps publishing fine
    publish_segments(rollup(raw, SPEC), SPEC, out, version="0000000043")

    # and the reverse pin: timestamp-first rejects a counter
    out2 = str(tmp_path / "deep2")
    publish_segments(
        rollup(raw, SPEC), SPEC, out2, version="2026-01-01T00.00.00"
    )
    with pytest.raises(ValueError, match="pinned at first publish"):
        publish_segments(rollup(raw, SPEC), SPEC, out2, version="0000000001")
