"""Druid sink analog — ingest-time rollup into versioned, time-chunked
segments (SURVEY.md §2.1 S12: ``kafka-connect-druid`` ships in the
reference's Stream Reactor 0.3.0 bundle, Dockerfile:43-47).

What must survive re-implementation is Druid's PUBLIC ingest contract
(druid.apache.org docs — segments, rollup, overshadowing), because both
its query semantics and its exactly-once story hang off it:

- **Rollup**: rows are aggregated at ingest — dimensions grouped at
  ``queryGranularity``, metrics pre-aggregated (longSum/doubleSum/
  count/min/max, the ingest-time aggregator set). The datasource stores
  the rollup, never the raw rows.
- **Segments**: data is chunked by ``segmentGranularity`` interval;
  a segment's identity is ``datasource_intervalStart_intervalEnd_
  version_partitionNum``.
- **Overshadowing**: for one interval, segments of the HIGHEST version
  overshadow all lower versions at query time (batch re-publish =
  atomic replace). Within one version, partitionNums are additive
  shards (streaming appends). This pair is exactly what makes
  re-publish and replay idempotent: a batch replace lands under a new
  version; a replayed streaming micro-batch rewrites its own
  (version, partitionNum) slot byte-for-byte.

Spark-first shape: the rollup is one partial-aggregated ``groupBy``
(map-side combine does Druid's in-heap incremental index job); the
segment write is Spark's own partitioned parquet write (one task per
interval shard) staged then renamed, with ``descriptor.json`` written
last as the visibility marker — readers only trust descriptor-bearing
segment dirs, so a crash mid-publish leaves invisible files, never a
torn segment. Query-side re-aggregation across shards is associative
(sum/count/min/max), so streamed shards re-aggregate to exactly the
all-at-once batch rollup; the equivalence test pins that.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

#: Druid ingest-time aggregators → Spark aggregate builders
_AGGS = {
    "longSum": lambda c: F.sum(F.col(c).cast("bigint")),
    "doubleSum": lambda c: F.sum(F.col(c).cast("double")),
    "count": lambda c: F.count(F.lit(1)),
    "longMin": lambda c: F.min(F.col(c).cast("bigint")),
    "longMax": lambda c: F.max(F.col(c).cast("bigint")),
    "doubleMin": lambda c: F.min(F.col(c).cast("double")),
    "doubleMax": lambda c: F.max(F.col(c).cast("double")),
}
#: accepted segment versions: 10-digit zero-padded counter, or the
#: ISO-like timestamps Druid itself uses — both fixed-width and
#: underscore-free, so lexicographic max IS the intended order
_VERSION_RE = re.compile(
    r"[0-9]{10}|\d{4}-\d{2}-\d{2}T\d{2}[.:]\d{2}[.:]\d{2}(\.\d+)?Z?"
)

#: how each aggregator re-combines across segment shards at query time
_COMBINE = {
    "longSum": F.sum, "doubleSum": F.sum, "count": F.sum,
    "longMin": F.min, "longMax": F.max, "doubleMin": F.min, "doubleMax": F.max,
}


@dataclass(frozen=True)
class IngestionSpec:
    """The dataSchema half of a Druid ingestion spec."""

    datasource: str
    ts_col: str
    dimensions: tuple[str, ...]
    #: out_name -> (aggregator type, input column)
    metrics: dict[str, tuple[str, str]] = field(default_factory=dict)
    query_granularity: str = "hour"
    segment_granularity: str = "day"

    def __post_init__(self):
        for name, (agg, _col) in self.metrics.items():
            if agg not in _AGGS:
                raise ValueError(f"unsupported aggregator {agg!r} for {name!r}")


def rollup(df: DataFrame, spec: IngestionSpec) -> DataFrame:
    """Ingest-time rollup: ``__time`` floored to queryGranularity,
    dimensions grouped, metrics pre-aggregated (one shuffle, partial
    aggregation map-side)."""
    t = F.date_trunc(spec.query_granularity, F.col(spec.ts_col)).alias("__time")
    aggs = [
        _AGGS[agg](col).alias(name) for name, (agg, col) in spec.metrics.items()
    ]
    return df.groupBy(t, *[F.col(d) for d in spec.dimensions]).agg(*aggs)


def _interval_str(c):
    return F.date_format(c, "yyyy-MM-dd'T'HH.mm.ss")


#: pin file recording which version FAMILY a datasource uses
_FAMILY_FILE = "_VERSION_FAMILY"


def _version_family(version: str) -> str:
    return "counter" if version.isdigit() else "timestamp"


def _ensure_version_family(out_dir: str, datasource: str, version: str) -> None:
    """Pin the version family (counter vs ISO timestamp) on first
    publish and reject the other family afterwards: both are
    lexicographically ordered WITHIN themselves, but ACROSS families a
    timestamp always sorts above a counter ('2026-…' > '0000000042'),
    so mixing them would silently overshadow newer counter-versioned
    shards (ADVICE r6 — the same pin-on-first-use pattern as the state
    tables' _BUCKETS file)."""
    base = os.path.join(out_dir, datasource)
    os.makedirs(base, exist_ok=True)
    fam = _version_family(version)
    pin = os.path.join(base, _FAMILY_FILE)
    if os.path.isfile(pin):
        with open(pin) as f:
            stored = f.read().strip()
        if stored != fam:
            raise ValueError(
                f"datasource {datasource!r} uses {stored} versions; "
                f"{version!r} is a {fam} version — mixed families break "
                "lexicographic overshadowing (timestamps always outrank "
                "counters), so the family is pinned at first publish"
            )
        return
    tmp = pin + ".tmp"
    with open(tmp, "w") as f:
        f.write(fam)
    os.replace(tmp, pin)


def publish_segments(
    rolled: DataFrame,
    spec: IngestionSpec,
    out_dir: str,
    version: str,
    partition_num: int = 0,
) -> list[dict]:
    """Land a rolled-up frame as one segment shard per touched
    segmentGranularity interval; returns the segment descriptors.

    Layout: ``<out>/<datasource>/<start>_<version>_<partitionNum>/``
    holding the shard's parquet plus ``descriptor.json`` (written last —
    the commit marker). Re-publishing the same (version, partitionNum)
    replaces the slot in place, which is what makes a replayed
    micro-batch or a re-run batch publish idempotent.

    ``version`` must be a zero-padded counter or an ISO-like timestamp —
    fixed-width and underscore-free — because :func:`used_segments`
    parses segment dir names by underscore and picks the top version
    LEXICOGRAPHICALLY (Druid's own rule; its versions are ISO
    timestamps). A free-form version ('2' vs '10', or one containing
    '_') would silently overshadow the wrong shards, so it is rejected
    here instead."""
    if not _VERSION_RE.fullmatch(version):
        raise ValueError(
            f"version {version!r} must be a zero-padded digit counter or "
            "an ISO-like timestamp (fixed-width, no underscores) so "
            "lexicographic overshadowing order is the numeric/time order"
        )
    _ensure_version_family(out_dir, spec.datasource, version)
    staging = os.path.join(out_dir, f".staging-{spec.datasource}-{version}-{partition_num}")
    shutil.rmtree(staging, ignore_errors=True)
    staged = rolled.withColumn("__interval", _interval_str(
        F.date_trunc(spec.segment_granularity, F.col("__time"))
    ))
    staged.write.partitionBy("__interval").mode("overwrite").parquet(staging)

    descriptors = []
    base = os.path.join(out_dir, spec.datasource)
    os.makedirs(base, exist_ok=True)
    for entry in sorted(os.listdir(staging)):
        if not entry.startswith("__interval="):
            continue
        start = entry.split("=", 1)[1]
        seg_dir = os.path.join(base, f"{start}_{version}_{partition_num}")
        shutil.rmtree(seg_dir, ignore_errors=True)
        os.rename(os.path.join(staging, entry), seg_dir)
        desc = {
            "dataSource": spec.datasource,
            "interval_start": start,
            "version": version,
            "shardSpec": {"type": "numbered", "partitionNum": partition_num},
            "dimensions": list(spec.dimensions),
            "metrics": {n: a for n, (a, _c) in spec.metrics.items()},
            "queryGranularity": spec.query_granularity,
            "segmentGranularity": spec.segment_granularity,
            "binaryVersion": 9,
        }
        with open(os.path.join(seg_dir, ".descriptor.tmp"), "w") as f:
            json.dump(desc, f)
        os.replace(
            os.path.join(seg_dir, ".descriptor.tmp"),
            os.path.join(seg_dir, "descriptor.json"),
        )  # marker lands atomically, after the data
        descriptors.append(desc)
    shutil.rmtree(staging, ignore_errors=True)
    return descriptors


def used_segments(out_dir: str, datasource: str) -> list[dict]:
    """The coordinator's 'used segments' view: per interval, every shard
    of the HIGHEST version (lower versions are overshadowed); only
    descriptor-bearing dirs count (torn publishes are invisible).

    Versions compare lexicographically — Druid's own versions are ISO
    timestamps, which sort that way; callers here use zero-padded
    counters with the same property."""
    base = os.path.join(out_dir, datasource)
    if not os.path.isdir(base):
        return []
    by_interval: dict[str, list[tuple[str, int, str]]] = {}
    for entry in sorted(os.listdir(base)):
        path = os.path.join(base, entry)
        marker = os.path.join(path, "descriptor.json")
        if not os.path.isfile(marker):
            continue
        start, version, pnum = entry.rsplit("_", 2)
        by_interval.setdefault(start, []).append((version, int(pnum), path))
    used = []
    for start, shards in by_interval.items():
        top = max(v for v, _p, _d in shards)
        for version, pnum, path in shards:
            if version == top:
                with open(os.path.join(path, "descriptor.json")) as f:
                    d = json.load(f)
                d["path"] = path
                used.append(d)
    return used


def read_datasource(spark: SparkSession, out_dir: str, datasource: str) -> DataFrame:
    """Scan the non-overshadowed shards of a datasource."""
    segs = used_segments(out_dir, datasource)
    if not segs:
        raise ValueError(f"datasource {datasource!r} has no used segments")
    # descriptor.json lives beside the shard's parquet — glob it out
    return (
        spark.read.option("pathGlobFilter", "*.parquet")
        .parquet(*[s["path"] for s in segs])
    )


def query_rollup(spark: SparkSession, out_dir: str, spec: IngestionSpec) -> DataFrame:
    """Re-aggregate across shards the way Druid's query layer merges
    per-segment results: each metric recombines under its aggregator's
    combiner (sum for sums/count, min/max for min/max) — associative,
    so N streamed shards answer exactly like one batch segment."""
    df = read_datasource(spark, out_dir, spec.datasource)
    combs = [
        _COMBINE[agg](F.col(name)).alias(name)
        for name, (agg, _c) in spec.metrics.items()
    ]
    return df.groupBy("__time", *[F.col(d) for d in spec.dimensions]).agg(*combs)


def druid_sink(
    stream: DataFrame,
    spec: IngestionSpec,
    out_dir: str,
    checkpoint: str,
    version: str = "0000000000",
) -> StreamingQuery:
    """Streaming ingest (the Kafka-indexing-service shape): every
    micro-batch rolls up and lands as an additive shard
    ``partitionNum = batch_id`` under one shared version. A replayed
    batch rewrites its own shard slot — exactly-once under checkpoint
    recovery. A later BATCH re-publish under a higher version
    overshadows all streamed shards atomically (Druid's batch-replaces-
    realtime compaction story)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        publish_segments(
            rollup(batch_df, spec), spec, out_dir, version, partition_num=batch_id
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
