"""`kstopic` — the engine's topic layer as a first-class Spark data
source (Python Data Source API, Spark 4).

``FileTopic.read_stream`` (topics.py:164) rides Spark's *file* stream
source, which tracks seen files — not offsets. This source instead
implements the Kafka source's actual contract over the same topic
directories, the idiomatic Spark-4 shape for a custom source:

* batch:  ``spark.read.format("kstopic").option("root", …)
  .option("topic", …)[.option("startingOffsets", json)] .load()`` —
  subscription shapes mirror the Kafka source: ``topic`` (one),
  ``topics`` (comma list — the reference's nullsink consumes four
  topics in one connector, nullsink.sh:5), or ``subscribePattern``
  (regex, re-matched each micro-batch so topics created mid-stream
  join the subscription) —
  one ``InputPartition`` per topic partition, each task reading only
  its partition's rows via pyarrow dataset filters (row-group
  statistics prune on the ``partition``/``offset`` columns), so the
  scan parallelizes and prunes exactly like the JVM Kafka relation.
* stream: ``spark.readStream.format("kstopic")…`` — per-partition
  offset ranges in the checkpoint (``initialOffset`` / ``latestOffset``
  / ``partitions`` / ``read`` / ``commit``), ``startingOffsets``
  earliest|latest|{"p": n}, and ``maxOffsetsPerTrigger`` admission
  control that splits a backlog across micro-batches proportionally to
  per-partition lag — the Kafka source's rate-limit semantics (T7),
  with exactly-once offset-range replay on restart (T5/T8).

Reference framing: the reference's consumers resume from committed
broker offsets (kafka-tests.yml:44-57 consume flows); this gives the
broker-less FileTopic the same offset-addressed resume model, instead
of the weaker seen-file model.

Executor-side reads use pyarrow only (no SparkSession on workers).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

TOPIC_SCHEMA = StructType([
    StructField("key", BinaryType()),
    StructField("value", BinaryType()),
    StructField("topic", StringType()),
    StructField("partition", IntegerType()),
    StructField("offset", LongType()),
    StructField("timestamp", TimestampType()),
])


@dataclass
class _Slice(InputPartition):
    path: str
    partition: int
    start: int  # inclusive
    end: int    # exclusive; -1 = unbounded


def _subscription(options) -> tuple[str, list[str], bool]:
    """(root, topics, multi) from the Kafka-source-shaped options:
    ``topic`` (one), ``topics`` (comma list — the nullsink.sh:5 fan-in
    shape), or ``subscribePattern`` (regex over topic dirs, re-matched
    every latestOffset so topics created mid-stream join the
    subscription). ``multi`` marks whether offsets serialize
    topic-qualified."""
    import re

    root = options.get("root")
    if not root:
        raise ValueError("kstopic requires option 'root'")
    if options.get("topic"):
        return root, [options["topic"]], False
    if options.get("topics"):
        names = [t.strip() for t in options["topics"].split(",") if t.strip()]
        return root, names, True
    pat = options.get("subscribepattern")
    if pat:
        rx = re.compile(pat)
        names = sorted(
            d for d in (os.listdir(root) if os.path.isdir(root) else [])
            if os.path.isdir(os.path.join(root, d)) and rx.fullmatch(d)
        )
        return root, names, True
    raise ValueError(
        "kstopic requires one of 'topic', 'topics', 'subscribePattern'")


def _end_offsets(path: str) -> dict[int, int]:
    """Per-partition next-offset (max+1) — a driver-side metadata scan
    reading only the two bookkeeping columns (column-pruned, so it
    touches kilobytes per file regardless of payload width)."""
    import pyarrow.dataset as ds

    if not os.path.isdir(path):
        return {}
    files = [os.path.join(path, f) for f in os.listdir(path)
             if f.endswith(".parquet")]
    if not files:
        return {}
    t = ds.dataset(files, format="parquet").to_table(
        columns=["partition", "offset"]
    )
    out: dict[int, int] = {}
    for p, o in zip(t["partition"].to_pylist(), t["offset"].to_pylist()):
        if o + 1 > out.get(p, 0):
            out[p] = o + 1
    return out


def _read_slice(sl: _Slice):
    """Executor-side scan of one partition's offset range, yielded as
    Arrow RecordBatches (the read API's zero-copy fast path — no
    per-row Python objects). The dataset filter reaches parquet
    row-group statistics, so files/row-groups wholly outside
    (partition, offset-range) are skipped unread."""
    import pyarrow as pa
    import pyarrow.dataset as ds

    if not os.path.isdir(sl.path):
        return
    files = [os.path.join(sl.path, f) for f in os.listdir(sl.path)
             if f.endswith(".parquet")]
    if not files:
        return
    f = (ds.field("partition") == sl.partition) & \
        (ds.field("offset") >= sl.start)
    if sl.end >= 0:
        f = f & (ds.field("offset") < sl.end)
    tbl = ds.dataset(files, format="parquet").to_table(
        filter=f,
        columns=["key", "value", "topic", "partition", "offset", "timestamp"],
    )
    # Spark's arrow bridge wants tz-aware instants for TimestampType;
    # a cast fixes files written without one (naive micros == UTC here)
    target = pa.schema([
        pa.field("key", pa.binary()),
        pa.field("value", pa.binary()),
        pa.field("topic", pa.string()),
        pa.field("partition", pa.int32()),
        pa.field("offset", pa.int64()),
        pa.field("timestamp", pa.timestamp("us", tz="UTC")),
    ])
    yield from tbl.cast(target).to_batches()


def _ends_multi(root: str, topics: list[str]) -> dict[tuple[str, int], int]:
    out: dict[tuple[str, int], int] = {}
    for t in topics:
        for p, o in _end_offsets(os.path.join(root, t)).items():
            out[(t, p)] = o
    return out


def _ser_key(tp: tuple[str, int], multi: bool) -> str:
    return f"{tp[0]}:{tp[1]}" if multi else str(tp[1])


def _parse_key(k: str, topics: list[str], multi: bool) -> tuple[str, int]:
    if multi:
        t, _, p = k.rpartition(":")
        return t, int(p)
    return topics[0], int(k)


def _parse_offsets(raw: str | None, ends: dict[tuple[str, int], int],
                   default: str, topics: list[str],
                   multi: bool) -> dict[tuple[str, int], int]:
    mode = raw or default
    if mode == "earliest":
        return {tp: 0 for tp in ends}
    if mode == "latest":
        return dict(ends)
    explicit = {
        _parse_key(k, topics, multi): int(v)
        for k, v in json.loads(mode).items()
    }
    return {tp: explicit.get(tp, 0) for tp in set(ends) | set(explicit)}


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.root, self.topics, self.multi = _subscription(options)
        ends = _ends_multi(self.root, self.topics)
        starts = _parse_offsets(options.get("startingoffsets"), ends,
                                "earliest", self.topics, self.multi)
        stops = _parse_offsets(options.get("endingoffsets"), ends,
                               "latest", self.topics, self.multi)
        self.slices = [
            _Slice(os.path.join(self.root, t), p,
                   starts.get((t, p), 0), stops.get((t, p), 0))
            for (t, p) in sorted(ends)
            if stops.get((t, p), 0) > starts.get((t, p), 0)
        ]

    def partitions(self):
        return self.slices or [_Slice(self.root, -1, 0, 0)]

    def read(self, partition: _Slice):
        if partition.partition < 0:  # empty topic
            return
        yield from _read_slice(partition)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._options = options
        self.root, self.topics, self.multi = _subscription(options)
        self._starting = options.get("startingoffsets", "earliest")
        self._max_per_trigger = int(options.get("maxoffsetspertrigger", 0))
        #: admission-control cursor: the end we last admitted. The API's
        #: latestOffset takes no start (rate limiting is not part of the
        #: Python source contract), so the cap is tracked here and MUST
        #: be monotone: the JVM may call latestOffset before
        #: initialOffset, and a backward end would make Spark plan
        #: overlapping batches (observed: duplicate records). Hence the
        #: first batch after (re)start is an uncapped catch-up and every
        #: cursor update is an elementwise max.
        self._cursor: dict[str, int] | None = None

    def _merge_cursor(self, offs: dict) -> None:
        cur = self._cursor or {}
        self._cursor = {
            p: max(int(cur.get(p, 0)), int(offs.get(p, 0)))
            for p in set(cur) | set(offs)
        }

    def _live_topics(self) -> list[str]:
        """Pattern subscriptions re-list the root so topics created
        mid-stream join with start 0; explicit topic lists are fixed."""
        if self._options.get("subscribepattern"):
            _, topics, _ = _subscription(self._options)
            return topics
        return self.topics

    # offsets serialize as {"partition"| "topic:partition": next_offset}
    def initialOffset(self) -> dict:
        topics = self._live_topics()
        ends = _ends_multi(self.root, topics)
        first = {
            _ser_key(tp, self.multi): o
            for tp, o in _parse_offsets(None, ends, self._starting,
                                        topics, self.multi).items()
        }
        self._merge_cursor(first)  # never rewind a cursor latestOffset set
        return first

    def latestOffset(self) -> dict:
        ends = _ends_multi(self.root, self._live_topics())
        target = {_ser_key(tp, self.multi): o for tp, o in ends.items()}
        start = self._cursor
        if not self._max_per_trigger or start is None:
            self._cursor = dict(target)
            return target
        # Kafka-source-style admission control: split the cap across
        # partitions proportionally to lag, always admitting ≥1 per
        # lagging partition so no partition starves.
        lags = {
            p: max(0, int(target.get(p, 0)) - int(start.get(p, 0)))
            for p in set(target) | set(start)
        }
        total = sum(lags.values())
        if total <= self._max_per_trigger:
            self._cursor = dict(target)
            return target
        out = {}
        for p, lag in lags.items():
            share = max(1, lag * self._max_per_trigger // total) if lag else 0
            out[p] = int(start.get(p, 0)) + min(lag, share)
        self._merge_cursor(out)
        return dict(self._cursor)

    def partitions(self, start: dict, end: dict):
        # keep the admission cursor aligned with what Spark actually
        # planned (covers checkpoint restarts, where the true start is
        # ahead of anything this instance has seen)
        self._merge_cursor({str(k): int(o) for k, o in end.items()})
        topics = self._live_topics()
        out = []
        for k in sorted(end):
            t, p = _parse_key(str(k), topics, self.multi)
            if int(end[k]) > int(start.get(k, 0)):
                out.append(_Slice(os.path.join(self.root, t), p,
                                  int(start.get(k, 0)), int(end[k])))
        return out or [_Slice(self.root, -1, 0, 0)]

    def read(self, partition: _Slice):
        if partition.partition < 0:
            return
        yield from _read_slice(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; nothing broker-side


class TopicDataSource(DataSource):
    """``spark.read.format("kstopic")`` / ``spark.readStream.format(
    "kstopic")`` over a FileTopic directory."""

    @classmethod
    def name(cls) -> str:
        return "kstopic"

    def schema(self) -> StructType:
        return TOPIC_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    """Idempotent: makes ``format("kstopic")`` resolvable on this session."""
    spark.dataSource.register(TopicDataSource)
