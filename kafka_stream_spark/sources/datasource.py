"""`kstopic` — the engine's topic layer as a first-class Spark data
source (Python Data Source API, Spark 4).

``FileTopic.read_stream`` (topics.py:164) rides Spark's *file* stream
source, which tracks seen files — not offsets. This source instead
implements the Kafka source's actual contract over the same topic
directories, the idiomatic Spark-4 shape for a custom source:

* batch:  ``spark.read.format("kstopic").option("root", …)
  .option("topic", …)[.option("startingOffsets", json)] .load()`` —
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


def _topic_path(options) -> str:
    root, topic = options.get("root"), options.get("topic")
    if not root or not topic:
        raise ValueError("kstopic requires options 'root' and 'topic'")
    return os.path.join(root, topic)


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


def _parse_offsets(raw: str | None, ends: dict[int, int],
                   default: str) -> dict[int, int]:
    mode = raw or default
    if mode == "earliest":
        return {p: 0 for p in ends}
    if mode == "latest":
        return dict(ends)
    explicit = {int(k): int(v) for k, v in json.loads(mode).items()}
    return {p: explicit.get(p, 0) for p in set(ends) | set(explicit)}


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = _topic_path(options)
        ends = _end_offsets(self.path)
        starts = _parse_offsets(options.get("startingoffsets"), ends,
                                "earliest")
        stops = _parse_offsets(options.get("endingoffsets"), ends, "latest")
        self.slices = [
            _Slice(self.path, p, starts.get(p, 0), stops.get(p, 0))
            for p in sorted(ends)
            if stops.get(p, 0) > starts.get(p, 0)
        ]

    def partitions(self):
        return self.slices or [_Slice(self.path, -1, 0, 0)]

    def read(self, partition: _Slice):
        if partition.partition < 0:  # empty topic
            return
        yield from _read_slice(partition)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = _topic_path(options)
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

    # offsets serialize as {"partition": next_offset_to_read}
    def initialOffset(self) -> dict:
        ends = _end_offsets(self.path)
        first = {str(p): o for p, o in
                 _parse_offsets(None, ends, self._starting).items()}
        self._merge_cursor(first)  # never rewind a cursor latestOffset set
        return first

    def latestOffset(self) -> dict:
        ends = _end_offsets(self.path)
        target = {str(p): o for p, o in ends.items()}
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
        self._merge_cursor({str(p): int(o) for p, o in end.items()})
        return [
            _Slice(self.path, int(p), int(start.get(p, 0)), int(end[p]))
            for p in sorted(end)
            if int(end[p]) > int(start.get(p, 0))
        ] or [_Slice(self.path, -1, 0, 0)]

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
