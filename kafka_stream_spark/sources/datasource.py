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
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
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
    """Per-partition next-offset (max+1) from parquet FOOTERS only.

    The produce path stages one file per (task, partition), so almost
    every topic file is single-partition and its row-group statistics
    carry the exact max offset — the driver reads ~8 KB of footer per
    file instead of decoding offset columns (at 100 TB of topic history
    that is the difference between a metadata scan and a data scan).
    Files whose stats show mixed partitions (or no stats) fall back to
    a column-pruned read of just that file."""
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    if not os.path.isdir(path):
        return {}
    files = [os.path.join(path, f) for f in os.listdir(path)
             if f.endswith(".parquet")]
    if not files:
        return {}
    out: dict[int, int] = {}
    slow: list[str] = []
    for fp in files:
        try:
            md = pq.ParquetFile(fp).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            pi, oi = names["partition"], names["offset"]
            per_file: dict[int, int] = {}
            ok = True
            for rg in range(md.num_row_groups):
                ps = md.row_group(rg).column(pi).statistics
                os_ = md.row_group(rg).column(oi).statistics
                if (
                    ps is None or os_ is None
                    or not ps.has_min_max or not os_.has_min_max
                    or ps.min != ps.max  # mixed partitions in one group
                ):
                    ok = False
                    break
                p = int(ps.min)
                per_file[p] = max(per_file.get(p, 0), int(os_.max) + 1)
            if not ok:
                slow.append(fp)
                continue
            for p, e in per_file.items():
                out[p] = max(out.get(p, 0), e)
        except (OSError, KeyError, ValueError):
            slow.append(fp)
    if slow:
        t = ds.dataset(slow, format="parquet").to_table(
            columns=["partition", "offset"]
        )
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


# ---------------------------------------------------------------------------
# write path (S1/S2 symmetry): `df.write.format("kstopic")` and
# `df.writeStream.format("kstopic")` — the broker-less produce contract.
#
# Offset assignment mirrors a Kafka broker's invariant (per-partition
# monotone, assigned at append) without any cross-task coordination:
# each task reads the COMMITTED end offset of the partitions it carries
# and stages a parquet file at [end, end+n) under `.staging/`, invisible
# to readers; the driver's commit() validates that no two tasks claimed
# overlapping ranges (the single-writer-per-partition rule a broker gets
# from partition leadership) and promotes the staged files with an
# atomic rename — a metadata-only commit, no record bytes ever move
# through the driver. Use `prepare_produce` to key-hash + repartition
# upstream so each topic partition lands in exactly one task; a layout
# that violates the rule fails loudly at commit, never corrupts.
#
# Streaming replays are idempotent: commit(batchId) drops an epoch
# marker in `.epochs/`; a re-delivered epoch's staged files are
# discarded instead of renamed (T5 exactly-once, same contract the
# mirror/export paths test).
# ---------------------------------------------------------------------------


@dataclass
class _Staged(WriterCommitMessage):
    #: [(partition, base_offset, n_rows, staged_path)]
    ranges: list


def _writer_target(options) -> tuple[str, int]:
    root = options.get("root")
    topic = options.get("topic")
    if not root or not topic:
        raise ValueError("kstopic write requires options 'root' and 'topic'")
    return os.path.join(root, topic), int(options.get("partitions", 4))


_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64(data: bytes, seed: int = 42) -> int:
    """xxHash64 (Collet's public algorithm), seed 42 — bit-identical to
    Spark's ``F.xxhash64`` over a BINARY column, so the Python writer
    fallback places keys on the same partition as the engine's JVM
    partitioner (``prepare_produce`` / ``FileTopic.append``). Returns
    the SIGNED int64 Spark reports. Parity is test-asserted against the
    JVM expression (tests/test_datasource_write.py)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i <= n - 32:
            v1 = (_rotl64((v1 + int.from_bytes(data[i:i + 8], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            v2 = (_rotl64((v2 + int.from_bytes(data[i + 8:i + 16], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            v3 = (_rotl64((v3 + int.from_bytes(data[i + 16:i + 24], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            v4 = (_rotl64((v4 + int.from_bytes(data[i + 24:i + 32], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = (h * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl64((k * _XXP2) & _M64, 31) * _XXP1) & _M64
        h = (_rotl64(h, 27) * _XXP1 + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _XXP1) & _M64
        h = (_rotl64(h, 23) * _XXP2 + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl64(h, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _key_partition(key: bytes, n_parts: int) -> int:
    """pmod(xxhash64(key), n) — the engine's single key→partition rule."""
    return _xxh64(key) % n_parts


def _stage_batches(path: str, n_parts: int, batches) -> _Staged:
    """Executor-side: bucket rows by partition, assign dense offsets from
    the committed end, stage one parquet per partition."""
    import uuid

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbls = [pa.Table.from_batches([b]) for b in batches]
    if not tbls:
        return _Staged([])
    tbl = pa.concat_tables(tbls, promote_options="permissive")
    if tbl.num_rows == 0:
        return _Staged([])
    names = set(tbl.column_names)
    if "value" not in names:
        raise ValueError("kstopic write needs a 'value' column")

    if "partition" in names:
        parts = pc.cast(tbl["partition"], pa.int32()).to_pylist()
        if any(p is None or not 0 <= p < n_parts for p in parts):
            raise ValueError(f"explicit partition outside [0, {n_parts})")
    elif "key" in names:
        # same rule as prepare_produce / FileTopic.append —
        # pmod(xxhash64(key), n) — so a plain df.write with only a key
        # column lands keys on the same partitions as the engine's JVM
        # paths (one partitioner, ADVICE r4)
        parts = [
            _key_partition(bytes(k), n_parts) if k is not None else i % n_parts
            for i, k in enumerate(tbl["key"].to_pylist())
        ]
    else:
        parts = [i % n_parts for i in range(tbl.num_rows)]

    ends = _end_offsets(path)  # committed files only; staging is invisible
    staging = os.path.join(path, ".staging")
    os.makedirs(staging, exist_ok=True)
    topic_name = os.path.basename(path)
    now_us = int(__import__("time").time() * 1_000_000)

    keys = (
        pc.cast(tbl["key"], pa.binary()).to_pylist()
        if "key" in names else [None] * tbl.num_rows
    )
    vals = pc.cast(tbl["value"], pa.binary()).to_pylist()
    if "timestamp" in names:
        ts_us = pc.cast(
            pc.cast(tbl["timestamp"], pa.timestamp("us", tz="UTC")), pa.int64()
        ).to_pylist()
        tss = [t if t is not None else now_us for t in ts_us]
    else:
        tss = [now_us] * tbl.num_rows

    by_part: dict[int, list[int]] = {}
    for i, p in enumerate(parts):
        by_part.setdefault(int(p), []).append(i)
    ranges = []
    for p, idxs in sorted(by_part.items()):
        base = ends.get(p, 0)
        out = pa.table(
            {
                "key": pa.array([keys[i] for i in idxs], pa.binary()),
                "value": pa.array([vals[i] for i in idxs], pa.binary()),
                "topic": pa.array([topic_name] * len(idxs), pa.string()),
                "partition": pa.array([p] * len(idxs), pa.int32()),
                "offset": pa.array(
                    list(range(base, base + len(idxs))), pa.int64()),
                "timestamp": pa.array(
                    [tss[i] for i in idxs], pa.timestamp("us", tz="UTC")),
            }
        )
        staged = os.path.join(staging, f"p{p}-o{base}-{uuid.uuid4().hex}")
        pq.write_table(out, staged)
        ranges.append((p, base, len(idxs), staged))
    return _Staged(ranges)


def _validated_ranges(messages, path: str) -> list:
    """Driver-side commit validation. Two invariants guard the
    offset-addressed read contract (``_Slice`` ranges assume each
    (partition, offset) exists exactly once):

    - per-partition disjointness WITHIN this job (two tasks staging the
      same partition collide at the same base — the single-writer rule),
    - stale-base detection ACROSS writers (ADVICE r4): every staged
      range must start exactly at the partition's CURRENT committed
      end. If a concurrent writer (a batch write racing a streaming
      sink) promoted files since ``_stage_batches`` read the ends, the
      bases are stale and both writers would claim the same offsets —
      fail this commit instead of silently double-counting rows.
    """
    ranges = [r for m in messages if m is not None for r in m.ranges]
    claimed: dict[int, list[tuple[int, int]]] = {}
    for p, base, n, _ in ranges:
        claimed.setdefault(p, []).append((base, base + n))
    ends = _end_offsets(path)
    for p, spans in claimed.items():
        spans.sort()
        for (s0, e0), (s1, _) in zip(spans, spans[1:]):
            if s1 < e0:
                _discard(messages)
                raise ValueError(
                    f"kstopic commit: partition {p} written by more than "
                    "one task (offset ranges overlap) — repartition by "
                    "'partition' upstream (see prepare_produce)"
                )
        committed_end = ends.get(p, 0)
        if spans[0][0] != committed_end:
            _discard(messages)
            raise ValueError(
                f"kstopic commit: partition {p} staged from offset "
                f"{spans[0][0]} but the committed end is {committed_end} "
                "— a concurrent writer promoted into this topic between "
                "staging and commit; retry the write"
            )
    return ranges


def _final_name(staged: str) -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(staged)),
        os.path.basename(staged) + ".parquet",
    )


def _promote(messages, path: str) -> None:
    """Batch commit: validate, then atomically rename every staged file
    into the topic directory."""
    for _, _, _, staged in _validated_ranges(messages, path):
        os.replace(staged, _final_name(staged))


def _discard(messages) -> None:
    for m in messages:
        if m is None:
            continue
        for _, _, _, staged in m.ranges:
            try:
                os.remove(staged)
            except OSError:
                pass


class _TopicWriter(DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool):
        if overwrite:
            raise ValueError(
                "kstopic topics are append-only logs; use mode('append')")
        self.path, self.n = _writer_target(options)

    def write(self, iterator):
        return _stage_batches(self.path, self.n, iterator)

    def commit(self, messages):
        _promote(messages, self.path)

    def abort(self, messages):
        _discard(messages)


def _finish_marker(marker: str) -> None:
    """Idempotently apply a committed epoch's rename plan. Each entry is
    (staged, final): final already present → done earlier; staged still
    present → finish the rename; neither → the plan entry was applied
    and the final later compacted/removed out-of-band — nothing to do
    (legacy 'committed' text markers carry no plan and are complete by
    definition)."""
    try:
        with open(marker) as f:
            plan = json.loads(f.read())
    except ValueError:
        return  # pre-plan marker format: epoch fully committed
    for staged, final in plan:
        if os.path.exists(final):
            continue
        if os.path.exists(staged):
            os.replace(staged, final)


class _TopicStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options, overwrite: bool):
        if overwrite:
            # complete/truncate output modes would silently append;
            # topics are append-only logs (mirrors _TopicWriter)
            raise ValueError(
                "kstopic topics are append-only logs; use outputMode("
                "'append') or 'update'")
        self.path, self.n = _writer_target(options)

    def write(self, iterator):
        return _stage_batches(self.path, self.n, iterator)

    def commit(self, messages, batchId: int) -> None:
        """Exactly-once promotion with a crash-recoverable commit point
        (ADVICE r4): the rename plan is fsynced into the epoch marker
        BEFORE any staged file is promoted — the atomic marker rename IS
        the commit (same idea as the file-sink's _spark_metadata log). A
        crash after the marker but mid-promote is finished from the plan
        on replay; a crash before the marker leaves only invisible
        .staging files, and the replayed epoch re-stages and commits
        fresh."""
        epochs = os.path.join(self.path, ".epochs")
        os.makedirs(epochs, exist_ok=True)
        marker = os.path.join(epochs, str(batchId))
        if os.path.exists(marker):
            # replayed epoch: finish the recorded plan if the crashed
            # attempt left renames pending, drop this attempt's files
            _finish_marker(marker)
            _discard(messages)
            return
        ranges = _validated_ranges(messages, self.path)
        plan = [(staged, _final_name(staged)) for _, _, _, staged in ranges]
        tmp = marker + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(json.dumps(plan))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, marker)  # commit point
        _finish_marker(marker)

    def abort(self, messages, batchId: int) -> None:
        _discard(messages)


def vacuum_staging(topic_dir: str, min_age_s: float = 3600.0) -> dict:
    """GC the write path's crash debris. Staged files whose attempt died
    BEFORE its epoch marker are invisible forever (correct) but leak
    disk; ones referenced by a committed marker should have been
    promoted. For every ``.staging`` file older than ``min_age_s``:
    finish the rename if a marker plan references it, else delete it.
    Age-gating keeps in-flight writes safe — a live attempt stages then
    commits within one job/trigger, not hours. Returns counts
    ``{"promoted": n, "removed": n, "kept": n}``."""
    import time

    staging = os.path.join(topic_dir, ".staging")
    if not os.path.isdir(staging):
        return {"promoted": 0, "removed": 0, "kept": 0}
    planned: dict[str, str] = {}
    epochs = os.path.join(topic_dir, ".epochs")
    if os.path.isdir(epochs):
        for name in os.listdir(epochs):
            if name.endswith(".tmp") or ".tmp-" in name:
                continue
            try:
                with open(os.path.join(epochs, name)) as f:
                    for staged, final in json.loads(f.read()):
                        planned[staged] = final
            except (OSError, ValueError):
                continue  # legacy text marker: carries no plan
    cutoff = time.time() - min_age_s
    stats = {"promoted": 0, "removed": 0, "kept": 0}
    for name in os.listdir(staging):
        path = os.path.join(staging, name)
        try:
            if os.path.getmtime(path) > cutoff:
                stats["kept"] += 1
                continue
            if path in planned:
                if not os.path.exists(planned[path]):
                    os.replace(path, planned[path])
                    stats["promoted"] += 1
                else:
                    os.remove(path)
                    stats["removed"] += 1
            else:
                os.remove(path)
                stats["removed"] += 1
        except OSError:
            stats["kept"] += 1
    return stats


def prepare_produce(df, n_partitions: int = 4):
    """JVM-side produce prep matching ``FileTopic.append`` exactly:
    partition = pmod(xxhash64(key), n) (null keys round-robin), then a
    repartition BY the partition column so each topic partition is
    written by exactly one task — the layout the writer's commit-time
    single-writer check requires, and the one that keeps offsets dense."""
    import pyspark.sql.functions as F

    n = n_partitions
    keyed = df.withColumn(
        "partition",
        F.when(
            F.col("key").isNotNull(), F.pmod(F.xxhash64(F.col("key")), F.lit(n))
        )
        .otherwise(F.pmod(F.spark_partition_id(), F.lit(n)))
        .cast("int"),
    )
    return keyed.repartition(n, "partition")


class TopicDataSource(DataSource):
    """``spark.read.format("kstopic")`` / ``spark.readStream.format(
    "kstopic")`` over a FileTopic directory, plus the symmetric write
    path (``df.write`` / ``df.writeStream`` with ``format("kstopic")``)."""

    @classmethod
    def name(cls) -> str:
        return "kstopic"

    def schema(self) -> StructType:
        return TOPIC_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _StreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return _TopicWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _TopicStreamWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent: makes ``format("kstopic")`` resolvable on this session."""
    spark.dataSource.register(TopicDataSource)
