"""Object-store / HDFS export sink with the Confluent connector's file
contract (SURVEY.md §2.1 S11/S12 — the ``kafka-connect-hdfs`` /
``kafka-connect-s3`` family bundled with the reference's Confluent 3.3
distribution; its plugin path is wired at ``Dockerfile:52``).

The reference ships these connectors as JARs; what a replacement engine
must reproduce is their PUBLIC on-store contract (Confluent connector
docs + connector source), which is what downstream consumers and the
connectors' own recovery depend on:

- **File naming**: every committed object is
  ``<topic>+<kafkaPartition>+<startOffset>+<endOffset>.<ext>`` with
  offsets zero-padded to ``filename.offset.zero.pad.width`` digits
  (default 10) — offsets are the Kafka offsets of the first/last record
  in the file.
- **Partitioners** (``partitioner.class``): Default
  (``<topic>/partition=<p>/``), FieldPartitioner
  (``<topic>/<field>=<value>/``), TimeBasedPartitioner
  (``<topic>/<path.format>/`` rendered from the RECORD timestamp — the
  deterministic ``timestamp.extractor=Record`` mode; wall-clock
  extraction would break replay idempotence and is deliberately not
  offered).
- **Rotation**: ``flush.size`` records per file within an encoded
  partition directory.
- **Exactly-once**: the connectors recover the committed position by
  reading the END offset encoded in committed filenames and resume
  after it; files become visible only by atomic rename of a completed
  temp file. Deterministic names + atomic rename make a replayed batch
  rewrite identical bytes to identical names instead of duplicating.

Spark-first shape: one ``applyInPandas`` over ``(partition, dir)`` —
a single hash exchange; each task streams its group in offset order and
cuts a file every ``flush_size`` records, exactly the connector's
single-writer-per-topic-partition topology. Micro-batch size is bounded
upstream by ``maxOffsetsPerTrigger`` admission control (T7), which is
what bounds per-task group size at 100 TB the same way the connector's
``offset.flush`` cadence does.
"""

from __future__ import annotations

import os
import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from kafka_stream_spark.sources.topics import FileTopic

#: committed-file pattern: topic+partition+start+end.ext (topic may
#: itself contain '+', so partition/offsets bind from the right)
_FILE_RE = re.compile(r"^(?P<topic>.+)\+(?P<part>\d+)\+(?P<start>\d+)\+(?P<end>\d+)\.(?P<ext>[a-z]+)$")

_EXT = {"parquet": "parquet", "json": "json", "avro": "avro"}


def default_partitioner(topic: str):
    """``<topic>/partition=<p>`` — the connector's DefaultPartitioner."""
    return F.concat(F.lit(f"{topic}/partition="), F.col("partition").cast("string"))


def field_partitioner(topic: str, field: str):
    """``<topic>/<field>=<value>`` — FieldPartitioner on a record column."""
    return F.concat(F.lit(f"{topic}/{field}="), F.col(field).cast("string"))


def time_based_partitioner(
    topic: str,
    ts_col: str = "timestamp",
    path_format: str = "'year'=yyyy/'month'=MM/'day'=dd",
):
    """``<topic>/<path.format>`` rendered from the record timestamp —
    TimeBasedPartitioner with ``timestamp.extractor=Record`` (the only
    extractor whose output is a pure function of the record, hence the
    only one compatible with replay-idempotent exactly-once)."""
    return F.concat(F.lit(f"{topic}/"), F.date_format(F.col(ts_col), path_format))


def committed_offsets(out_dir: str, topic: str) -> dict[tuple[str, int], int]:
    """Recover the committed END offset per (encoded directory, Kafka
    partition) by scanning committed filenames — the connector's
    restart rule. Temp files (dot-prefixed) are invisible, exactly like
    the connector's ``.tmp`` working files.

    Per-DIRECTORY granularity matters with Field/Time partitioners: one
    Kafka partition's offsets interleave across directories, so a crash
    that committed directory A's file but not B's must only skip A's
    records on replay. The partitioner is a pure function of the
    record, so every record re-lands in its own directory and per-dir
    ends are an exact replay filter — coarser per-partition recovery
    would silently drop B's uncommitted records."""
    ends: dict[tuple[str, int], int] = {}
    if not os.path.isdir(out_dir):
        return ends
    for root, _dirs, files in os.walk(out_dir):
        rel = os.path.relpath(root, out_dir)
        for name in files:
            # only dot-prefixed temp files are skipped by NAME: Kafka
            # topic names may legally start with '_' (__consumer_offsets),
            # so committed files can too — control files like the
            # _WRITER pin fall out at the _FILE_RE match (no '+' fields)
            if name.startswith("."):
                continue
            m = _FILE_RE.match(name)
            if not m or m.group("topic") != topic:
                continue
            key = (rel, int(m.group("part")))
            ends[key] = max(ends.get(key, -1), int(m.group("end")))
    return ends


def export_files(
    df: DataFrame,
    out_dir: str,
    topic: str,
    fmt: str = "parquet",
    flush_size: int = 1000,
    partitioner=None,
    pad_width: int = 10,
    committed_ends: dict[tuple[str, int], int] | None = None,
) -> DataFrame:
    """Export topic records to offset-named files; returns the commit
    manifest (one row per file written). Lazy — the caller triggers it
    (the streaming sink collects the manifest, which is one small row
    per committed object).

    Records at or below each partition's recovered committed end are
    dropped before writing, so calling this twice over the same input —
    or replaying a half-committed batch — never duplicates a record on
    the store, with or without a Spark checkpoint. That is the
    connector's own exactly-once story (offsets live in filenames, not
    in the consumer group), reproduced mechanism-for-mechanism.

    ``committed_ends`` lets a long-lived caller (the streaming sink)
    supply the recovered ends itself instead of re-walking the committed
    object tree — O(objects) driver work per call at 100 TB otherwise;
    ``None`` scans, the connectors' cold-start behavior.
    """
    if fmt not in _EXT:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_EXT)}")
    ext = _EXT[fmt]
    part_expr = partitioner if partitioner is not None else default_partitioner(topic)

    staged = df.withColumn("_dir", part_expr)
    ends = (
        committed_ends if committed_ends is not None
        else committed_offsets(out_dir, topic)
    )
    if ends:
        lookup = df.sparkSession.createDataFrame(
            [(d, p, e) for (d, p), e in ends.items()],
            "_dir string, partition int, _committed_end bigint",
        )
        staged = (
            staged.join(F.broadcast(lookup), ["_dir", "partition"], "left")
            .where(F.col("_committed_end").isNull() | (F.col("offset") > F.col("_committed_end")))
            .drop("_committed_end")
        )
    data_cols = [c for c in staged.columns if c != "_dir"]

    def write_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values("offset").reset_index(drop=True)
        p = int(pdf["partition"].iloc[0])
        rel_dir = str(pdf["_dir"].iloc[0])
        dir_path = os.path.join(out_dir, rel_dir)
        os.makedirs(dir_path, exist_ok=True)
        body = pdf[data_cols]
        out_rows = []
        for lo in range(0, len(body), flush_size):
            chunk = body.iloc[lo : lo + flush_size]
            start = int(chunk["offset"].iloc[0])
            end = int(chunk["offset"].iloc[-1])
            name = f"{topic}+{p}+{start:0{pad_width}d}+{end:0{pad_width}d}.{ext}"
            final = os.path.join(dir_path, name)
            tmp = os.path.join(dir_path, f".{name}.tmp")
            _write_chunk(chunk, tmp, fmt)
            os.replace(tmp, final)  # atomic visibility, idempotent replay
            out_rows.append(
                {
                    "dir": rel_dir,
                    "file": name,
                    "kafka_partition": p,
                    "start_offset": start,
                    "end_offset": end,
                    "records": len(chunk),
                }
            )
        return pd.DataFrame(out_rows)

    return (
        staged.groupBy("partition", "_dir")
        .applyInPandas(
            write_group,
            schema=(
                "dir string, file string, kafka_partition int, "
                "start_offset bigint, end_offset bigint, records bigint"
            ),
        )
    )


def _write_chunk(chunk, path: str, fmt: str) -> None:
    if fmt == "parquet":
        import pyarrow as pa
        import pyarrow.parquet as pq

        # pandas timestamps arrive as ns; Spark's parquet reader rejects
        # TIMESTAMP(NANOS), so coerce to the µs the connectors wrote
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False), path,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
    elif fmt == "json":
        chunk = chunk.copy()
        for c in chunk.columns:
            if chunk[c].dtype == object:
                chunk[c] = chunk[c].map(
                    lambda v: v.decode("utf-8", "replace")
                    if isinstance(v, (bytes, bytearray))
                    else v
                )
        chunk.to_json(path, orient="records", lines=True, default_handler=str)
    else:  # avro: the Camus-era record shape over wire-true OCF
        from kafka_stream_spark.functions.avro_ocf import (
            TOPIC_EXPORT_SCHEMA,
            write_ocf,
        )

        def as_bytes(v):
            if v is None:
                return None
            return v.encode("utf-8") if isinstance(v, str) else bytes(v)

        recs = [
            {
                "key": as_bytes(r.get("key")),
                "value": as_bytes(r.get("value")) or b"",
                "offset": int(r["offset"]),
            }
            for r in chunk.to_dict("records")
        ]
        with open(path, "wb") as f:
            f.write(write_ocf(recs, TOPIC_EXPORT_SCHEMA, codec="deflate"))


def claim_writer_pin(out_dir: str, topic: str, checkpoint: str) -> None:
    """Single-writer pin for an export prefix: the recovery cache
    (``ends_cache``) is in-driver state, so TWO exporters feeding one
    ``(out_dir, topic)`` prefix would race it and double-write. The pin
    file records the owning sink's checkpoint path — a restart of the
    SAME logical exporter (same checkpoint) reclaims it, and so does a
    replacement exporter whose predecessor's checkpoint directory is
    GONE (the checkpoint-loss recovery story: a dead owner cannot be
    restarted, so it cannot race). Any other exporter fails loudly
    instead of corrupting the export (the ``_BUCKETS`` pin pattern).
    Claim is O_EXCL-atomic, so two fresh sinks racing the claim cannot
    both win."""
    os.makedirs(out_dir, exist_ok=True)
    pin = os.path.join(out_dir, f"_WRITER-{topic}")
    token = os.path.abspath(checkpoint)
    try:
        fd = os.open(pin, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        with open(pin) as f:
            stored = f.read().strip()
        if stored == token:
            return
        if os.path.isdir(stored):
            raise ValueError(
                f"export prefix {out_dir!r} topic {topic!r} is already "
                f"owned by the exporter checkpointed at {stored!r}; a "
                "second concurrent exporter would race the recovery "
                "cache and double-write — stop the other sink (and "
                "remove the _WRITER pin if it is stale) first"
            ) from None
        # previous owner's checkpoint is gone: it cannot restart, so
        # this exporter takes over (atomic rewrite)
        tmp = pin + ".tmp"
        with open(tmp, "w") as f:
            f.write(token)
        os.replace(tmp, pin)
        return
    with os.fdopen(fd, "w") as f:
        f.write(token)


def object_store_stream_sink(
    stream: DataFrame,
    out_dir: str,
    topic: str,
    checkpoint: str,
    fmt: str = "parquet",
    flush_size: int = 1000,
    partitioner=None,
    pad_width: int = 10,
):
    """foreachBatch writer over an already-built topic stream (columns
    must include ``partition``/``offset``). Returns the un-started
    DataStreamWriter — the KCQL-routed entry point and tests choose
    their own trigger.

    The committed-end recovery tree walk runs ONCE, at the first batch;
    afterwards each batch's own commit manifest folds into the in-driver
    map (restart naturally rescans — the recovery path proper). The
    prefix is single-writer: :func:`claim_writer_pin` rejects a second
    concurrent exporter instead of letting it race the recovery cache."""
    claim_writer_pin(out_dir, topic, checkpoint)
    ends_cache: dict[tuple[str, int], int] | None = None

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal ends_cache
        if batch_df.isEmpty():
            return
        if ends_cache is None:
            ends_cache = committed_offsets(out_dir, topic)
        manifest = export_files(
            batch_df, out_dir, topic, fmt=fmt, flush_size=flush_size,
            partitioner=partitioner, pad_width=pad_width,
            committed_ends=ends_cache,
        )
        # one row per committed file; collecting forces the write and
        # feeds the cache so the next batch skips the tree walk
        for row in manifest.collect():
            key = (row["dir"], row["kafka_partition"])
            ends_cache[key] = max(ends_cache.get(key, -1), row["end_offset"])

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )


def object_store_sink(
    src: FileTopic,
    out_dir: str,
    checkpoint: str,
    fmt: str = "parquet",
    flush_size: int = 1000,
    partitioner=None,
    pad_width: int = 10,
) -> StreamingQuery:
    """Streaming topic → object-store export (the connector's running
    mode). Exactly-once holds even if the checkpoint is lost: the
    filename-recovery filter inside :func:`export_files` drops anything
    already committed, so a from-scratch replay appends nothing."""
    return (
        object_store_stream_sink(
            src.read_stream(), out_dir, src.name, checkpoint,
            fmt=fmt, flush_size=flush_size,
            partitioner=partitioner, pad_width=pad_width,
        )
        .trigger(availableNow=True)
        .start()
    )


def register_export_table(
    spark,
    out_dir: str,
    topic: str,
    table: str | None = None,
) -> str:
    """The connector's ``hive.integration=true`` analog: expose an
    export as a SQL-queryable table the moment files commit.

    Metadata-only (no data copied): the view reads the committed
    parquet objects under the topic prefix; dot-prefixed temp files and
    non-parquet formats are excluded by the glob, and recursive lookup
    (rather than Hive-style inference) is deliberate — the partitioner
    directories re-encode columns that already live IN the files, which
    directory-partition inference would reject as duplicates. Filters
    on the partitioner field still prune via parquet row-group stats.
    Re-calling after further exports refreshes the file listing.
    Returns the registered table name; parquet exports only (the same
    restriction the connector's Hive mode has).
    """
    name = table or f"{topic}_export"
    path = os.path.join(out_dir, topic)
    spark.sql(f"DROP VIEW IF EXISTS {name}")
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(path)
    )
    df.createOrReplaceTempView(name)
    return name
