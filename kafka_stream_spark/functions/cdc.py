"""Debezium-envelope CDC decode → latest-state fold (SURVEY.md §2.1 S5
companion: the reference's Connect distribution, Dockerfile:32-52, is
precisely where Debezium-class CDC connectors run; the JDBC incremental
source covers poll-based capture, this module covers the log-based
envelope every Debezium connector emits).

Envelope contract (public Debezium docs): each record's value carries
``{before, after, op, ts_ms, source:{lsn|pos, ...}}`` where op is
``c``(reate) / ``u``(pdate) / ``d``(elete) / ``r``(snapshot read);
``after`` is null for deletes and ``before`` null for creates/reads.
Event order within a key follows the source log position (lsn), NOT
arrival order — a correct fold must arg-max by lsn and treat a delete
as a tombstone, exactly like broker log compaction (A5).

Spark-first shape: ``from_json`` decodes JVM-side (codegen, no UDF);
the fold is ONE ``max_by``-style aggregate keyed on the row key — the
same single-shuffle compaction ``topics.latest_by_key`` uses, so a CDC
topic and a compacted topic materialize through one code path. The
streaming twin reuses ``ops.foreach_batch_upsert`` semantics with
tombstone filtering applied after the arg-max (a delete only wins if it
is the key's LATEST event).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def envelope_schema(row_schema: StructType) -> StructType:
    """The Debezium value-envelope schema around a given row schema,
    in Debezium's own field order (``before, after, source, op, ts_ms,
    transaction`` — the order its Envelope schema builder registers) with
    the PostgreSQL connector's source-info block. JSON decode matches by
    name so extra/missing source fields are harmless; the Avro path is
    positional, so this order must track the writer's registration."""
    from pyspark.sql.types import LongType, StringType, StructField

    source = StructType(
        [
            StructField("version", StringType()),
            StructField("connector", StringType()),
            StructField("name", StringType()),
            StructField("ts_ms", LongType()),
            StructField("snapshot", StringType()),
            StructField("db", StringType()),
            StructField("sequence", StringType()),
            StructField("schema", StringType()),
            StructField("table", StringType()),
            StructField("txId", LongType()),
            StructField("lsn", LongType()),
            StructField("xmin", LongType()),
        ]
    )
    transaction = StructType(
        [
            StructField("id", StringType()),
            StructField("total_order", LongType()),
            StructField("data_collection_order", LongType()),
        ]
    )
    return StructType(
        [
            StructField("before", row_schema),
            StructField("after", row_schema),
            StructField("source", source),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
            StructField("transaction", transaction),
        ]
    )


def decode_envelopes(
    df: DataFrame, row_schema: StructType, value_col: str = "value"
) -> DataFrame:
    """JSON envelope bytes/strings → flat change rows.

    Output: the row columns (from ``after``, or ``before`` for deletes —
    Debezium's delete events carry the final image in ``before``), plus
    ``_op``, ``_lsn``, ``_ts_ms``. All JVM-side (``from_json``)."""
    env = F.from_json(F.col(value_col).cast("string"), envelope_schema(row_schema))
    image = F.when(env["op"] == "d", env["before"]).otherwise(env["after"])
    return df.select(
        image.alias("_row"),
        env["op"].alias("_op"),
        env["source"]["lsn"].alias("_lsn"),
        env["ts_ms"].alias("_ts_ms"),
    ).select("_row.*", "_op", "_lsn", "_ts_ms")


def avro_envelope_schema(
    row_avro_fields: list[dict], name: str = "Envelope"
) -> dict:
    """Debezium's Avro envelope around the given row fields, matching
    what Connect's AvroConverter registers when Debezium's PostgreSQL
    connector runs with the Schema Registry (the standard production
    pairing): field order ``before, after, source, op, ts_ms,
    transaction`` and the connector's source-info block (version/
    connector/name/ts_ms/snapshot/db/sequence/schema/table/txId/lsn/
    xmin). Avro decode is positional, so the ORDER here is the wire
    contract — a different connector (MySQL's server_id/gtid/file/pos
    source, …) registers a different source struct; pass its registered
    envelope to :func:`decode_envelopes_avro` via
    ``envelope_avro_schema`` instead of relying on this default.
    ``before`` and ``after`` get distinct record NAMES (Avro forbids
    redefining one name; the wire layout is positional, so decode is
    unaffected — Debezium's own registered schema uses a named reference
    for the second occurrence, which resolves to the same bytes)."""

    def row(n: str) -> dict:
        return {"type": "record", "name": n, "fields": row_avro_fields}

    source = {
        "type": "record",
        "name": f"{name}Source",
        "fields": [
            {"name": "version", "type": "string"},
            {"name": "connector", "type": "string"},
            {"name": "name", "type": "string"},
            {"name": "ts_ms", "type": "long"},
            {"name": "snapshot", "type": ["null", "string"]},
            {"name": "db", "type": "string"},
            {"name": "sequence", "type": ["null", "string"]},
            {"name": "schema", "type": "string"},
            {"name": "table", "type": "string"},
            {"name": "txId", "type": ["null", "long"]},
            {"name": "lsn", "type": ["null", "long"]},
            {"name": "xmin", "type": ["null", "long"]},
        ],
    }
    transaction = {
        "type": "record",
        "name": f"{name}Transaction",
        "fields": [
            {"name": "id", "type": "string"},
            {"name": "total_order", "type": "long"},
            {"name": "data_collection_order", "type": "long"},
        ],
    }
    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": "before", "type": ["null", row(f"{name}Before")]},
            {"name": "after", "type": ["null", row(f"{name}After")]},
            {"name": "source", "type": source},
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": ["null", "long"]},
            {"name": "transaction", "type": ["null", transaction]},
        ],
    }


def decode_envelopes_avro(
    df: DataFrame,
    row_schema: StructType,
    row_avro_fields: list[dict],
    value_col: str = "value",
    envelope_avro_schema: dict | None = None,
    envelope_spark_schema: StructType | None = None,
) -> DataFrame:
    """Confluent-framed AVRO Debezium envelopes → flat change rows —
    same output contract as :func:`decode_envelopes` (JSON), so the
    fold and the table sink work unchanged on either serialization.

    ``row_avro_fields`` is the row's Avro field list as the WRITER
    registered it (field order and union shapes control the binary
    layout, so it cannot be inferred from the Spark schema). The
    envelope defaults to :func:`avro_envelope_schema` (the PostgreSQL
    connector's registration); for another connector, pass its
    registered envelope as ``envelope_avro_schema`` (fetched from the
    registry or supplied by the caller) plus the matching
    ``envelope_spark_schema`` — field ORDER must match the writer's
    registration because Avro decode is positional. The envelope must
    expose ``op``, ``ts_ms``, and ``source.lsn`` (or the caller can
    re-derive ``_lsn`` from its own source columns afterwards). Frame
    stripping is JVM-side; body decode is the repo's Arrow-batched
    Avro path (``avro_codec.decode_df``)."""
    from kafka_stream_spark.functions.avro_codec import decode_df

    decoded = decode_df(
        df,
        envelope_avro_schema or avro_envelope_schema(row_avro_fields),
        envelope_spark_schema or envelope_schema(row_schema),
        value_col=value_col,
    )
    image = F.when(F.col("op") == "d", F.col("before")).otherwise(
        F.col("after")
    )
    return decoded.select(
        image.alias("_row"),
        F.col("op").alias("_op"),
        F.col("source.lsn").alias("_lsn"),
        F.col("ts_ms").alias("_ts_ms"),
    ).select("_row.*", "_op", "_lsn", "_ts_ms")


def fold_latest_state(changes: DataFrame, key_cols: list[str]) -> DataFrame:
    """Change rows → current table state.

    Per key, the event with the highest ``_lsn`` wins (source-log order,
    robust to shuffled arrival); if that winner is a delete the key
    drops out — log-compaction tombstone semantics. One shuffle
    (max_by aggregate), no window sort."""
    ord_key = F.struct(F.col("_lsn"))
    others = [c for c in changes.columns if c not in key_cols]
    latest = changes.groupBy(*key_cols).agg(
        *[F.max_by(c, ord_key).alias(c) for c in others]
    )
    return latest.filter(F.col("_op") != "d").drop("_op", "_lsn", "_ts_ms")


# generation/pointer machinery is shared by every continuously-
# maintained table in the engine (ops.foreach_batch_upsert/merge too)
from kafka_stream_spark.streaming.state_table import (  # noqa: E402
    current_dir as _current_state_dir,
    partition_dir as _partition_dir,
    read_pointer as _read_pointer,
)


def _bucket_dir(path: str, bucket: int) -> str | None:
    """Bucket b's committed data dir: ``<pointed gen>/_bucket=<b>``."""
    return _partition_dir(path, "_bucket", bucket)


def _fold_with_retention(
    merged: DataFrame,
    key_cols: list[str],
    others: list[str],
    tombstone_retention_ms: int | None,
) -> DataFrame:
    """arg-max-lsn fold keeping tombstones, with the optional
    event-time retention GC (horizon trails the fold's own max
    ``_ts_ms`` — no wall clock, so a replayed batch GCs identically)."""
    ord_key = F.struct(F.col("_lsn"))
    latest = merged.groupBy(*key_cols).agg(
        *[F.max_by(c, ord_key).alias(c) for c in others]
    )
    if tombstone_retention_ms is not None:
        hi = latest.agg(F.max("_ts_ms").alias("_hi"))
        # an undated tombstone (producer omitted ts_ms) is retained, not
        # GC'd: NULL would fail the >= predicate and silently reintroduce
        # the stale-pre-image hazard retention is meant to bound
        latest = (
            latest.join(F.broadcast(hi))
            .filter(
                (F.col("_op") != "d")
                | F.col("_ts_ms").isNull()
                | (F.col("_ts_ms") >= F.col("_hi") - tombstone_retention_ms)
            )
            .drop("_hi")
        )
    return latest


def cdc_table_sink(
    stream: DataFrame,
    row_schema: StructType,
    key_cols: list[str],
    path: str,
    checkpoint: str,
    tombstone_retention_ms: int | None = None,
    n_buckets: int | None = None,
):
    """Streaming CDC topic → continuously-maintained current table.

    Each micro-batch folds its own changes, merges with the stored
    state by the same arg-max-lsn rule, and PERSISTS tombstones in the
    state — a delete keeps out-ranking stale pre-images that arrive in
    LATER batches (broker compaction's ``delete.retention.ms`` design),
    and they are hidden only at read time (:func:`read_current_table`).
    ``tombstone_retention_ms`` optionally GCs tombstones older than the
    horizon behind the state's own max ``_ts_ms`` (event-time, so replay
    deterministic) — unset keeps them forever.

    Crash safety: each batch lands as a NEW generation directory under
    ``path`` and becomes visible only by an atomic pointer-file swap —
    the live state is never deleted before its replacement is fully
    committed, so a crash mid-write (or a lost executor recomputing
    lineage) leaves the previous generation intact. Generation name is
    a pure function of batch_id, so a checkpoint-replayed batch rewrites
    its own slot: idempotent.

    ``n_buckets`` keys the state into hash buckets (``xxhash64`` of the
    key, like broker partitioning) with ONE POINTER PER BUCKET: a batch
    reads and rewrites only the buckets its keys touch, so per-batch
    cost is O(touched state), not O(|state|) — the shape that holds at
    100 TB. Pointer flips are atomic per bucket; a crash between flips
    leaves some buckets on the new generation and some on the old,
    which replay converges (per-key semantics never regress — the same
    cross-key-atomicity stance as broker compaction). The bucket count
    is pinned in a ``_BUCKETS`` file and must not change across
    restarts. Untouched buckets keep pointing at older generations;
    GC only removes generations no bucket references."""

    from kafka_stream_spark.streaming.state_table import (
        ensure_bucket_count,
        publish_partitions,
        publish_single,
    )

    def upsert_single(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        changes = decode_envelopes(batch_df, row_schema)
        # keep tombstones in the merge state: a delete must out-rank
        # rows already in the table AND stale rows in future batches,
        # so fold after merge and keep the winners — deletes included
        others = [c for c in changes.columns if c not in key_cols]
        prev = _current_state_dir(path)
        merged = (
            spark.read.parquet(prev).unionByName(changes) if prev else changes
        )
        latest = _fold_with_retention(
            merged, key_cols, others, tombstone_retention_ms
        )
        publish_single(latest, path, batch_id)

    def upsert_bucketed(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ensure_bucket_count(path, n_buckets)
        bucket_expr = F.pmod(
            F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)
        ).cast("int")
        changes = decode_envelopes(batch_df, row_schema).withColumn(
            "_bucket", bucket_expr
        )
        others = [c for c in changes.columns if c not in key_cols]
        touched = sorted(
            r["_bucket"] for r in changes.select("_bucket").distinct().collect()
        )
        if not touched:
            return
        # prior state for touched buckets only; _bucket re-derives from
        # the key (partitionBy strips it from the files)
        live = [d for b in touched if (d := _bucket_dir(path, b))]
        merged = changes
        if live:
            prior = spark.read.parquet(*live).withColumn("_bucket", bucket_expr)
            merged = prior.unionByName(changes)
        latest = _fold_with_retention(
            merged, key_cols, others, tombstone_retention_ms
        )
        publish_partitions(latest, path, batch_id, "_bucket", touched)

    upsert = upsert_single if n_buckets is None else upsert_bucketed
    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
    )


def read_current_table(spark, path: str, drop_meta: bool = True) -> DataFrame:
    """The maintained table: committed generation(s) resolved through
    the pointer file(s) — per-bucket pointers for bucketed state, the
    single pointer otherwise (falling back to a flat parquet dir for
    tables written by a plain batch fold) — tombstones hidden,
    bookkeeping columns dropped unless asked for."""
    from kafka_stream_spark.streaming.state_table import (
        BUCKETS_FILE,
        read_state,
    )

    if _read_pointer(path, BUCKETS_FILE) is not None:
        df = read_state(spark, path, partition_col="_bucket")
        if df is None:
            raise ValueError(f"no committed CDC bucket state at {path}")
    else:
        df = read_state(spark, path)
    if not drop_meta:
        return df  # raw state, tombstones included (introspection)
    if "_op" in df.columns:
        df = df.filter(F.col("_op") != "d")
    return df.drop("_op", "_lsn", "_ts_ms")
