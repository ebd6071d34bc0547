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
    """The Debezium value-envelope schema around a given row schema."""
    from pyspark.sql.types import LongType, StringType, StructField

    source = StructType(
        [
            StructField("lsn", LongType()),
            StructField("db", StringType()),
            StructField("table", StringType()),
        ]
    )
    return StructType(
        [
            StructField("before", row_schema),
            StructField("after", row_schema),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
            StructField("source", source),
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


def cdc_table_sink(
    stream: DataFrame,
    row_schema: StructType,
    key_cols: list[str],
    path: str,
    checkpoint: str,
):
    """Streaming CDC topic → continuously-maintained current table.

    Each micro-batch folds its own changes, merges with the stored
    state by the same arg-max-lsn rule, and applies tombstones LAST —
    so a delete arriving in a later batch than the insert it kills
    still wins, and a stale pre-image arriving late still loses.
    Idempotent per batch (pure function of state ∪ batch)."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        changes = decode_envelopes(batch_df, row_schema)
        # keep tombstones in the merge state: a delete must be able to
        # out-rank rows already in the table, so fold only AFTER merge
        ord_key = F.struct(F.col("_lsn"))
        others = [c for c in changes.columns if c not in key_cols]
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            merged = spark.read.parquet(path).unionByName(changes)
        else:
            merged = changes
        latest = merged.groupBy(*key_cols).agg(
            *[F.max_by(c, ord_key).alias(c) for c in others]
        )
        latest = latest.filter(F.col("_op") != "d")
        latest.cache()
        latest.count()  # materialize before overwriting the input path
        latest.write.mode("overwrite").parquet(path)
        latest.unpersist()

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
    )


def read_current_table(spark, path: str, drop_meta: bool = True) -> DataFrame:
    """The maintained table, without the CDC bookkeeping columns."""
    df = spark.read.parquet(path)
    return df.drop("_op", "_lsn", "_ts_ms") if drop_meta else df
