"""KCQL-routed connector sinks — one declarative entry point across the
sink families, mirroring how Stream Reactor connectors are configured:
a connector = a KCQL statement + a target system + connection details.

``kcql_connector_sink`` parses the KCQL, applies its projection/rename/
filter to the stream (Catalyst still prunes through it), and routes to
the family's renderer:

- ``redis``   — cache mode (``SET prefix+pk json``) by default;
  ``STOREAS SortedSet`` switches to ``ZADD`` with the first PK column as
  the score (Stream Reactor's documented mode mapping). Records are
  RESP-encoded per partition and handed to the transport as wire bytes.
- ``cassandra`` — ``INSERT INTO ks.table`` with the KCQL PK as the
  partition key (single-partition UNLOGGED batches, `cassandra.py`).
- ``influx``  — the KCQL target is the measurement; PK columns become
  tags, remaining non-timestamp columns become fields (`influx.py`).
- ``hbase``   — the KCQL PK composes the rowkey; non-key columns become
  ``family:qualifier`` cells with row-atomic put batching (`hbase.py`).
- ``mongo``   — the KCQL target is ``database.collection``; documents
  render as Extended JSON with the PK as ``_id``; ``UPSERT INTO``
  switches insertMany to idempotent replaceOne bulkWrites (`mongo.py`).
- ``jms``     — the KCQL target is the destination (queue/topic path);
  records become STOMP 1.2 SEND frames with the PK as
  JMSCorrelationID (`sources/stomp_codec.py`).
- ``elastic`` — the KCQL target is the index; the first PK column is
  the document id (`elastic.py`).
- ``kudu``    — Impala-dialect ``UPSERT/INSERT INTO`` row ops routed by
  the KCQL ``DISTRIBUTEBY a,b INTO n BUCKETS`` hash partitioning
  (`kudu.py`).
- ``voltdb``  — auto-CRUD stored-procedure invocations
  (``exec TABLE.upsert p1, ...;``) grouped by the partitioning column
  (`voltdb.py`).
- ``rethink`` — ReQL insert ops with the KCQL write mode as the
  conflict policy (INSERT→error, UPSERT→replace) (`rethink.py`).
- ``hazelcast`` — distributed-structure ops selected by ``STOREAS``
  (RELIABLE_TOPIC/MAP/QUEUE/RING_BUFFER/…), JSON payloads
  (`hazelcast.py`).
- ``documentdb`` — Cosmos-style JSON document create ops with the PK as
  ``id`` and UPSERT→is_upsert (`documentdb.py`).

Each family keeps its own transport seam, so every sink is testable
without its server and swaps to a real client without touching the
rendering path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kafka_stream_spark.plans import kcql
from kafka_stream_spark.sources import resp_codec
from kafka_stream_spark.streaming.cassandra import cassandra_sink
from kafka_stream_spark.streaming.elastic import elastic_sink
from kafka_stream_spark.streaming.hbase import hbase_sink
from kafka_stream_spark.streaming.influx import influx_sink
from kafka_stream_spark.sources.stomp_codec import jms_sink
from kafka_stream_spark.streaming.documentdb import documentdb_sink
from kafka_stream_spark.streaming.hazelcast import hazelcast_sink
from kafka_stream_spark.streaming.kudu import kudu_sink
from kafka_stream_spark.streaming.mongo import mongo_sink
from kafka_stream_spark.streaming.rethink import rethink_sink
from kafka_stream_spark.streaming.voltdb import voltdb_sink


def redis_sink(
    stream: DataFrame,
    key_col: str,
    transport,
    checkpoint: str,
    prefix: str = "",
    sorted_set: str | None = None,
    score_col: str | None = None,
):
    """Streaming Redis writer: render commands JVM-side (`resp_codec`
    cache/sorted-set shapes), RESP-encode per partition, send wire bytes
    through the transport. At-least-once; SET/ZADD are idempotent."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if sorted_set:
            rendered = resp_codec.sorted_set_commands(
                batch_df, sorted_set, score_col or key_col
            )
        else:
            rendered = resp_codec.cache_commands(batch_df, key_col, prefix)

        def send_partition(rows) -> None:
            buf = bytearray()
            for r in rows:
                if sorted_set:
                    buf += resp_codec.encode_command(
                        r["cmd"], r["key"], repr(r["score"]), r["value"]
                    )
                else:
                    buf += resp_codec.encode_command(r["cmd"], r["key"], r["value"])
            if buf:
                transport(bytes(buf))

        rendered.foreachPartition(send_partition)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )


def kcql_connector_sink(
    stream: DataFrame,
    statement: str,
    system: str,
    transport,
    checkpoint: str,
    ts_col: str | None = None,
    ttl: int | None = None,
    family: str = "d",
):
    """KCQL statement + system → a started-ready DataStreamWriter."""
    stmt = kcql.parse(statement)
    df = kcql.apply(stream, stmt)
    pk = list(stmt.pk)
    if system == "redis":
        if not pk:
            raise ValueError("redis sink needs PK (the cache key / score)")
        storeas = (stmt.storeas or "").lower()
        if storeas == "sortedset":
            return redis_sink(
                df, pk[0], transport, checkpoint,
                sorted_set=stmt.target, score_col=pk[0],
            )
        return redis_sink(df, pk[0], transport, checkpoint, prefix=f"{stmt.target}:")
    if system == "cassandra":
        if not pk:
            raise ValueError("cassandra sink needs PK (the partition key)")
        ks, _, table = stmt.target.partition(".")
        if not table:
            raise ValueError(f"cassandra target must be keyspace.table: {stmt.target}")
        return cassandra_sink(df, ks, table, pk, transport, checkpoint, ttl=ttl)
    if system == "influx":
        if not ts_col:
            raise ValueError("influx sink needs ts_col")
        fields = [c for c in df.columns if c not in pk and c != ts_col]
        return influx_sink(
            df, stmt.target, pk, fields, ts_col, transport, checkpoint
        )
    if system == "hbase":
        if not pk:
            raise ValueError("hbase sink needs PK (the composite rowkey)")
        return hbase_sink(df, family, pk, transport, checkpoint)
    if system == "mongo":
        db, _, coll = stmt.target.partition(".")
        if not coll:
            raise ValueError(f"mongo target must be database.collection: {stmt.target}")
        upsert = stmt.write_mode == "upsert"
        if upsert and not pk:
            raise ValueError("mongo UPSERT needs PK (the _id filter)")
        return mongo_sink(
            df, db, coll, pk or None, transport, checkpoint, upsert=upsert
        )
    if system == "jms":
        if not pk:
            raise ValueError("jms sink needs PK (the JMSCorrelationID)")
        return jms_sink(df, stmt.target, pk[0], transport, checkpoint)
    if system == "kudu":
        if not pk:
            raise ValueError("kudu sink needs PK (the Kudu primary key)")
        return kudu_sink(
            df, stmt.target, pk, transport, checkpoint,
            upsert=stmt.write_mode == "upsert",
            distribute_cols=list(stmt.distributeby) or None,
            buckets=stmt.buckets,
        )
    if system == "voltdb":
        if not pk:
            raise ValueError("voltdb sink needs PK (the partitioning column)")
        return voltdb_sink(
            df, stmt.target, pk, transport, checkpoint,
            upsert=stmt.write_mode == "upsert",
        )
    if system == "rethink":
        if not pk:
            raise ValueError("rethink sink needs PK (the document id)")
        db, _, table = stmt.target.partition(".")
        if not table:
            raise ValueError(f"rethink target must be db.table: {stmt.target}")
        return rethink_sink(
            df, db, table, pk, transport, checkpoint,
            upsert=stmt.write_mode == "upsert",
        )
    if system == "hazelcast":
        return hazelcast_sink(
            df, stmt.target, pk, transport, checkpoint,
            storeas=stmt.storeas or "reliable_topic",
        )
    if system == "documentdb":
        if not pk:
            raise ValueError("documentdb sink needs PK (the document id)")
        db, _, coll = stmt.target.partition(".")
        if not coll:
            raise ValueError(
                f"documentdb target must be database.collection: {stmt.target}"
            )
        return documentdb_sink(
            df, db, coll, pk, transport, checkpoint,
            upsert=stmt.write_mode == "upsert",
        )
    if system == "elastic":
        return (
            elastic_sink(df, stmt.target, transport, id_col=pk[0] if pk else None)
            .option("checkpointLocation", checkpoint)
        )
    if system in ("hdfs", "s3"):
        # storage families: the "connection" IS a base path (transport,
        # a str); the KCQL target is the bucket/container prefix under
        # it; PARTITIONBY selects the FieldPartitioner layout; STOREAS/
        # WITHFORMAT picks parquet/json/avro (the connectors' format set)
        from kafka_stream_spark.streaming.object_store import (
            field_partitioner,
            object_store_stream_sink,
        )

        if not isinstance(transport, str):
            raise ValueError(f"{system} sink transport must be a base path")
        fmt = (stmt.withformat or stmt.storeas or "parquet").lower()
        part = (
            field_partitioner(stmt.source, stmt.partitionby[0])
            if stmt.partitionby
            else None
        )
        out_dir = f"{transport.rstrip('/')}/{stmt.target}"
        # the file contract needs (partition, offset) bookkeeping even
        # when the KCQL projection narrows the record — re-project from
        # the stream with them retained (the connectors do the same:
        # offsets ride the SinkRecord, not the projected value)
        out_cols = {a or n for n, a in stmt.projections}
        if not stmt.is_star and not {"partition", "offset"} <= out_cols:
            import pyspark.sql.functions as F

            keep = [
                F.col(n).alias(a) if a else F.col(n)
                for n, a in stmt.projections
                if n not in stmt.ignore
            ]
            extra = [
                F.col(c) for c in ("partition", "offset") if c not in out_cols
            ]
            df = stream.filter(stmt.where) if stmt.where else stream
            df = df.select(*keep, *extra)
        return object_store_stream_sink(
            df, out_dir, stmt.source, checkpoint, fmt=fmt, partitioner=part
        )
    raise ValueError(f"unknown connector system: {system}")
