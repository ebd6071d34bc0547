"""HazelCast sink shape — the Stream Reactor HazelCast-connector family
(S12) re-expressed the Spark-idiomatic way.

The reference's Connect distribution ships the Stream Reactor HazelCast
sink (Dockerfile:43-52): KCQL-mapped Kafka records land in a HazelCast
distributed structure, selected by ``STOREAS`` — RELIABLE_TOPIC (the
default publish/subscribe), MAP (keyed put), QUEUE / RING_BUFFER
(append) — with JSON payload serialization (the connector's documented
``WITHFORMAT JSON`` default). No HazelCast client exists in this
container, so the sink splits like the other families:

- the EXPENSIVE part — rendering each record as (structure, op, key,
  json) — runs distributed and JVM-side;
- entries batch per Spark partition into op payloads the client-side
  loop applies verbatim (``map.put(k, v)`` / ``queue.offer(v)`` /
  ``ringBuffer.addAll(batch)`` / ``topic.publish(v)``);
- the TRANSPORT is a pluggable callable; a real ``hazelcast.HazelcastClient``
  is a drop-in.

Public interfaces: HazelCast client API semantics (hazelcast.org public
docs), KCQL (``plans/kcql.py``).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: STOREAS → (structure kind, whether entries are keyed)
STRUCTURES = {
    "reliable_topic": ("reliable_topic", False),
    "map": ("map", True),
    "multi_map": ("multi_map", True),
    "queue": ("queue", False),
    "set": ("set", False),
    "list": ("list", False),
    "ring_buffer": ("ring_buffer", False),
    "icache": ("icache", True),
}


def render_entries(
    df: DataFrame, pk_cols: list[str], keyed: bool
) -> DataFrame:
    """Rows → (key, value): JSON value always; key only for keyed
    structures (composite KCQL PK, HazelCast's map/cache key)."""
    if keyed and not pk_cols:
        raise ValueError("keyed HazelCast structures need a KCQL PK")
    key = (
        F.concat_ws("|", *[F.col(c).cast("string") for c in pk_cols])
        if keyed
        else F.lit(None).cast("string")
    )
    return df.select(
        key.alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
    )


def op_payloads(
    entries: list[tuple[str | None, str]],
    target: str,
    structure: str,
    keyed: bool,
    max_batch: int,
) -> list[str]:
    """(key, value) entries → batched op payload JSON strings."""
    out = []
    for i in range(0, len(entries), max_batch):
        chunk = entries[i : i + max_batch]
        ops = [
            ('{"key": %s, "value": %s}' % (json.dumps(k), v))
            if keyed
            else v
            for k, v in chunk
        ]
        out.append(
            '{"structure": %s, "target": %s, "entries": [%s]}'
            % (json.dumps(structure), json.dumps(target), ", ".join(ops))
        )
    return out


def hazelcast_sink(
    stream: DataFrame,
    target: str,
    pk_cols: list[str],
    transport,
    checkpoint: str,
    storeas: str = "reliable_topic",
    max_batch: int = 100,
):
    """Streaming writer: render entries JVM-side, send batched structure
    ops. Keyed puts are replay-idempotent; topic/queue appends follow
    the connector's at-least-once posture."""
    kind = (storeas or "reliable_topic").lower()
    if kind not in STRUCTURES:
        raise ValueError(f"unknown HazelCast STOREAS: {storeas}")
    structure, keyed = STRUCTURES[kind]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rendered = render_entries(batch_df, pk_cols, keyed)

        def send_partition(rows) -> None:
            entries = [(r["key"], r["value"]) for r in rows]
            for payload in op_payloads(entries, target, structure, keyed, max_batch):
                transport(payload)

        rendered.foreachPartition(send_partition)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
