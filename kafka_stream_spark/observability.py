"""Observability (SURVEY.md §2.11): the engine-side analog of the
reference's JMX metrics + topics UI + connector status surface.

- ``MetricsListener``: a ``StreamingQueryListener`` collecting per-query
  progress (rows/sec, batch durations, state rows) — the JMX analog
  (``setup-and-run.sh:12-16`` exposes JMX on every service).
- ``list_active``: running-query inventory (``spark.streams.active`` —
  the Connect status / Lenses processor-list analog).
- ``topic_stats``: per-dataset row/partition stats (topics-UI counts,
  ``kafka-tests.yml:14-18`` record-count assertions).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QueryMetrics:
    name: str
    run_id: str
    batches: int = 0
    total_input_rows: int = 0
    last_rows_per_second: float = 0.0
    last_batch_duration_ms: float = 0.0
    state_rows: int = 0


class MetricsListener(StreamingQueryListener):
    """Collects per-query progress; attach with ``spark.streams.addListener``."""

    def __init__(self) -> None:
        self.metrics: dict[str, QueryMetrics] = {}

    def onQueryStarted(self, event) -> None:
        self.metrics[str(event.runId)] = QueryMetrics(
            name=event.name or str(event.id), run_id=str(event.runId)
        )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        m = self.metrics.setdefault(
            str(p.runId), QueryMetrics(name=p.name or str(p.id), run_id=str(p.runId))
        )
        m.batches += 1
        m.total_input_rows += int(p.numInputRows or 0)
        m.last_rows_per_second = float(p.processedRowsPerSecond or 0.0)
        m.last_batch_duration_ms = float((p.durationMs or {}).get("triggerExecution", 0))
        state = p.stateOperators or []
        m.state_rows = sum(int(s.numRowsTotal or 0) for s in state)

    def onQueryTerminated(self, event) -> None:  # keep final metrics
        pass

    def onQueryIdle(self, event) -> None:
        pass

    def snapshot(self) -> list[QueryMetrics]:
        return sorted(self.metrics.values(), key=lambda m: m.name)


def list_active(spark: SparkSession) -> list[dict]:
    """Running streaming queries (Lenses processor list / Connect status)."""
    return [
        {"id": str(q.id), "runId": str(q.runId), "name": q.name, "active": q.isActive}
        for q in spark.streams.active
    ]


def topic_stats(df: DataFrame, partition_col: str | None = "partition") -> dict:
    """Record/partition counts for a dataset (topics-UI sizing surface)."""
    total = df.count()
    out = {"rows": total}
    if partition_col and partition_col in df.columns:
        per = (
            df.groupBy(partition_col)
            .agg(F.count(F.lit(1)).alias("n"), F.max("offset").alias("max_offset"))
            .orderBy(partition_col)
            .collect()
        )
        out["partitions"] = {int(r[partition_col]): int(r["n"]) for r in per}
    return out


def consumer_lag(topic_root: str, topic: str, checkpoint_dir: str) -> dict:
    """Per-partition consumer lag for a kstopic-sourced query — the
    engine's ``kafka-consumer-groups --describe`` analog (the
    reference's group-management flows, kafka-tests.yml:44-63).

    Committed positions come from the query's checkpoint offset log
    (the LAST entry in ``offsets/``, the batch Spark has planned);
    end offsets from the topic directory's bookkeeping columns. A
    query that has consumed everything reports lag 0 per partition.
    """
    import json
    import os

    from kafka_stream_spark.sources.datasource import _end_offsets

    ends = _end_offsets(os.path.join(topic_root, topic))
    committed: dict[int, int] = {}
    offs_dir = os.path.join(checkpoint_dir, "offsets")
    if os.path.isdir(offs_dir):
        seqs = sorted(int(f) for f in os.listdir(offs_dir)
                      if not f.startswith("."))
        if seqs:
            last = open(os.path.join(offs_dir, str(seqs[-1]))) \
                .read().strip().splitlines()[-1]
            d = json.loads(last)
            if isinstance(d, str):
                d = json.loads(d)
            for k, v in d.items():
                # multi-topic checkpoints qualify keys as "topic:p";
                # keep only this topic's entries
                if ":" in str(k):
                    t, _, p = str(k).rpartition(":")
                    if t == topic:
                        committed[int(p)] = int(v)
                else:
                    committed[int(k)] = int(v)
    parts = sorted(set(ends) | set(committed))
    per = [
        {
            "partition": p,
            "end_offset": ends.get(p, 0),
            "committed": committed.get(p, 0),
            "lag": max(0, ends.get(p, 0) - committed.get(p, 0)),
        }
        for p in parts
    ]
    return {
        "topic": topic,
        "partitions": per,
        "total_lag": sum(x["lag"] for x in per),
    }
