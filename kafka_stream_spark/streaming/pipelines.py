"""Declarative pipeline registry — the Kafka Connect analog (SURVEY.md §3.2).

The reference runs dataflows from JSON connector configs POSTed to the
Connect REST API (``logs-to-kafka.sh:13-27``, ``kafka-tests.yml:165-207``:
create → status → delete). Here a pipeline spec is a dict:

    {"name": "logs",                      # connector name
     "source": {"format": "text", "path": ..., "options": {...}},
     "transform": callable | KCQL string, # df -> df, or a KCQL statement
     "sink": {"format": "parquet"|"memory"|"console"|"noop",
              "path": ..., "options": {...}},
     "trigger": {"availableNow": True} | {"processingTime": "5 seconds"},
     "checkpoint": dir}                   # ≈ consumer group (T6)

``PipelineRegistry`` validates, starts, lists, and stops them — the CRUD
surface of the Connect herder, with ``tasks.max`` replaced by source
partitioning and ``offset.flush.interval.ms`` by Spark checkpointing.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from kafka_stream_spark.plans import kcql

_SINK_FORMATS = {"parquet", "memory", "console", "noop", "kafka", "json", "csv"}


@dataclass
class Pipeline:
    name: str
    query: StreamingQuery

    @property
    def status(self) -> dict:
        return {
            "name": self.name,
            "id": str(self.query.id),
            "active": self.query.isActive,
            "status": self.query.status,
        }


class PipelineRegistry:
    """Create/list/status/delete running pipelines (Connect REST analog)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._pipelines: dict[str, Pipeline] = {}

    # -- validation (Connect herder analog, setup-and-run.sh:99-107) -------

    def validate(self, spec: dict) -> list[str]:
        problems = []
        if not spec.get("name"):
            problems.append("missing name")
        src = spec.get("source") or {}
        if not src.get("format"):
            problems.append("source.format required")
        sink = spec.get("sink") or {}
        if sink.get("format") not in _SINK_FORMATS:
            problems.append(f"sink.format must be one of {sorted(_SINK_FORMATS)}")
        if sink.get("format") in {"parquet", "json", "csv"} and not sink.get("path"):
            problems.append("file sinks need sink.path")
        return problems

    # -- lifecycle ---------------------------------------------------------

    def start(self, spec: dict) -> Pipeline:
        problems = self.validate(spec)
        if problems:
            raise ValueError(f"invalid pipeline spec: {'; '.join(problems)}")
        name = spec["name"]
        if name in self._pipelines and self._pipelines[name].query.isActive:
            raise ValueError(f"pipeline {name!r} already running")

        df = self._build_source(spec["source"])
        df = self._apply_transform(df, spec.get("transform"))
        writer = self._build_sink(df, spec)

        trigger = spec.get("trigger") or {"availableNow": True}
        writer = writer.trigger(**trigger)
        if spec.get("checkpoint"):
            writer = writer.option("checkpointLocation", spec["checkpoint"])
        q = writer.start()
        p = Pipeline(name, q)
        self._pipelines[name] = p
        return p

    def _build_source(self, src: dict) -> DataFrame:
        fmt = src["format"]
        if fmt == "kstopic":  # engine topic source: register on demand
            from kafka_stream_spark.sources.datasource import register

            register(self.spark)
        reader = self.spark.readStream.format(fmt)
        for k, v in (src.get("options") or {}).items():
            reader = reader.option(k, v)
        if src.get("schema") is not None:
            reader = reader.schema(src["schema"])
        if src.get("path"):
            return reader.load(src["path"])
        return reader.load()

    def _apply_transform(self, df: DataFrame, transform) -> DataFrame:
        if transform is None:
            return df
        if callable(transform):
            return transform(df)
        if isinstance(transform, str):
            if transform.lstrip().upper().startswith("SELECT"):
                # Lenses-processor shape (§3.3b): SQL text over the stream,
                # which is registered as the view `source`
                df.createOrReplaceTempView("source")
                return self.spark.sql(transform)
            # otherwise KCQL (P1)
            stmt = kcql.parse(transform)
            return kcql.apply(df, stmt)
        raise TypeError(f"unsupported transform: {type(transform)}")

    def _build_sink(self, df: DataFrame, spec: dict):
        sink = spec["sink"]
        fmt = sink["format"]
        writer = df.writeStream.format(fmt)
        for k, v in (sink.get("options") or {}).items():
            writer = writer.option(k, v)
        if fmt == "memory":
            writer = writer.queryName(sink.get("table", spec["name"]))
        if sink.get("path"):
            writer = writer.option("path", sink["path"])
        if sink.get("output_mode"):
            writer = writer.outputMode(sink["output_mode"])
        return writer

    # -- CRUD surface (kafka-tests.yml:179-207) ----------------------------

    def list(self) -> list[str]:
        return sorted(self._pipelines)

    def status(self, name: str) -> dict:
        return self._pipelines[name].status

    def stop(self, name: str) -> None:
        self._pipelines[name].query.stop()

    def delete(self, name: str) -> None:
        p = self._pipelines.pop(name)
        if p.query.isActive:
            p.query.stop()

    def await_all(self, timeout_s: float | None = None) -> None:
        for p in self._pipelines.values():
            if p.query.isActive:
                p.query.awaitTermination(timeout_s)
