"""One front door for a user switching from the reference stack.

The reference (FireMonkey69/kafka-stream) hands a user four surfaces:
topics+SQL browsing (Lenses, README.md:41-43), a schema registry,
Connect pipelines, and the REST proxy. This facade composes the
engine's analogs behind a single object so that switching is one
import:

    from kafka_stream_spark.engine import Engine
    eng = Engine(spark, "/root/testdata/sf0.01")
    eng.sql("SELECT event_type, count(*) n FROM events GROUP BY 1")
    eng.shell("SHOW TOPICS")                 # Lenses-dialect shell
    eng.browse("orders", where="o_totalprice > 400000", limit=5)
    eng.query("dedup_minhash_lsh")           # any registered operator
    eng.queries()                            # ... and their names
    eng.schemas.register("events", SCHEMA)   # SR analog
    eng.pipelines.start(PIPELINE_SPEC)       # Connect analog
    eng.topic("clicks")                      # keyed/partitioned topic
    srv = eng.proxy()                        # REST proxy over HTTP

Everything here delegates; no logic lives in the facade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.catalog import Catalog
from kafka_stream_spark.plans.lenses_sql import LensesShell
from kafka_stream_spark.registry import load_all
from kafka_stream_spark.schema_registry import SchemaRegistry
from kafka_stream_spark.sources.topics import FileTopic
from kafka_stream_spark.streaming.pipelines import PipelineRegistry


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str, topic_root: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir
        self.catalog = Catalog(spark, sf_dir)
        self._shell = LensesShell(self.catalog)
        self.schemas = SchemaRegistry()
        self.pipelines = PipelineRegistry(spark)
        self._topic_root = topic_root
        self._specs = load_all()

    # --- query surfaces ---------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        """ANSI SQL over the catalog tables (Catalyst end to end)."""
        return self.catalog.sql(query)

    def shell(self, statement: str) -> DataFrame:
        """Lenses-dialect shell: SHOW/DESCRIBE/SET/SELECT/INSERT INTO."""
        return self._shell.execute(statement)

    def browse(self, name: str, where: str | None = None, limit: int = 100) -> DataFrame:
        return self.catalog.browse(name, where=where, limit=limit)

    def table(self, name: str) -> DataFrame:
        return self.catalog.table(name)

    # --- registered operators --------------------------------------------

    def queries(self) -> list[str]:
        return sorted(self._specs)

    def query(self, name: str) -> DataFrame:
        """Run a registered operator against this engine's dataset dir."""
        if name not in self._specs:
            raise KeyError(f"unknown query: {name!r} (see .queries())")
        return self._specs[name].build(self.spark, self.sf_dir)

    def describe(self, name: str) -> str:
        return self._specs[name].description

    # --- topics -----------------------------------------------------------

    def topic(self, name: str, partitions: int = 4) -> FileTopic:
        """Keyed, partitioned, compactable topic (Kafka-record semantics)."""
        if self._topic_root is None:
            raise ValueError("Engine(topic_root=...) required for topics")
        return FileTopic(self.spark, self._topic_root, name, partitions=partitions)

    def proxy(self, port: int = 0, partitions: int = 4):
        """Started REST-proxy server over this engine's topic root and
        schema registry (Confluent-proxy-v1 shim; the fourth reference
        surface). Caller stops it: ``srv = eng.proxy(); ...; srv.stop()``.
        """
        from kafka_stream_spark.sources.rest_proxy import RestProxy, RestProxyServer

        if self._topic_root is None:
            raise ValueError("Engine(topic_root=...) required for the proxy")
        p = RestProxy(
            self.spark, self._topic_root, partitions=partitions,
            registry=self.schemas,
        )
        return RestProxyServer(p, port=port).start()

    def topic_df(self, name: str, **options) -> DataFrame:
        """Batch topic scan through the ``kstopic`` data source — the
        offset-addressed read path (startingOffsets / endingOffsets
        JSON accepted as options), partition-pruned via parquet
        row-group stats rather than a whole-directory read."""
        if self._topic_root is None:
            raise ValueError("Engine(topic_root=...) required for topics")
        from kafka_stream_spark.sources.datasource import register

        register(self.spark)
        r = (self.spark.read.format("kstopic")
             .option("root", self._topic_root).option("topic", name))
        for k, v in options.items():
            r = r.option(k, v)
        return r.load()

    def topic_stream(self, name: str, **options) -> DataFrame:
        """Streaming subscribe through ``kstopic``: Kafka-source offset
        contract (checkpointed per-partition ranges, startingOffsets,
        maxOffsetsPerTrigger admission control)."""
        if self._topic_root is None:
            raise ValueError("Engine(topic_root=...) required for topics")
        from kafka_stream_spark.sources.datasource import register

        register(self.spark)
        r = (self.spark.readStream.format("kstopic")
             .option("root", self._topic_root).option("topic", name))
        for k, v in options.items():
            r = r.option(k, v)
        return r.load()

    def dump_segments(self, name: str, out_dir: str,
                      compression: str = "none") -> list[str]:
        """Export a topic as wire-true Kafka log segments (magic-v2
        record batches, CRC-32C, broker data-dir layout) — the format
        interchange path for tooling that reads real broker dirs."""
        from kafka_stream_spark.sources.kafka_segment import (
            export_topic_segments,
        )

        return export_topic_segments(
            self.topic(name).read(), out_dir, compression=compression
        )

    def load_segments(self, path: str) -> DataFrame:
        """Ingest Kafka log segments (e.g. copied from a broker data
        dir) back into the topic envelope, CRC-validated, decoded
        distributed via binaryFile + mapInPandas."""
        from kafka_stream_spark.sources.kafka_segment import segments_to_df

        return segments_to_df(self.spark, path)
