"""Lenses-SQL dialect shell (SURVEY.md §3.3, entry point C).

Lenses 1.0 fronts Kafka with a SQL surface that mixes plain queries with
admin statements (reference `README.md:41-43` "A scalable SQL engine";
the stack's admin operations it fronts are in-repo:
topic list `integration-tests/kafka-tests.yml:30-32`, schema subjects
`kafka-tests.yml:127-148`). Catalyst handles every relational statement;
this shell adds only the non-relational dialect statements on top of
``spark.sql``:

    SHOW TOPICS                  -> catalog listing (name, n_columns)
    SHOW QUERIES                 -> running streaming queries (§2.11)
    DESCRIBE [TOPIC] <name>      -> column name/type rows
    SET 'key' = 'value'          -> session conf (Lenses SET statements)
    INSERT INTO <t> SELECT ...   -> processor: materialize result as view <t>
    EXPLAIN [EXTENDED] SELECT .. -> Catalyst plan rows (the shell's
                                    query-inspection surface; EXTENDED =
                                    all four plan phases)
    anything else                -> spark.sql(...) verbatim

Everything returns a DataFrame so results compose with the rest of the
engine. The relational path is 100% Catalyst — no custom parser for
queries, exactly as SURVEY.md §3.3 prescribes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.catalog import Catalog

_SET_RE = re.compile(r"^\s*SET\s+'?([\w.\-]+)'?\s*=\s*'?([^';]*?)'?\s*;?\s*$", re.I)
_DESCRIBE_RE = re.compile(r"^\s*DESCRIBE\s+(?:TOPIC\s+)?(\w+)\s*;?\s*$", re.I)
_SHOW_TOPICS_RE = re.compile(r"^\s*SHOW\s+TOPICS\s*;?\s*$", re.I)
_SHOW_QUERIES_RE = re.compile(r"^\s*SHOW\s+QUERIES\s*;?\s*$", re.I)
_INSERT_RE = re.compile(r"^\s*INSERT\s+INTO\s+(\w+)\s+(SELECT\b.*)$", re.I | re.S)
_EXPLAIN_RE = re.compile(r"^\s*EXPLAIN\s+(EXTENDED\s+)?(SELECT\b.*)$", re.I | re.S)


class LensesShell:
    """Stateful SQL session over a :class:`Catalog` (one shell ≈ one Lenses
    SQL tab). ``execute`` dispatches dialect statements; plain SQL goes to
    Catalyst untouched."""

    def __init__(self, catalog: Catalog):
        self.catalog = catalog
        self.spark: SparkSession = catalog.spark
        # the Lenses scalar library analog: engine functions callable
        # from plain SQL (Catalyst-inlined, see functions/sql_udfs.py)
        from kafka_stream_spark.functions.sql_udfs import (
            register_sql_functions,
        )

        register_sql_functions(self.spark)

    def execute(self, statement: str) -> DataFrame:
        m = _SET_RE.match(statement)
        if m:
            key, value = m.group(1), m.group(2)
            self.spark.conf.set(key, value)
            return self.spark.createDataFrame([(key, value)], ["key", "value"])

        if _SHOW_TOPICS_RE.match(statement):
            rows = [
                (name, len(self.catalog.table(name).columns))
                for name in self.catalog.names()
            ]
            return self.spark.createDataFrame(rows, ["topic", "n_columns"])

        if _SHOW_QUERIES_RE.match(statement):
            rows = [
                (q.name or "", q.id.__str__(), bool(q.isActive))
                for q in self.spark.streams.active
            ]
            schema = "name string, id string, active boolean"
            return self.spark.createDataFrame(rows, schema)

        m = _DESCRIBE_RE.match(statement)
        if m:
            df = self.catalog.table(m.group(1))
            rows = [(f.name, f.dataType.simpleString(), f.nullable) for f in df.schema]
            return self.spark.createDataFrame(rows, ["column", "type", "nullable"])

        m = _EXPLAIN_RE.match(statement)
        if m:
            extended, select = bool(m.group(1)), m.group(2).rstrip("; \n")
            qe = self.spark.sql(select)._jdf.queryExecution()
            text = qe.toString() if extended else qe.simpleString()
            rows = [(i, line) for i, line in enumerate(text.splitlines())]
            return self.spark.createDataFrame(rows, "line int, plan string")

        m = _INSERT_RE.match(statement)
        if m:
            target, select = m.group(1), m.group(2)
            result = self.spark.sql(select)
            result.createOrReplaceTempView(target)
            return result

        return self.spark.sql(statement)

    def register_topic(self, topic, value_schema=None, key_as: str = "string"):
        """Expose a topic under Lenses system-field conventions.

        Registers a temp view named after the topic with columns
        ``_key``, ``_value`` (decoded struct when ``value_schema`` is
        given, else raw string), ``_partition``, ``_offset``, ``_ts`` — so
        Lenses-style browse SQL runs verbatim through Catalyst::

            SELECT _key, _value.Speed FROM vessels
            WHERE _value.Speed > 0 AND _partition = 2 LIMIT 10

        (Lenses exposes record metadata exactly this way; the Kafka source
        metadata model is SURVEY.md §1.4.) Decoding is JVM-side
        ``from_json``; Avro topics decode via functions/avro_codec before
        registration instead.
        """
        import pyspark.sql.functions as F

        df = topic.read()
        value = F.col("value").cast("string")
        if value_schema is not None:
            value = F.from_json(value, value_schema)
        sys_df = df.select(
            F.col("key").cast(key_as).alias("_key"),
            value.alias("_value"),
            F.col("partition").alias("_partition"),
            F.col("offset").alias("_offset"),
            F.col("timestamp").alias("_ts"),
        )
        sys_df.createOrReplaceTempView(topic.name)
        return sys_df
