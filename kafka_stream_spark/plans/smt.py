"""Single-Message Transforms — Connect SMT analog (SURVEY.md §2.3 P6).

Connect pipelines rewrite records one at a time with chained SMTs (mask,
insert field, route by timestamp, …), declared in connector config. Here
each SMT is a ``DataFrame -> DataFrame`` builder; chains compose with
``apply_chain`` and stay fully declarative (Catalyst sees plain
withColumn/filter, so pushdown still works through a chain).

Implemented transforms mirror the stock Connect ones:
MaskField, InsertField, ReplaceField (rename/drop), TimestampRouter,
RegexRouter, Filter (predicate), Cast.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

Transform = Callable[[DataFrame], DataFrame]


def mask_field(name: str, mask: str = "****") -> Transform:
    """MaskField: replace the value, keep the column (PII redaction)."""
    def t(df: DataFrame) -> DataFrame:
        dt = df.schema[name].dataType.simpleString()
        repl = F.lit(mask) if dt == "string" else F.lit(None).cast(dt)
        return df.withColumn(name, repl)
    return t


def insert_field(name: str, value) -> Transform:
    """InsertField: add a static or expression field."""
    def t(df: DataFrame) -> DataFrame:
        col = value if hasattr(value, "_jc") or hasattr(value, "cast") else F.lit(value)
        return df.withColumn(name, col)
    return t


def replace_field(renames: dict[str, str] | None = None, drops: list[str] | None = None) -> Transform:
    """ReplaceField: rename and/or drop columns."""
    def t(df: DataFrame) -> DataFrame:
        out = df
        for old, new in (renames or {}).items():
            out = out.withColumnRenamed(old, new)
        if drops:
            out = out.drop(*drops)
        return out
    return t


def timestamp_router(ts_col: str, fmt: str = "yyyyMMdd", topic_col: str = "topic",
                     pattern: str = "{topic}-{timestamp}") -> Transform:
    """TimestampRouter: rewrite the topic/route by the record timestamp —
    the partitioned-sink-path analog (SURVEY.md P6)."""
    def t(df: DataFrame) -> DataFrame:
        # route on the UTC wall clock, not the session's: date_format
        # renders session-local digits, so a non-UTC session would route
        # the same instant to a different daily topic (the Mongo-$date
        # bug class from the round-2 advisory, applied to routing)
        stamped = F.date_format(
            F.to_utc_timestamp(F.col(ts_col), F.expr("current_timezone()")),
            fmt,
        )
        routed = F.lit(pattern)
        routed = F.replace(routed, F.lit("{topic}"), F.col(topic_col))
        routed = F.replace(routed, F.lit("{timestamp}"), stamped)
        return df.withColumn(topic_col, routed)
    return t


def regex_router(topic_col: str, regex: str, replacement: str) -> Transform:
    """RegexRouter: topic rename by regex."""
    def t(df: DataFrame) -> DataFrame:
        return df.withColumn(topic_col, F.regexp_replace(F.col(topic_col), regex, replacement))
    return t


def filter_predicate(predicate: str) -> Transform:
    """Filter SMT: keep records matching the SQL predicate."""
    def t(df: DataFrame) -> DataFrame:
        return df.filter(predicate)
    return t


def cast_field(name: str, to: str) -> Transform:
    """Cast SMT."""
    def t(df: DataFrame) -> DataFrame:
        return df.withColumn(name, F.col(name).cast(to))
    return t


def apply_chain(df: DataFrame, transforms: list[Transform]) -> DataFrame:
    out = df
    for t in transforms:
        out = t(out)
    return out
