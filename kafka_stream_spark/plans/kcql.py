"""KCQL-subset parser → DataFrame operations.

The reference routes and reshapes records with KCQL (Kafka Connect Query
Language) inside Stream Reactor connectors (``web/env.js:12-14`` — "Source
& Sink connectors collection (20+) supporting KCQL"; SURVEY.md §2.3 P1).
Grammar subset implemented (KCQL 0.3.0 public syntax):

    INSERT INTO <target> | UPSERT INTO <target>
    SELECT <field | field AS alias | *> [, ...]
    FROM <source>
    [IGNORE <field> [, ...]]
    [PK <field> [, ...]]
    [WITHWHERE <predicate>]        -- engine extension: Lenses-style filter
    [LIMIT <n>]                    -- engine extension: browse queries
    [AUTOCREATE] [STOREAS <fmt>] [WITHFORMAT <fmt>]

The parse result lowers onto any DataFrame: projection/rename → ``select``
+ ``alias``; IGNORE → ``drop``; PK → key columns (used by keyed sinks for
partitioning, Kafka-key semantics); WITHWHERE → ``filter``. Everything
stays declarative, so Catalyst still prunes/pushes down through it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_KCQL_RE = re.compile(
    r"""
    ^\s*(?P<mode>INSERT|UPSERT)\s+INTO\s+(?P<target>\S+)
    \s+SELECT\s+(?P<select>.+?)
    \s+FROM\s+(?P<source>\S+)
    (?:\s+IGNORE\s+(?P<ignore>[\w\s,]+?))?
    (?:\s+PK\s+(?P<pk>[\w\s,]+?))?
    (?:\s+PARTITIONBY\s+(?P<partitionby>[\w\s,]+?))?
    (?:\s+DISTRIBUTEBY\s+(?P<distributeby>[\w\s,]+?)
        \s+INTO\s+(?P<buckets>\d+)\s+BUCKETS)?
    (?:\s+WITHWHERE\s+(?P<where>.+?))?
    (?:\s+LIMIT\s+(?P<limit>\d+))?
    (?:\s+AUTOCREATE)?
    (?:\s+STOREAS\s+(?P<storeas>\w+))?
    (?:\s+WITHFORMAT\s+(?P<withformat>\w+))?
    \s*$
    """,
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)


@dataclass(frozen=True)
class KcqlStatement:
    target: str
    source: str
    projections: tuple[tuple[str, str | None], ...]  # (field, alias) ; ("*", None)
    ignore: tuple[str, ...] = ()
    pk: tuple[str, ...] = ()
    where: str | None = None
    limit: int | None = None
    storeas: str | None = None
    withformat: str | None = None
    #: "insert" | "upsert" — Stream Reactor KCQL write mode (UPSERT INTO
    #: replaces the document/row matching PK instead of appending)
    write_mode: str = "insert"
    #: Kudu-family hash partitioning: DISTRIBUTEBY cols INTO n BUCKETS
    distributeby: tuple[str, ...] = ()
    buckets: int | None = None
    #: storage-family directory layout: PARTITIONBY f1 [, f2] (S3/HDFS
    #: connectors' FieldPartitioner selection)
    partitionby: tuple[str, ...] = ()

    @property
    def is_star(self) -> bool:
        return len(self.projections) == 1 and self.projections[0][0] == "*"


def parse(statement: str) -> KcqlStatement:
    m = _KCQL_RE.match(statement)
    if not m:
        raise ValueError(f"unparseable KCQL: {statement!r}")
    projections: list[tuple[str, str | None]] = []
    for item in m.group("select").split(","):
        item = item.strip()
        if not item:
            continue
        am = re.match(r"(\S+)\s+AS\s+(\S+)", item, re.IGNORECASE)
        if am:
            projections.append((am.group(1), am.group(2)))
        else:
            projections.append((item, None))
    split_list = lambda s: tuple(x.strip() for x in s.split(",") if x.strip()) if s else ()
    return KcqlStatement(
        target=m.group("target"),
        source=m.group("source"),
        projections=tuple(projections),
        ignore=split_list(m.group("ignore")),
        pk=split_list(m.group("pk")),
        where=m.group("where"),
        limit=int(m.group("limit")) if m.group("limit") else None,
        storeas=m.group("storeas"),
        withformat=m.group("withformat"),
        write_mode=m.group("mode").lower(),
        distributeby=split_list(m.group("distributeby")),
        buckets=int(m.group("buckets")) if m.group("buckets") else None,
        partitionby=split_list(m.group("partitionby")),
    )


def apply(df: DataFrame, stmt: KcqlStatement) -> DataFrame:
    """Lower a parsed KCQL statement onto a DataFrame."""
    out = df
    if stmt.where:
        out = out.filter(stmt.where)
    if stmt.is_star:
        if stmt.ignore:
            out = out.drop(*stmt.ignore)
    else:
        cols = [
            F.col(name).alias(alias) if alias else F.col(name)
            for name, alias in stmt.projections
            if name not in stmt.ignore
        ]
        out = out.select(*cols)
    if stmt.limit is not None:
        out = out.limit(stmt.limit)
    return out


def run(statement: str, tables: dict[str, DataFrame]) -> tuple[str, DataFrame]:
    """Parse + apply against a catalog; returns (target, DataFrame)."""
    stmt = parse(statement)
    if stmt.source not in tables:
        raise KeyError(f"KCQL source not in catalog: {stmt.source!r}")
    return stmt.target, apply(tables[stmt.source], stmt)
