"""Query registry: one place where Spark queries and their DuckDB oracles live.

Every operator claimed in SURVEY.md §2 registers here as a named query
(``(spark, sf_dir) -> DataFrame``) plus, when SQL-expressible, an ANSI-SQL
oracle string DuckDB runs over the same parquet tables. Keeping both in one
``@query`` call is what keeps column names/aliases in sync — the driver's
compare hashes values under sorted column names.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    description: str = ""
    bench: bool = False  # include in bench.py headline suite


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None,
    description: str = "",
    bench: bool = False,
):
    """Decorator registering a (builder, oracle) pair under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name, fn, oracle, description, bench)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return QUERIES."""
    from kafka_stream_spark.operators import (  # noqa: F401
        relational,
        relational_ext,
        windows,
        dedup,
        similarity,
        text_analysis,
        multimodal,
        sql_surface,
        skew,
        analytics_ext,
        bitext,
        bpe,
        curation_ext,
        components,
        embedding_stats,
        entity_resolution,
        geo,
        event_analytics,
        graph_rank,
        layout_audit,
        timeseries,
        olap_ext,
        search,
        tpch_more,
        tpch_deep,
        tpch_partsupp,
        semdedup,
        unigram,
        sequence_stats,
        sketches_bloom,
        sketches_histogram,
        sketches_kmv,
    )
    from kafka_stream_spark.plans import kcql_queries  # noqa: F401

    # Interleave round-robin by defining module so that ANY prefix of
    # the registry samples every operator family — the driver's
    # correctness gate verifies only the first 50 entries, and a
    # module-sequential order would leave whole families (tokenizers,
    # curation, graph, multimodal, sketches) outside the verified
    # window (VERDICT r3, next-round item 2).
    by_mod: dict[str, list[str]] = {}
    for name, spec in QUERIES.items():
        by_mod.setdefault(spec.build.__module__, []).append(name)
    lanes = list(by_mod.values())
    width = max(len(lane) for lane in lanes)
    order = [lane[i] for i in range(width) for lane in lanes if i < len(lane)]

    # Rotate the verification window across rounds: a STABLE order means
    # the driver re-verifies the same 50 queries forever (VERDICT r4,
    # next-round item 2). Queries already green in a committed
    # CORRECTNESS_r*.json move behind the never-driver-verified ones
    # (round-robin order preserved within each class), so each round's
    # 50-query window covers new ground until every query has a green
    # driver row. q1_pricing_summary stays first as the entry smoke.
    seen = _driver_verified_names()
    order.sort(key=lambda n: (n != "q1_pricing_summary", n in seen and n != "q1_pricing_summary"))
    reordered = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered)
    return QUERIES


def _driver_verified_names() -> set[str]:
    """Names with a fully-green row in any committed driver
    CORRECTNESS_r*.json (repo root). Failed rows don't count as seen —
    they should re-enter the window until green."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("err") is None
                and r.get("hash_match") is not False
            ):
                seen.add(name)
    return seen
