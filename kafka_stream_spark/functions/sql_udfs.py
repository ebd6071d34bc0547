"""SQL-declared scalar functions (Spark 4 ``CREATE FUNCTION … RETURN``)
— the Lenses-SQL scalar-library analog (SURVEY.md §2.8) exposed to the
pure-SQL surface.

Users of the shell / ``spark.sql`` path get the engine's text and
topic primitives as callable functions WITHOUT any Python in the hot
path: a SQL UDF body is inlined by Catalyst into the calling plan
(constant-folded, codegen-compiled, pushdown-transparent), so
``SELECT quality_score(text) FROM docs`` plans exactly like writing
the expression out by hand — unlike a registered Python UDF, which
would wall off pushdown and batch through Arrow.

Each function mirrors an operator-module expression so DataFrame and
SQL callers agree (parity-tested in tests/test_sql_udfs.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: name → (signature, return type, body). Bodies are pure Catalyst SQL.
_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # whitespace token count (text_analysis.text_token_count)
    "ws_token_count": (
        "(t STRING)", "INT",
        "size(split(t, ' '))",
    ),
    # distinct-ratio + length composite (text_analysis.text_quality_score)
    "quality_score": (
        "(t STRING)", "DOUBLE",
        """round(0.5 * (size(array_distinct(split(t, ' '))) * 1.0
                        / size(split(t, ' ')))
                 + 0.5 * least(size(split(t, ' ')) / 100.0, 1.0), 6)""",
    ),
    # order-insensitive content fingerprint (text_analysis.text_fingerprint)
    "doc_fingerprint": (
        "(t STRING)", "STRING",
        """md5(cast(array_join(array_sort(array_distinct(split(t, ' '))),
                               ' ') AS BINARY))""",
    ),
    # shingle-hash for dedup pre-bucketing (dedup family's xxhash64 shape)
    "shingle_hash": (
        "(t STRING)", "BIGINT",
        "xxhash64(t)",
    ),
    # Kafka default-partitioner analog (topics.FileTopic.append)
    "topic_partition_for": (
        "(k STRING, n INT)", "INT",
        "cast(pmod(xxhash64(k), n) AS INT)",
    ),
    # epoch-ns to timestamp (functions/time.py convention: ns kept as long)
    "ns_to_ts": (
        "(ns BIGINT)", "TIMESTAMP",
        "timestamp_micros(cast(ns / 1000 AS BIGINT))",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Idempotent per-session registration; returns the names."""
    for name, (sig, ret, body) in _FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    return sorted(_FUNCTIONS)
