"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

The reference's extension points are Kafka Streams' Processor API and
pluggable Connect converters — arbitrary per-record Java. The Spark-native
equivalents, in preference order (UDFs are the slow path; everything that
CAN be a built-in expression should be):

- X1 scalar: ``@pandas_udf`` (Arrow-batched, 10-100× row-at-a-time Python)
- X3 UDAF: ``pandas_udf`` GROUPED_AGG
- X4 UDTF (1→N): array-returning expression + ``explode`` (JVM-side), or a
  Python UDTF where logic demands it
- stateful: ``applyInPandasWithState`` (streaming/stateful.py)

These examples are real operators used by tests; they double as the
documented pattern for users plugging custom logic in.
"""

from __future__ import annotations

import math

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# returnType as a DataType instance, NOT a DDL string: string parsing needs
# an active SparkSession, which would make this module import-order-fragile
@pandas_udf(DoubleType())
def haversine_km(
    lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
) -> pd.Series:
    """Vectorized great-circle distance (AIS/taxi geo enrichment).

    A scalar Pandas UDF: one Arrow batch in, one out — no per-row Python.
    """
    import numpy as np

    r = 6371.0
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = np.radians(lat2 - lat1)
    dl = np.radians(lon2 - lon1)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return pd.Series(2 * r * np.arcsin(np.sqrt(a)))


@pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF (X3): aggregate over a group's Arrow batch."""
    import numpy as np

    vals = v.dropna()
    if len(vals) == 0:
        return float("nan")
    return float(np.exp(np.log(vals.clip(lower=1e-300)).mean()))


def ngrams(tokens: Column, n: int = 2) -> Column:
    """UDTF-style 1→N as a JVM expression: token n-grams ready to explode.

    Takes an already-materialized ``array<string>`` column (pass tokens, not
    ``split(text)`` inline — Catalyst would inline the split into every
    lambda element; see operators/dedup.py for the measured cost).
    Prefer this shape over a Python UDTF — it stays in codegen.
    """
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.array_join(F.slice(tokens, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# X4: Python UDTF (Spark 4) — table function with per-row 1→N expansion
# ---------------------------------------------------------------------------
# The JVM-side `ngrams` expression above stays the hot path; this is the
# escape hatch for 1→N logic that genuinely needs Python (custom tokenizers,
# format sniffers). Registered per-session via register_udtfs().

try:  # pragma: no cover - import guard for older PySpark
    from pyspark.sql.functions import udtf

    @udtf(returnType="gram: string, pos: int")
    class NGramsUDTF:
        """LATERAL-joinable n-gram expansion: one output row per n-gram."""

        def eval(self, text: str, n: int):
            if not text:
                return
            toks = text.split(" ")
            for i in range(max(len(toks) - n + 1, 0)):
                yield " ".join(toks[i : i + n]), i

    HAS_UDTF = True
except ImportError:  # pragma: no cover
    NGramsUDTF = None
    HAS_UDTF = False


def register_udtfs(spark) -> None:
    """Register the Python UDTF surface under stable SQL names."""
    if HAS_UDTF:
        spark.udtf.register("ngrams_udtf", NGramsUDTF)
