"""Streaming fuzzy deduplication (north-star A6 in streaming form).

Batch MinHash-LSH (operators/dedup.py) finds near-dup *pairs*; the
streaming variant answers the online question: "have I already seen a
near-duplicate of this document?" — drop it if any LSH band signature
was seen inside the watermark.

Mechanics: an Arrow-batched pandas UDF computes the MinHash band
signatures (same md5-based hash family as the batch operator), the doc
explodes into one row per band, and ``dropDuplicatesWithinWatermark``
keyed on (band, signature) keeps only the first arrival per band bucket.
A doc survives only if ALL its bands survive (count == n_bands after
dedup) — i.e. no band collided with an earlier doc.

State is bounded by the watermark (band-signature keys expire), so this
runs indefinitely at ingest scale; at 1000 executors the dedup state
shards across the state store by band-signature hash.
"""

from __future__ import annotations

import hashlib

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

N_HASHES = 16
N_BANDS = 4
_P = 2147483647
# same universal-hash params as operators/dedup.py
from kafka_stream_spark.operators.dedup import _MH_PARAMS  # noqa: E402


def _minhash_bands(text: str, shingle_n: int = 3) -> list[str]:
    toks = text.split(" ")
    shingles = {
        " ".join(toks[i : i + shingle_n]) for i in range(len(toks) - shingle_n + 1)
    } or {text}
    xs = [
        int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % _P for s in shingles
    ]
    sig = [min((a * x + b) % _P for x in xs) for a, b in _MH_PARAMS]
    rows_per_band = N_HASHES // N_BANDS
    return [
        f"{b}:" + ",".join(str(v) for v in sig[b * rows_per_band : (b + 1) * rows_per_band])
        for b in range(N_BANDS)
    ]


@pandas_udf(ArrayType(StringType()))
def minhash_band_signatures(texts: pd.Series) -> pd.Series:
    """Arrow-batched band-signature computation (the Python stage is the
    signature only — dedup state stays in the JVM state store)."""
    return texts.map(_minhash_bands)


def streaming_fuzzy_dedup(
    stream: DataFrame,
    text_col: str,
    id_col: str,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep only documents with NO band colliding with an earlier doc.

    Returns the surviving (id, ts) rows. Exact duplicates always collide
    (all bands equal); near-duplicates collide with the MinHash banding
    probability 1-(1-s^r)^b.
    """
    from kafka_stream_spark.streaming.ops import _watermarkable

    banded = (
        _watermarkable(stream, ts_col)
        .withColumn("__bands", minhash_band_signatures(F.col(text_col)))
        .select(id_col, ts_col, F.explode("__bands").alias("__band"))
    )
    survivors = (
        banded.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__band"])
    )
    # a doc passes iff every one of its bands survived the dedup
    return (
        survivors.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"), F.min(ts_col).alias(ts_col))
        .filter(F.col("__n") == N_BANDS)
        .drop("__n")
    )
