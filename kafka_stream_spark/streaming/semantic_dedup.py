"""Streaming semantic deduplication — the online twin of
``operators/semdedup.py`` (batch SemDeDup) and the embedding analog of
``streaming/fuzzy_dedup.py``.

Online question: "have I already admitted an embedding semantically
close to this one?" — drop the newcomer if so. Same mechanics as the
MinHash streaming dedup: an Arrow-batched pandas UDF computes banded
hyperplane-LSH signatures (the SAME 24-plane/4-band md5-derived
hyperplanes as the batch ``embedding_lsh_banded`` query, so batch and
stream agree on what "close" means), the record explodes into one row
per band, and ``dropDuplicatesWithinWatermark`` keyed on (band,
signature) keeps only the first arrival per band bucket. A vector
survives only if ALL its bands are first arrivals — i.e. no band
collided with an earlier admitted vector (OR-of-bands collision = the
banding's near-dup criterion, collision probability (1-(1-p^r)^b with
p = 1 - theta/pi for angle theta).

State is bounded by the watermark (band-signature keys expire), so the
gate runs indefinitely at ingest scale; signatures shard across the
state store by (band, signature) hash — the same 1000-executor story as
the MinHash gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from kafka_stream_spark.operators.similarity import _b_signs

_PLANES = np.array(_b_signs(), dtype=np.float64)  # (24, 64), entries ±1
_N_BANDS = 4
_BITS = _PLANES.shape[0] // _N_BANDS


def _band_signatures(vecs: pd.Series) -> pd.Series:
    def sigs(vec) -> list[str]:
        x = np.asarray(vec, dtype=np.float64)
        # same sign rule as the batch query: round(dot, 9) > 0
        bits = (np.round(_PLANES @ x, 9) > 0).astype(np.int64)
        out = []
        for b in range(_N_BANDS):
            chunk = bits[b * _BITS : (b + 1) * _BITS]
            val = int((chunk << np.arange(_BITS)).sum())
            out.append(f"{b}:{val}")
        return out

    return vecs.map(sigs)


@pandas_udf(ArrayType(StringType()))
def lsh_band_signatures(vecs: pd.Series) -> pd.Series:
    """Arrow-batched banded-LSH signatures; the dedup state itself stays
    in the JVM state store."""
    return _band_signatures(vecs)


def streaming_semantic_dedup(
    stream: DataFrame,
    vec_col: str,
    id_col: str,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep only vectors with NO band colliding with an earlier vector.

    Returns the surviving (id, ts) rows — join back to the payload on
    the id downstream (the payload never enters dedup state)."""
    from kafka_stream_spark.streaming.ops import _watermarkable

    banded = (
        _watermarkable(stream, ts_col)
        .withColumn("__bands", lsh_band_signatures(F.col(vec_col)))
        .select(id_col, ts_col, F.explode("__bands").alias("__band"))
    )
    survivors = banded.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["__band"]
    )
    # a vector passes iff every one of its bands survived the dedup
    return (
        survivors.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"), F.min(ts_col).alias(ts_col))
        .filter(F.col("__n") == _N_BANDS)
        .drop("__n")
    )
