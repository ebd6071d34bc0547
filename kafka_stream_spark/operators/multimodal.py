"""Multimodal column plumbing (north-star M6).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The decode step is STUBBED (no image/audio libs in this
container: ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``), but everything Spark-side is real and tested:

- the schema convention (``content BINARY, media STRUCT<kind, ...>``),
- Arrow-batched ``mapInPandas`` feature extraction (the shape a real
  decoder plugs into),
- partition-count preservation (no shuffle through the UDF).

For the oracle-checked query, binary payloads are synthesized
deterministically from ``documents.text`` (UTF-8 bytes) so DuckDB can
verify the byte-level features the Pandas stage emits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
    ]
)


def decode_image(content: bytes, fake: bool = False) -> dict:
    """Decode an image payload → {width, height}.

    STUB: real decoding needs an image library not present in this
    container. ``fake=True`` derives deterministic pseudo-dimensions from
    the byte length so the distributed plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library; install one and "
            "replace this stub (plumbing: extract_features/mapInPandas)"
        )
    n = len(content)
    return {"width": n % 640 + 1, "height": (n * 7) % 480 + 1}


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    ``mapInPandas`` keeps the input partitioning — no shuffle; a real
    decoder swaps into ``decode_image`` without touching the plan.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf["content"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "byte_len": lens,
                    "fake_width": lens % 640 + 1,
                    "fake_height": (lens * 7) % 480 + 1,
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Synthesize a binary media table from documents (UTF-8 payloads)."""
    return documents.select(
        "doc_id",
        F.lit("image/fake").alias("kind"),
        F.col("text").cast("binary").alias("content"),
    )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id, 'image/fake' AS kind,
           octet_length(encode(text)) AS byte_len,
           octet_length(encode(text)) % 640 + 1 AS fake_width,
           (octet_length(encode(text)) * 7) % 480 + 1 AS fake_height
    FROM documents
    ORDER BY doc_id
    """,
    description="Binary media column + mapInPandas feature extraction (stubbed decoder)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    media = documents_as_media(documents)
    return extract_features(media, fake_decode=True).orderBy("doc_id")
