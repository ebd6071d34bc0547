"""Shared prelude for query builders.

Every query entry point receives an externally-owned SparkSession (the
driver's), so determinism knobs are (re)applied here per call:
UTC session timezone and the TIMESTAMP(NANOS)→long parquet escape hatch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.functions.time import enable_nanos_as_long, with_event_ts
from kafka_stream_spark.session import pin_utc


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load parquet tables with determinism confs applied.

    ``events`` gets its nanos-long ``ts`` replaced by a µs TIMESTAMP_NTZ.
    """
    pin_utc(spark)
    enable_nanos_as_long(spark)
    out = []
    for name in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            df = with_event_ts(df)
        out.append(df)
    return out
