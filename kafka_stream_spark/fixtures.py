"""Spark renditions of the six reference dataset schemas (SURVEY.md §1.3,
FIXTURES.md).

Each schema cites its source file in the reference repo. Key schemas are
separate StructTypes (keys are first-class and schema'd — ``put.sh:27-29``).
Nullable Avro unions (``["null","double"]``) become nullable Spark fields;
the Avro-JSON union encoding (``{"double": 0.001}``) is a wire concern that
never reaches the engine (FIXTURES.md generation note).

``generate_*`` builders produce deterministic synthetic rows shaped like the
shipped sample data, for round-trip and streaming tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# -- sea_vessel_position_reports (classAPositionReportSchema[Key].json) ------

AIS_KEY = StructType([StructField("MMSI", LongType(), False)])

# value schema: classAPositionReportSchema.json:1-91; Timestamp is
# NANOSECONDS since epoch (":87-91" — "May be used for ordering")
AIS_VALUE = StructType(
    [
        StructField("Type", IntegerType(), False),
        StructField("Repeat", IntegerType(), False),
        StructField("MMSI", LongType(), False),
        StructField("Speed", FloatType(), False),
        StructField("Accuracy", BooleanType(), False),
        StructField("Longitude", DoubleType(), False),
        StructField("Latitude", DoubleType(), False),
        StructField("location", StringType(), False),  # "lat,lon" for ES (:42-46)
        StructField("Course", FloatType(), False),
        StructField("Heading", IntegerType(), False),
        StructField("Second", IntegerType(), False),
        StructField("RAIM", BooleanType(), False),
        StructField("Radio", LongType(), False),
        StructField("Status", IntegerType(), False),
        StructField("Turn", FloatType(), False),
        StructField("Maneuver", IntegerType(), False),
        StructField("Timestamp", LongType(), False),  # ns since epoch
    ]
)

# -- reddit_posts (reddit.key.json / reddit.value.json) ----------------------

REDDIT_KEY = StructType([StructField("subreddit_id", StringType(), False)])

REDDIT_VALUE = StructType(
    [
        StructField("created_utc", IntegerType(), False),  # epoch seconds
        StructField("ups", IntegerType(), False),
        StructField("subreddit_id", StringType(), False),
        StructField("link_id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("score_hidden", IntegerType(), False),
        StructField("author_flair_css_class", StringType(), True),  # :31-38 nullable
        StructField("author_flair_text", StringType(), True),
        StructField("subreddit", StringType(), False),
        StructField("id", StringType(), False),
        StructField("removal_reason", StringType(), True),
        StructField("gilded", IntegerType(), False),
        StructField("downs", IntegerType(), False),
        StructField("archived", BooleanType(), False),
        StructField("author", StringType(), False),
        StructField("score", IntegerType(), False),
        StructField("retrieved_on", IntegerType(), False),
        StructField("body", StringType(), False),  # multilingual UTF-8 (:75-78)
        StructField("distinguished", StringType(), True),
        StructField("edited", IntegerType(), False),
        StructField("controversiality", BooleanType(), False),
        StructField("parent_id", StringType(), False),
    ]
)

# -- nyc_yellow_taxi_trip_data (nyc_trip_records_yellow.value.json) ----------
# 1 partition, null keys (FIXTURES.md §3)

TAXI_VALUE = StructType(
    [
        StructField("VendorID", IntegerType(), False),
        StructField("tpep_pickup_datetime", StringType(), False),  # "yyyy-MM-dd HH:mm:ss" (:12-21)
        StructField("tpep_dropoff_datetime", StringType(), False),
        StructField("passenger_count", IntegerType(), False),
        StructField("trip_distance", DoubleType(), False),
        StructField("pickup_longitude", DoubleType(), False),
        StructField("pickup_latitude", DoubleType(), False),
        StructField("RateCodeID", IntegerType(), False),
        StructField("store_and_fwd_flag", StringType(), False),
        StructField("dropoff_longitude", DoubleType(), False),
        StructField("dropoff_latitude", DoubleType(), False),
        StructField("payment_type", IntegerType(), False),
        StructField("fare_amount", DoubleType(), False),
        StructField("extra", DoubleType(), False),
        StructField("mta_tax", DoubleType(), False),
        StructField("improvement_surcharge", DoubleType(), False),
        StructField("tip_amount", DoubleType(), False),
        StructField("tolls_amount", DoubleType(), False),
        StructField("total_amount", DoubleType(), False),
    ]
)

# -- backblaze_smart: schemaless JSON + regex-synthesized key (put.sh:46-55) -

SMART_KEY = StructType([StructField("serial_number", StringType(), False)])

SMART_VALUE = StructType(
    [
        StructField("date", StringType(), False),
        StructField("serial_number", StringType(), False),
        StructField("model", StringType(), False),
        StructField("capacity_bytes", LongType(), False),
        StructField("failure", IntegerType(), False),
        StructField("smart_5_raw", LongType(), True),
        StructField("smart_9_raw", LongType(), True),
        StructField("smart_187_raw", LongType(), True),
        StructField("smart_194_raw", LongType(), True),
        StructField("smart_197_raw", LongType(), True),
    ]
)

# -- telecom_italia_data (TelecomItalia-Milano-SMS_Call_Internet.*.json) -----

TELECOM_KEY = StructType([StructField("SquareId", IntegerType(), False)])

TELECOM_VALUE = StructType(
    [
        StructField("SquareId", IntegerType(), False),
        StructField("TimeInterval", LongType(), False),  # epoch ms, 10-min buckets (:13-16)
        StructField("CountryCode", IntegerType(), False),
        StructField("SmsInActivity", DoubleType(), True),  # ["null","double"] (:23-46)
        StructField("SmsOutActivity", DoubleType(), True),
        StructField("CallInActivity", DoubleType(), True),
        StructField("CallOutActivity", DoubleType(), True),
        StructField("InternetTrafficActivity", DoubleType(), True),
    ]
)

# -- telecom_italia_grid (TelecomItalia-Milano-Grid.value.json) --------------
# compacted dimension table; nested polygon ring (:12-25)

GRID_VALUE = StructType(
    [
        StructField("SquareId", IntegerType(), False),
        StructField(
            "Polygon",
            ArrayType(
                StructType(
                    [
                        StructField("longitude", DoubleType(), False),
                        StructField("latitude", DoubleType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

TOPIC_CONFIGS = {
    # sample-data/variables.env:3-10
    "sea_vessel_position_reports": {"partitions": 3, "cleanup": "delete", "compression": "uncompressed"},
    "reddit_posts": {"partitions": 5, "cleanup": "delete", "compression": "lz4"},
    "nyc_yellow_taxi_trip_data": {"partitions": 1, "cleanup": "delete", "compression": "gzip"},
    "backblaze_smart": {"partitions": 2, "cleanup": "delete", "compression": "uncompressed"},
    "telecom_italia_data": {"partitions": 4, "cleanup": "delete", "compression": "lz4"},
    "telecom_italia_grid": {"partitions": 1, "cleanup": "compact", "compression": "uncompressed"},
}


# -- deterministic generators ------------------------------------------------


def generate_ais(spark: SparkSession, n: int = 1000, vessels: int = 50) -> DataFrame:
    """AIS-shaped rows: jittered near-monotonic ns timestamps, Baltic box."""
    base_ns = 1491318143_000_000_000
    return spark.range(n).select(
        F.lit(1).alias("Type"),
        F.lit(0).alias("Repeat"),
        (F.col("id") % vessels + 265500000).alias("MMSI"),
        (F.pmod(F.col("id") * 37, 300) / F.lit(10.0)).cast("float").alias("Speed"),
        (F.col("id") % 2 == 0).alias("Accuracy"),
        (11.0 + F.pmod(F.col("id") * 13, 700) / 100.0).alias("Longitude"),
        (56.0 + F.pmod(F.col("id") * 7, 200) / 100.0).alias("Latitude"),
        F.concat_ws(
            ",",
            F.format_number(56.0 + F.pmod(F.col("id") * 7, 200) / 100.0, 6),
            F.format_number(11.0 + F.pmod(F.col("id") * 13, 700) / 100.0, 6),
        ).alias("location"),
        (F.pmod(F.col("id") * 11, 3600) / F.lit(10.0)).cast("float").alias("Course"),
        F.when(F.col("id") % 10 == 0, 511).otherwise(F.pmod(F.col("id") * 3, 360)).cast("int").alias("Heading"),
        F.pmod(F.col("id"), 60).cast("int").alias("Second"),
        (F.col("id") % 7 == 0).alias("RAIM"),
        (F.col("id") * 991 % 250000).alias("Radio"),
        F.pmod(F.col("id"), 16).cast("int").alias("Status"),
        F.when(F.col("id") % 5 == 0, -128.0).otherwise(0.0).cast("float").alias("Turn"),
        F.pmod(F.col("id"), 3).cast("int").alias("Maneuver"),
        # jittered ordering (running-ais.sh:27 normcat -j): ±2s of monotonic
        (
            F.lit(base_ns)
            + F.col("id") * 100_000_000
            + F.pmod(F.col("id") * 7919, 4_000_000) * F.lit(1000)
            - F.lit(2_000_000_000)
        ).alias("Timestamp"),
    )


def generate_telecom(spark: SparkSession, n: int = 1000, squares: int = 100) -> DataFrame:
    """Telecom activity rows: 10-min TimeInterval buckets, sparse nullable metrics."""
    base_ms = 1383260400_000
    sq = F.pmod(F.col("id"), squares).cast("int") + 1
    metric = lambda k, m: F.when(
        F.pmod(F.col("id") + k, m) == 0, F.pmod(F.col("id") * 17 + k, 1000) / 1000.0
    ).otherwise(F.lit(None).cast("double"))
    return spark.range(n).select(
        sq.alias("SquareId"),
        (F.lit(base_ms) + (F.col("id") / squares).cast("long") * 600_000).alias("TimeInterval"),
        F.when(F.col("id") % 11 == 0, 39).otherwise(0).cast("int").alias("CountryCode"),
        metric(0, 3).alias("SmsInActivity"),
        metric(1, 3).alias("SmsOutActivity"),
        metric(2, 4).alias("CallInActivity"),
        metric(3, 4).alias("CallOutActivity"),
        metric(4, 2).alias("InternetTrafficActivity"),
    )


def generate_grid(spark: SparkSession, squares: int = 100) -> DataFrame:
    """Milano grid dimension: closed 5-point polygon ring per square."""
    lon0 = 9.0 + F.pmod(F.col("id"), 10) * 0.003
    lat0 = 45.35 + (F.col("id") / 10).cast("int") * 0.002
    pt = lambda lo, la: F.struct(lo.alias("longitude"), la.alias("latitude"))
    return spark.range(squares).select(
        (F.col("id") + 1).cast("int").alias("SquareId"),
        F.array(
            pt(lon0, lat0),
            pt(lon0 + 0.003, lat0),
            pt(lon0 + 0.003, lat0 + 0.002),
            pt(lon0, lat0 + 0.002),
            pt(lon0, lat0),  # ring closes (first = last)
        ).alias("Polygon"),
    )
