"""Reference-dataset parity tests (FIXTURES.md §1-§6): the concrete
transforms the reference applies to its six datasets, rebuilt on Spark.
"""

import pyspark.sql.functions as F

from kafka_stream_spark import fixtures
from kafka_stream_spark.functions.time import with_event_ts, with_event_ts_ms


def test_ais_schema_and_ns_event_time(spark):
    ais = fixtures.generate_ais(spark, 500, vessels=20)
    assert [f.name for f in ais.schema] == [f.name for f in fixtures.AIS_VALUE]
    # ns → µs NTZ derivation (SURVEY.md known-hard #2), then tumbling window
    with_ts = with_event_ts(ais, "Timestamp", "event_ts")
    win = (
        with_ts.filter(F.col("Speed") > 0)
        .groupBy(F.window("event_ts", "10 minutes"), "MMSI")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("Speed").alias("avg_speed"))
    )
    assert win.count() > 0
    # ordering survives jitter: event_ts spans the expected range
    lo, hi = with_ts.agg(F.min("event_ts"), F.max("event_ts")).first()
    assert lo.year == 2017 and hi > lo


def test_ais_location_split_roundtrip(spark):
    # F4: "lat,lon" string → doubles (classAPositionReportSchema.json:42-46)
    ais = fixtures.generate_ais(spark, 100)
    parts = ais.select(
        "Latitude",
        "Longitude",
        F.split("location", ",").getItem(0).cast("double").alias("lat2"),
        F.split("location", ",").getItem(1).cast("double").alias("lon2"),
    )
    bad = parts.filter(
        (F.abs(F.col("lat2") - F.col("Latitude")) > 0.000001)
        | (F.abs(F.col("lon2") - F.col("Longitude")) > 0.000001)
    )
    assert bad.count() == 0


def test_smart_regex_key_extraction(spark):
    # P2: put.sh:47-55 — sed 's/\([A-Z0-9-]*\):/{"serial_number":"\1"}#/'
    lines = spark.createDataFrame(
        [("Z305B2QN:{\"date\":\"2017-01-01\"}",), ("PL1331LAG:{\"date\":\"2017-01-02\"}",)],
        ["line"],
    )
    keyed = lines.select(
        F.to_json(
            F.struct(
                F.regexp_extract("line", r"^([A-Z0-9-]+):", 1).alias("serial_number")
            )
        ).alias("key"),
        F.regexp_replace("line", r"^[A-Z0-9-]+:", "").alias("value"),
    )
    rows = {r.key: r.value for r in keyed.collect()}
    assert rows['{"serial_number":"Z305B2QN"}'] == '{"date":"2017-01-01"}'


def test_telecom_grid_stream_table_join(spark):
    # the canonical enrichment join (#5 ⋈ #6 on SquareId, FIXTURES.md §6)
    data = fixtures.generate_telecom(spark, 2000, squares=50)
    grid = fixtures.generate_grid(spark, squares=50)
    enriched = data.join(F.broadcast(grid), "SquareId")
    assert enriched.count() == 2000  # every square resolves
    # nested polygon access (F8): explode ring points, ring is closed
    ring = grid.select("SquareId", F.explode("Polygon").alias("p"))
    assert ring.count() == 50 * 5
    closed = grid.select(
        (F.element_at("Polygon", 1) == F.element_at("Polygon", 5)).alias("ok")
    )
    assert closed.filter(~F.col("ok")).count() == 0


def test_telecom_bucketed_event_time(spark):
    # TimeInterval ms buckets are natural tumbling-window keys (A2)
    data = fixtures.generate_telecom(spark, 1000, squares=10)
    ts = with_event_ts_ms(data, "TimeInterval", "event_ts")
    win = ts.groupBy(F.window("event_ts", "10 minutes")).count()
    # every 10-min bucket boundary aligns: window start == TimeInterval
    chk = ts.select(
        (F.unix_timestamp("event_ts") * 1000 == F.col("TimeInterval")).alias("aligned")
    )
    assert chk.filter(~F.col("aligned")).count() == 0
    assert win.count() == 100  # 1000 rows / 10 squares = 100 distinct buckets


def test_telecom_nullable_metrics_aggregate(spark):
    # nullable-union metrics: nulls must be skipped by aggregates, and
    # coalesce-style totals work (SURVEY.md §1.3 nullable unions)
    data = fixtures.generate_telecom(spark, 1000, squares=10)
    agg = data.groupBy("SquareId").agg(
        F.sum("SmsInActivity").alias("sms_in"),
        F.count("SmsInActivity").alias("n_nonnull"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    r = agg.agg(F.sum("n_nonnull"), F.sum("n_rows")).first()
    assert 0 < r[0] < r[1]  # sparse but present


def test_taxi_datetime_parse(spark):
    # F2: string datetimes "yyyy-MM-dd HH:mm:ss" → timestamp, dropoff >= pickup
    rows = [("2016-01-01 00:00:00", "2016-01-01 00:11:06"),
            ("2016-01-02 10:30:00", "2016-01-02 10:45:30")]
    df = spark.createDataFrame(rows, ["pickup", "dropoff"]).select(
        F.to_timestamp("pickup").alias("p"), F.to_timestamp("dropoff").alias("d")
    )
    assert df.filter(F.col("d") < F.col("p")).count() == 0
    mins = df.select(((F.unix_timestamp("d") - F.unix_timestamp("p")) / 60).alias("m")).collect()
    assert abs(mins[0].m - 11.1) < 0.01


def test_topic_configs_match_reference(spark):
    # variables.env:3-10 physical configuration is carried as metadata
    cfg = fixtures.TOPIC_CONFIGS
    assert cfg["telecom_italia_grid"]["cleanup"] == "compact"
    assert cfg["reddit_posts"]["partitions"] == 5
    assert sum(c["partitions"] for c in cfg.values()) == 16


def test_documents_token_cap_invariant():
    """Nine oracles tokenize positionally via generate_series(1, 200)
    (kwic/bigram-LM/substring-dedup/DSIR/repetition/...): DuckDB silently
    ignores tokens past position 200 while the Spark side is unbounded,
    so oracle parity REQUIRES every document to stay <= 200 tokens.
    Assert that testdata invariant per SF so a corpus change fails loudly
    instead of silently diverging the engines."""
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        mx = con.sql(
            "SELECT max(len(string_split(text, ' '))) FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet')"
        ).fetchone()[0]
        assert mx <= 200, f"{sf}: max tokens {mx} > 200 — oracles now diverge"
