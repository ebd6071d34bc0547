"""Connect SMT chain tests (SURVEY.md P6)."""

import pyspark.sql.functions as F

from kafka_stream_spark.plans import smt


def test_smt_chain(spark):
    df = spark.createDataFrame(
        [("u1", "alice@example.com", "2024-03-05 10:00:00", 12.5)],
        ["user", "email", "ts_s", "amount"],
    ).select("user", "email", F.to_timestamp("ts_s").alias("ts"), "amount",
             F.lit("payments").alias("topic"))
    out = smt.apply_chain(
        df,
        [
            smt.mask_field("email"),                       # PII redaction
            smt.insert_field("source", "gateway-7"),
            smt.replace_field(renames={"user": "user_id"}),
            smt.cast_field("amount", "decimal(10,2)"),
            smt.timestamp_router("ts", "yyyyMMdd"),
            smt.filter_predicate("amount > 10"),
        ],
    )
    r = out.first()
    assert r.email == "****"
    assert r.source == "gateway-7"
    assert r.user_id == "u1"
    assert str(r.amount) == "12.50"
    assert r.topic == "payments-20240305"


def test_smt_regex_router(spark):
    df = spark.createDataFrame([("logs_broker", 1)], ["topic", "v"])
    out = smt.apply_chain(df, [smt.regex_router("topic", r"^logs_", "archive.")])
    assert out.first().topic == "archive.broker"


def test_smt_mask_non_string(spark):
    df = spark.createDataFrame([(5, "x")], ["n", "s"])
    out = smt.apply_chain(df, [smt.mask_field("n")])
    assert out.first().n is None


def test_smt_filter_keeps_pushdown(spark, sf_dir):
    # a chain over a parquet scan must still push the filter to the scan
    from kafka_stream_spark.operators._common import load

    (orders,) = load(spark, sf_dir, "orders")
    out = smt.apply_chain(orders, [smt.filter_predicate("o_custkey = 7")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)]" in plan


def test_timestamp_router_is_tz_invariant(spark):
    """The route must name the UTC day of the instant, whatever the
    session timezone (the $date bug class applied to routing)."""
    from kafka_stream_spark.plans import smt

    df = spark.createDataFrame(
        [("t", "2024-03-01 23:30:00")], "topic string, s string"
    ).selectExpr("topic", "to_timestamp(s) AS ts")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc_route = smt.timestamp_router("ts", "yyyyMMdd")(df).collect()[0].topic
        # the stored instant is fixed; re-render under a session far west
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny_route = smt.timestamp_router("ts", "yyyyMMdd")(df).collect()[0].topic
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc_route == ny_route
