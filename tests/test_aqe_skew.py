"""AQE skew-join evidence (SCALING.md: 'skewed keys → salting or AQE
skew-join'). Builds a pathologically skewed join (90% of rows on one key)
with AQE skew thresholds tuned down so local-mode data trips them, and
asserts the executed plan actually split the skewed partition."""

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # left: 200k rows, 90% on key 0, padded so the hot partition is fat
        left = spark.range(200_000).select(
            F.when(F.rand(7) < 0.9, F.lit(0)).otherwise((F.rand(11) * 1000).cast("long")).alias("k"),
            F.rpad(F.lit("x"), 64, "x").alias("pad"),
        )
        right = spark.range(1000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
        joined = left.join(right, "k").select("k")
        # execute THIS DataFrame's plan (count() would plan a separate
        # aggregate query and leave joined's own AQE plan unfinalized)
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE did not split the skewed side:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
