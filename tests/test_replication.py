"""Mirror (S10) and export (S11) behavioral tests."""

import pyspark.sql.functions as F

from kafka_stream_spark.sources.replication import export_parquet, mirror
from kafka_stream_spark.sources.topics import FileTopic


def test_mirror_replicates_topic(spark, tmp_path):
    src = FileTopic(spark, str(tmp_path), "src_topic", partitions=2)
    dst = FileTopic(spark, str(tmp_path), "dst_topic", partitions=2)
    src.append(spark.createDataFrame([(f"k{i}", f"v{i}") for i in range(8)], ["key", "value"]))
    q = mirror(src, dst, checkpoint=str(tmp_path / "ckpt_mirror"))
    q.awaitTermination(60)
    got = {
        bytes(r.key).decode(): bytes(r.value).decode() for r in dst.read().collect()
    }
    assert got == {f"k{i}": f"v{i}" for i in range(8)}
    # same-key records land on the same destination partition (keyed append)
    kp = dst.read().select(F.col("key").cast("string").alias("k"), "partition").distinct()
    assert kp.groupBy("k").count().filter("count > 1").count() == 0


def test_export_parquet_partitioned(spark, tmp_path):
    src = FileTopic(spark, str(tmp_path), "exp_topic", partitions=3)
    src.append(spark.createDataFrame([(f"k{i}", f"v{i}") for i in range(30)], ["key", "value"]))
    out = str(tmp_path / "export")
    q = export_parquet(src, out, checkpoint=str(tmp_path / "ckpt_exp"))
    q.awaitTermination(60)
    dumped = spark.read.parquet(out)
    assert dumped.count() == 30
    # partition column survives as the directory partitioning
    assert set(r.partition for r in dumped.select("partition").distinct().collect()) <= {0, 1, 2}
