"""Generation-pointer state tables (streaming/state_table.py): the
crash-safe publish machinery shared by the CDC sink, latest-by-key
upsert, MERGE-bucket sink, and the HLL register maintainer."""

import os

import pytest

from kafka_stream_spark.streaming import state_table as st


def test_single_publish_swap_and_gc(spark, tmp_path):
    path = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a")], "id int, v string")
    gen1 = st.publish_single(df1, path, 0)
    assert st.read_state(spark, path).collect()[0].v == "a"

    df2 = spark.createDataFrame([(1, "b")], "id int, v string")
    gen2 = st.publish_single(df2, path, 1)
    assert st.read_state(spark, path).collect()[0].v == "b"
    # current + previous kept (in-flight readers); nothing older
    gens = sorted(e for e in os.listdir(path) if e.startswith("state-"))
    assert gens == sorted([gen1, gen2])
    st.publish_single(df1, path, 2)
    gens = sorted(e for e in os.listdir(path) if e.startswith("state-"))
    assert gen1 not in gens and len(gens) == 2


def test_single_replay_uses_alternate_slot(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    gen = st.publish_single(df, path, 5)
    # replaying batch 5 with the pointer already flipped must not
    # read+overwrite the same dir: it writes the 'b' slot
    gen_b = st.publish_single(df, path, 5)
    assert gen_b == gen + "b"
    assert st.read_state(spark, path).collect()[0].v == "a"


def test_partitioned_publish_flips_only_touched(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(0, "x"), (1, "y")], "p int, v string")
    gen0 = st.publish_partitions(df, path, 0, "p", [0, 1])
    # batch 1 touches only p=0
    df1 = spark.createDataFrame([(0, "x2")], "p int, v string")
    gen1 = st.publish_partitions(df1, path, 1, "p", [0])
    assert st.read_pointer(path, "_PTR-p=0") == gen1
    assert st.read_pointer(path, "_PTR-p=1") == gen0
    got = {
        os.path.basename(d) for d in st.committed_partition_dirs(path, "p")
    }
    assert got == {"p=0", "p=1"}
    rows = {r.v for r in st.read_state(spark, path, partition_col="p").collect()}
    assert rows == {"x2", "y"}
    # gen0 still referenced by p=1 → survives GC
    assert os.path.isdir(os.path.join(path, gen0))


def test_torn_partitioned_publish_is_invisible(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(0, "x")], "p int, v string")
    st.publish_partitions(df, path, 0, "p", [0])
    # a generation written WITHOUT a pointer flip (crash mid-publish)
    torn = os.path.join(path, "state-torn", "p=0")
    os.makedirs(torn)
    with open(os.path.join(torn, "junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    rows = {r.v for r in st.read_state(spark, path, partition_col="p").collect()}
    assert rows == {"x"}  # the torn generation is never read


def test_bucket_count_pin(tmp_path):
    path = str(tmp_path / "t")
    st.ensure_bucket_count(path, 8)
    st.ensure_bucket_count(path, 8)  # idempotent
    with pytest.raises(ValueError, match="n_buckets=8"):
        st.ensure_bucket_count(path, 16)


def test_partition_value_filename_guard(tmp_path):
    with pytest.raises(ValueError, match="filename-safe"):
        st.partition_dir(str(tmp_path), "p", "a/b")
    with pytest.raises(ValueError, match="filename-safe"):
        st.partition_dir(str(tmp_path), "p", "")
