import pytest

from kafka_stream_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Master follows SPARK_GRAFT_CPUS (local[32] on the full node) so the
    # state soaks measure the same topology bench.py and the reference's
    # full-node floors use; shuffle partitions stay at 4 as the suite
    # default — the many tiny streaming tests want few state partitions,
    # and the soaks raise it per-query via the soak_partitions fixture.
    s = get_spark("kafka-stream-spark-tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
