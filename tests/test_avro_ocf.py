"""Avro Object Container Files: header/meta/sync wire layout, null +
deflate codecs, multi-block files, and the Camus-true per-partition
topic export (S11)."""

import json
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_stream_spark.functions.avro_ocf import (
    MAGIC, TOPIC_EXPORT_SCHEMA, export_topic_ocf, read_ocf, write_ocf)

USER = {
    "type": "record", "name": "User",
    "fields": [{"name": "name", "type": "string"},
               {"name": "n", "type": "long"}],
}


def test_header_layout_known_bytes():
    blob = write_ocf([], USER, codec="null", sync=b"S" * 16)
    assert blob[:4] == MAGIC
    # metadata map: count 2 as zigzag varint = 0x04
    assert blob[4] == 0x04
    assert b"avro.schema" in blob and b"avro.codec" in blob
    assert blob.endswith(b"S" * 16)  # header sync, zero blocks


def test_roundtrip_null_and_deflate():
    recs = [{"name": f"u{i}", "n": i} for i in range(250)]
    for codec in ("null", "deflate"):
        blob = write_ocf(recs, USER, codec=codec, block_size=100)
        schema, got = read_ocf(blob)
        assert schema == USER
        assert got == recs
    # deflate genuinely compresses the repetitive payload
    assert len(write_ocf(recs, USER, codec="deflate")) < \
        len(write_ocf(recs, USER, codec="null"))


def test_corruption_detected():
    blob = bytearray(write_ocf([{"name": "x", "n": 1}], USER))
    blob[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(ValueError, match="sync"):
        read_ocf(bytes(blob))
    with pytest.raises(ValueError):
        read_ocf(b"PAR1not-avro")
    with pytest.raises(NotImplementedError):
        write_ocf([], USER, codec="brotli")  # not an Avro-spec codec


@given(st.lists(
    st.tuples(st.text(max_size=20), st.integers(-2**40, 2**40)),
    max_size=60))
@settings(max_examples=40, deadline=None)
def test_roundtrip_property(pairs):
    recs = [{"name": a, "n": b} for a, b in pairs]
    _, got = read_ocf(write_ocf(recs, USER, codec="deflate", block_size=7))
    assert got == recs


def test_export_topic_ocf_per_partition(spark, tmp_path):
    from kafka_stream_spark.sources.topics import FileTopic

    t = FileTopic(spark, str(tmp_path / "topics"), "exp", partitions=3)
    t.append(spark.createDataFrame(
        [(f"k{i}".encode(), f"v{i}".encode()) for i in range(12)],
        "key binary, value binary"))
    out = str(tmp_path / "camus")
    export_topic_ocf(t.read(), TOPIC_EXPORT_SCHEMA, out)

    import os
    files = sorted(os.listdir(out))
    assert files and all(f.startswith("partition-") and f.endswith(".avro")
                         for f in files)
    got = {}
    for f in files:
        p = int(f.split("-")[1].split(".")[0])
        schema, recs = read_ocf(open(os.path.join(out, f), "rb").read())
        assert schema == TOPIC_EXPORT_SCHEMA
        # records ordered by offset within the partition file
        assert [r["offset"] for r in recs] == sorted(r["offset"] for r in recs)
        for r in recs:
            got[bytes(r["value"])] = p
    assert set(got) == {f"v{i}".encode() for i in range(12)}
    # partition routing matches the topic's own layout
    want = {bytes(r.value): r.partition for r in t.read().collect()}
    assert got == want


def test_ocf_roundtrip_through_spark(spark, tmp_path):
    from kafka_stream_spark.functions.avro_ocf import ocf_to_df
    from kafka_stream_spark.sources.topics import FileTopic

    t = FileTopic(spark, str(tmp_path / "t2"), "exp2", partitions=2)
    t.append(spark.createDataFrame(
        [(f"k{i}".encode(), f"payload-{i}".encode()) for i in range(8)],
        "key binary, value binary"))
    out = str(tmp_path / "dump")
    export_topic_ocf(t.read(), TOPIC_EXPORT_SCHEMA, out)
    back = ocf_to_df(spark, out)
    rows = back.collect()
    assert len(rows) == 8
    assert sorted(bytes(r.value) for r in rows) == sorted(
        f"payload-{i}".encode() for i in range(8))
    # reader-schema RESOLUTION: a reader adding a defaulted field gets
    # the default; one adding an undefaulted required field errors
    evolved = {
        "type": "record", "name": "TopicRecord",
        "fields": TOPIC_EXPORT_SCHEMA["fields"]
        + [{"name": "source", "type": "string", "default": "camus"}],
    }
    got_e = ocf_to_df(spark, out, schema=evolved).collect()
    assert {r.source for r in got_e} == {"camus"} and len(got_e) == 8
    bad = {
        "type": "record", "name": "TopicRecord",
        "fields": TOPIC_EXPORT_SCHEMA["fields"]
        + [{"name": "must", "type": "string"}],
    }
    import pytest as _pytest
    with _pytest.raises(Exception, match="no default"):
        ocf_to_df(spark, out, schema=bad).collect()


def test_streaming_export_ocf(spark, tmp_path):
    from kafka_stream_spark.functions.avro_ocf import ocf_to_df
    from kafka_stream_spark.sources.replication import export_ocf
    from kafka_stream_spark.sources.topics import FileTopic

    t = FileTopic(spark, str(tmp_path / "t3"), "exp3", partitions=2)
    t.append(spark.createDataFrame(
        [(f"k{i}".encode(), f"s{i}".encode()) for i in range(6)],
        "key binary, value binary"))
    out, ck = str(tmp_path / "ocf_out"), str(tmp_path / "ocf_ck")
    q = export_ocf(t, out, ck)
    q.awaitTermination(120)
    got = ocf_to_df(spark, out + "/batch-*").collect()
    assert sorted(bytes(r.value) for r in got) == sorted(
        f"s{i}".encode() for i in range(6))
    # second drain with new data appends a new batch dir only
    t.append(spark.createDataFrame([(b"kz", b"s9")],
                                   "key binary, value binary"))
    q2 = export_ocf(t, out, ck)
    q2.awaitTermination(120)
    got2 = ocf_to_df(spark, out + "/batch-*").collect()
    assert len(got2) == 7


def test_snappy_codec_round_trip():
    from kafka_stream_spark.functions.avro_ocf import (
        TOPIC_EXPORT_SCHEMA, read_ocf, write_ocf)

    recs = [
        {"key": f"k{i}".encode(), "value": (b"v%d" % i) * 50, "offset": i}
        for i in range(500)
    ]
    blob = write_ocf(recs, TOPIC_EXPORT_SCHEMA, codec="snappy", block_size=128)
    schema, back = read_ocf(blob)
    assert back == recs
    assert len(blob) < sum(len(r["value"]) for r in recs)  # actually compressed


def test_snappy_crc_mismatch_detected():
    import pytest

    from kafka_stream_spark.functions.avro_ocf import (
        TOPIC_EXPORT_SCHEMA, read_ocf, write_ocf)

    recs = [{"key": b"k", "value": b"payload" * 30, "offset": 1}]
    blob = bytearray(write_ocf(recs, TOPIC_EXPORT_SCHEMA, codec="snappy"))
    # flip a bit in the stored CRC (last 4 bytes before the trailing sync)
    blob[-17] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch|snappy"):
        read_ocf(bytes(blob))


def test_snappy_crafted_giant_preamble_rejected():
    import pytest

    from kafka_stream_spark.functions.avro_ocf import _snappy_decompress

    # preamble claims ~2^35 uncompressed bytes in a 10-byte block
    evil = b"\xff\xff\xff\xff\x7f" + b"\x00" + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="implausible"):
        _snappy_decompress(evil)


def test_all_standard_codecs_round_trip():
    from kafka_stream_spark.functions.avro_ocf import (
        TOPIC_EXPORT_SCHEMA, read_ocf, write_ocf)

    recs = [
        {"key": f"k{i}".encode(), "value": (b"payload%d " % i) * 20, "offset": i}
        for i in range(200)
    ]
    raw_len = sum(len(r["value"]) for r in recs)
    for codec in ("null", "deflate", "snappy", "bzip2", "xz", "zstandard"):
        blob = write_ocf(recs, TOPIC_EXPORT_SCHEMA, codec=codec, block_size=64)
        schema, back = read_ocf(blob)
        assert back == recs, codec
        if codec != "null":
            assert len(blob) < raw_len, codec  # actually compressed
