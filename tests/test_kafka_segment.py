"""Kafka RecordBatch v2 / log-segment codec: spec-pinned layout
(magic 2, CRC-32C, zigzag varints), none+gzip codecs, corruption
detection, and the distributed export→ingest round trip."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_stream_spark.sources.kafka_segment import (
    MAGIC,
    SegmentError,
    crc32c,
    decode_record_batch,
    decode_segment,
    encode_record_batch,
    encode_segment,
    export_topic_segments,
    segment_filename,
    segments_to_df,
)


def test_crc32c_known_vectors():
    # canonical Castagnoli check value + RFC 3720 B.4 all-zeros vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_batch_layout_is_spec_pinned():
    blob = encode_record_batch(
        [{"key": None, "value": b"", "timestamp_ms": 7}], base_offset=42
    )
    base_offset, batch_length = struct.unpack_from(">qi", blob, 0)
    assert base_offset == 42
    assert len(blob) == 12 + batch_length  # batchLength covers the rest
    assert blob[16] == MAGIC  # magic byte at fixed position 16
    # attributes..recordCount block starts at 21; recordCount at 57
    assert struct.unpack_from(">i", blob, 57)[0] == 1
    # minimum v2 batch: 61-byte header + 7-byte record
    assert len(blob) == 68


def test_roundtrip_nulls_headers_codecs():
    recs = [
        {"key": b"k1", "value": b"v1", "timestamp_ms": 1000,
         "headers": [("trace", b"abc"), ("null-h", None)]},
        {"key": None, "value": b"v2", "timestamp_ms": 999},
        {"key": b"k3", "value": None, "timestamp_ms": 2000},
    ]
    for comp in ("none", "gzip"):
        batch, end = decode_record_batch(encode_record_batch(recs, 100, comp))
        assert batch["compression"] == comp
        assert batch["base_offset"] == 100 and batch["last_offset"] == 102
        out = batch["records"]
        assert [r["offset"] for r in out] == [100, 101, 102]
        assert [r["timestamp_ms"] for r in out] == [1000, 999, 2000]
        assert out[0]["headers"] == [("trace", b"abc"), ("null-h", None)]
        assert out[1]["key"] is None and out[2]["value"] is None


def test_segment_multi_batch():
    recs = [
        {"key": f"k{i}".encode(), "value": bytes([i % 251]), "timestamp_ms": i}
        for i in range(1000)
    ]
    seg = encode_segment(recs, base_offset=5, batch_size=256)
    got = decode_segment(seg)
    assert [r["offset"] for r in got] == list(range(5, 1005))
    assert got[700]["value"] == bytes([700 % 251])
    assert segment_filename(5) == "00000000000000000005.log"


def test_gzip_compresses_repetitive_payload():
    recs = [{"key": None, "value": b"A" * 100, "timestamp_ms": 0}] * 200
    assert len(encode_record_batch(recs, 0, "gzip")) < len(
        encode_record_batch(recs, 0, "none")
    )


def test_corruption_detected():
    recs = [{"key": b"a", "value": b"b", "timestamp_ms": 1}]
    good = encode_record_batch(recs, 0)
    flipped = bytearray(good)
    flipped[40] ^= 0xFF
    with pytest.raises(SegmentError, match="crc"):
        decode_record_batch(bytes(flipped))
    wrong_magic = bytearray(good)
    wrong_magic[16] = 1
    with pytest.raises(SegmentError, match="magic"):
        decode_record_batch(bytes(wrong_magic))
    with pytest.raises(SegmentError):
        decode_record_batch(good[: len(good) - 3])
    with pytest.raises(SegmentError):
        encode_record_batch(recs, 0, compression="lzo")


def test_all_codecs_round_trip_with_wire_true_framing():
    # the full attribute-bits codec matrix, each in the Java client's
    # actual container: gzip stream, xerial-framed snappy, LZ4 frame,
    # zstd frame — magics asserted so the payloads are the real formats
    import struct as _struct

    recs = [
        {"key": f"k{i}".encode(), "value": (f"v{i}" * 40).encode(),
         "timestamp_ms": 1_700_000_000_000 + i}
        for i in range(50)
    ]
    for codec, magic_check in [
        ("gzip", lambda p: p[:2] == b"\x1f\x8b"),
        ("snappy", lambda p: p[:8] == b"\x82SNAPPY\x00"),
        ("lz4", lambda p: p[:4] == bytes.fromhex("04224d18")),
        ("zstd", lambda p: p[:4] == bytes.fromhex("28b52ffd")),
    ]:
        blob = encode_record_batch(recs, 100, compression=codec)
        batch, end = decode_record_batch(blob)
        assert end == len(blob)
        assert batch["compression"] == codec
        assert [r["value"] for r in batch["records"]] == [r["value"] for r in recs]
        assert [r["offset"] for r in batch["records"]] == list(range(100, 150))
        # attributes bits carry the codec id; payload starts at 61
        attributes = _struct.unpack_from(">h", blob, 21)[0]
        assert attributes & 0x07 == {"gzip": 1, "snappy": 2, "lz4": 3, "zstd": 4}[codec]
        assert magic_check(blob[61:]), codec


def test_snappy_xerial_multiblock_and_bare_block():
    # >32 KiB forces multiple xerial blocks; a bare raw-snappy payload
    # (non-xerial producers) must also decode
    import pyarrow as pa

    from kafka_stream_spark.sources.kafka_segment import _compress, _decompress

    payload = bytes(range(256)) * 400  # ~100 KiB -> 4 xerial blocks
    framed = _compress(payload, "snappy")
    assert framed[:8] == b"\x82SNAPPY\x00"
    assert _decompress(framed, "snappy") == payload
    bare = bytes(pa.Codec("snappy").compress(payload))
    assert _decompress(bare, "snappy") == payload


def test_corrupt_compressed_payloads_raise_typed():
    recs = [{"key": b"k", "value": b"v", "timestamp_ms": 1}]
    for codec in ("lz4", "zstd"):
        blob = bytearray(encode_record_batch(recs, 0, compression=codec))
        blob[61] ^= 0xFF  # corrupt the frame magic
        # re-seal the CRC so we hit the codec error, not the crc check
        from kafka_stream_spark.sources.kafka_segment import crc32c
        import struct as _struct

        crc = crc32c(bytes(blob[21:]))
        _struct.pack_into(">I", blob, 17, crc)
        with pytest.raises(SegmentError):
            decode_record_batch(bytes(blob))


@given(st.binary(max_size=200))
@settings(max_examples=150, deadline=None)
def test_fuzz_hostile_bytes_raise_typed_errors(blob):
    """Arbitrary bytes must terminate with SegmentError, never crash or
    hang (same contract as the repo-wide codec fuzz suite)."""
    try:
        decode_segment(blob)
    except SegmentError:
        pass


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.binary(max_size=30)),
            st.one_of(st.none(), st.binary(max_size=60)),
            st.integers(0, 2**41),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(tuples):
    recs = [
        {"key": k, "value": v, "timestamp_ms": t} for k, v, t in tuples
    ]
    got = decode_segment(encode_segment(recs, 17, batch_size=7))
    assert [(r["key"], r["value"], r["timestamp_ms"]) for r in got] == [
        (k, v, t) for k, v, t in tuples
    ]
    assert [r["offset"] for r in got] == list(range(17, 17 + len(recs)))


@given(
    st.sampled_from(["gzip", "snappy", "lz4", "zstd"]),
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.binary(max_size=30)),
            st.one_of(st.none(), st.binary(max_size=200)),
            st.integers(0, 2**41),
        ),
        min_size=1,
        max_size=40,
    ),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_property_all_codecs(codec, tuples):
    recs = [
        {"key": k, "value": v, "timestamp_ms": t} for k, v, t in tuples
    ]
    got = decode_segment(encode_segment(recs, 3, batch_size=9, compression=codec))
    assert [(r["key"], r["value"], r["timestamp_ms"]) for r in got] == [
        (k, v, t) for k, v, t in tuples
    ]
    assert [r["offset"] for r in got] == list(range(3, 3 + len(recs)))


@pytest.mark.parametrize("codec", ["gzip", "zstd"])
def test_export_ingest_roundtrip_through_spark(spark, tmp_path, codec):
    # executor-side encode + distributed ingest through the full codec
    # stack (zstd exercises the pyarrow-backed frame path end-to-end)
    from kafka_stream_spark.sources.topics import FileTopic

    t = FileTopic(spark, str(tmp_path / "topics"), "seg", partitions=3)
    t.append(
        spark.createDataFrame(
            [(f"k{i}".encode(), f"payload-{i}".encode()) for i in range(24)],
            "key binary, value binary",
        )
    )
    out = str(tmp_path / "segments")
    files = export_topic_segments(t.read(), out, compression=codec)
    assert files and all(f.endswith(".log") for f in files)
    # the broker data-dir layout: partition dirs, offset-named segments
    assert any("partition=" in f for f in files)

    back = segments_to_df(spark, out).collect()
    want = {
        (bytes(r.value), r.partition, r.offset) for r in t.read().collect()
    }
    got = {(bytes(r.value), r.partition, r.offset) for r in back}
    assert got == want
    # timestamps survive at ms precision
    ts = {(r.partition, r.offset): r.timestamp for r in back}
    assert len(ts) == 24 and all(v is not None for v in ts.values())


def test_streaming_segment_drain(spark, tmp_path):
    """availableNow drain → batch-keyed segment dirs; records match and
    the per-partition files are broker-layout."""
    from kafka_stream_spark.sources.replication import export_segments
    from kafka_stream_spark.sources.topics import FileTopic

    t = FileTopic(spark, str(tmp_path / "topics"), "sdrain", partitions=2)
    t.append(
        spark.createDataFrame(
            [(f"k{i}".encode(), f"sv-{i}".encode()) for i in range(10)],
            "key binary, value binary",
        )
    )
    out = str(tmp_path / "segdump")
    q = export_segments(t, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    import os

    batch_dirs = [d for d in os.listdir(out) if d.startswith("batch-")]
    assert batch_dirs
    got = set()
    for d in batch_dirs:
        for r in segments_to_df(spark, os.path.join(out, d)).collect():
            got.add(bytes(r.value))
    assert got == {f"sv-{i}".encode() for i in range(10)}


def test_segment_codec_throughput_floor():
    """The reference's ingest smoke implies >=5.6 MB/s (500k x 1KB in
    90s, kafka-tests.yml:14-18). The segment codec must clear it
    single-core in both directions (best-of-3: the suite runs fully
    parallel, one window can be squeezed — NOTES.md sharp edge)."""
    import time

    from kafka_stream_spark.sources.kafka_segment import (
        decode_segment,
        encode_segment,
    )

    recs = [
        {
            "key": str(i % 997).encode(),
            "value": (b"x" * 900) + str(i).encode(),
            "timestamp_ms": i,
        }
        for i in range(3000)
    ]
    enc_best = dec_best = 0.0
    for _ in range(3):
        t0 = time.time()
        seg = encode_segment(recs, 0, batch_size=512)
        enc_best = max(enc_best, len(seg) / 1e6 / (time.time() - t0))
        t0 = time.time()
        out = decode_segment(seg)
        dec_best = max(dec_best, len(seg) / 1e6 / (time.time() - t0))
    assert len(out) == len(recs)
    assert enc_best >= 5.6, f"encode {enc_best:.1f} MB/s below floor"
    assert dec_best >= 5.6, f"decode {dec_best:.1f} MB/s below floor"


def test_offset_and_time_indexes():
    from kafka_stream_spark.sources.kafka_segment import (
        build_offset_index,
        build_time_index,
        lookup_offset,
    )

    recs = [
        {"key": None, "value": bytes([i % 251]) * 40, "timestamp_ms": i * 10}
        for i in range(2000)
    ]
    base = 1000
    seg = encode_segment(recs, base, batch_size=64)
    idx = build_offset_index(seg, base, interval_bytes=2048)
    assert len(idx) % 8 == 0 and len(idx) > 0
    # entries strictly increasing in both fields
    entries = [struct.unpack_from(">ii", idx, i) for i in range(0, len(idx), 8)]
    assert entries == sorted(entries)
    # indexed lookup == full scan filter, for targets on and off batch
    # boundaries, before the first index entry and past the last
    for target in (base, base + 1, base + 63, base + 64, base + 777,
                   base + 1999):
        got = lookup_offset(seg, idx, base, target)
        want = [r for r in decode_segment(seg) if r["offset"] >= target]
        assert [r["offset"] for r in got] == [r["offset"] for r in want], target
    assert lookup_offset(seg, idx, base, base + 2000) == []

    tidx = build_time_index(seg, base)
    t_entries = [
        struct.unpack_from(">qi", tidx, i) for i in range(0, len(tidx), 12)
    ]
    assert len(tidx) % 12 == 0 and t_entries == sorted(t_entries)
    # each entry maps a batch max-timestamp to its last relative offset
    ts, rel = t_entries[0]
    assert ts == 63 * 10 and rel == 63
