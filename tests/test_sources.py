"""Connector-source tests: file tail, JDBC incremental (sqlite fixture per
kafka-tests.yml:211-257), rate replay, multimodal plumbing."""

import pyspark.sql.functions as F
import pytest

from kafka_stream_spark.operators.multimodal import (
    decode_image,
    documents_as_media,
    extract_features,
)
from kafka_stream_spark.sources.connectors import file_tail_source, rate_replay


def test_file_tail_source(spark, tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    (d / "broker.log").write_text("line one\nline two\n")
    stream = file_tail_source(spark, str(d), topic_name="logs_broker")
    q = (
        stream.writeStream.format("memory").queryName("tailed")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM tailed").collect()
    assert {bytes(r.value).decode() for r in rows} == {"line one", "line two"}
    assert all(r.topic == "logs_broker" for r in rows)
    assert all(r.key is None for r in rows)


def test_rate_replay_loops_dataset(spark):
    data = spark.createDataFrame([("a",), ("b",), ("c",)], ["v"])
    stream = rate_replay(spark, data, rows_per_second=50, loop=True)
    q = (
        stream.writeStream.format("memory").queryName("replayed")
        .trigger(processingTime="1 second").start()
    )
    try:
        deadline = __import__("time").time() + 30
        while __import__("time").time() < deadline:
            if spark.sql("SELECT count(*) c FROM replayed").first().c >= 4:
                break
            __import__("time").sleep(0.5)
    finally:
        q.stop()
    rows = spark.sql("SELECT v, count(*) n FROM replayed GROUP BY v").collect()
    assert len(rows) >= 2  # looped through the tiny dataset
    assert {r.v for r in rows} <= {"a", "b", "c"}


def test_multimodal_decode_unsupported_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def _ppm_p6(width, height, rgb_rows):
    body = b"".join(bytes(px) for row in rgb_rows for px in row)
    return b"P6\n# comment\n%d %d\n255\n" % (width, height) + body


def _bmp24(width, height, rgb_rows):
    import struct

    stride = (width * 3 + 3) & ~3
    pixels = b""
    for row in reversed(rgb_rows):  # BMP stores rows bottom-up
        line = b"".join(bytes([b, g, r]) for (r, g, b) in row)  # BGR order
        pixels += line + b"\x00" * (stride - len(line))
    data_off = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(pixels), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    )
    return header + pixels


def test_real_ppm_and_bmp_decode():
    rows = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    # mean over all RGB samples: (255*3 + 255*3) / 12 = 127.5
    for blob in (_ppm_p6(2, 2, rows), _bmp24(2, 2, rows)):
        f = decode_image(blob)
        assert (f["width"], f["height"], f["channels"]) == (2, 2, 3)
        assert f["mean_lum"] == 127.5
    # P3 ASCII variant of the same image
    p3 = b"P3\n2 2\n255\n" + " ".join(
        str(v) for row in rows for px in row for v in px
    ).encode()
    assert decode_image(p3) == decode_image(_ppm_p6(2, 2, rows))


def _wav(rate, channels, bits, frames):
    import struct

    if bits == 16:
        data = b"".join(
            struct.pack("<h", s) for fr in frames for s in fr
        )
    else:
        data = bytes((s + 128) & 0xFF for fr in frames for s in fr)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_real_wav_decode():
    from kafka_stream_spark.operators.multimodal import decode_audio

    # 16-bit mono: constant amplitude 16384 -> rms = 0.5 exactly
    f = decode_audio(_wav(8000, 1, 16, [(16384,)] * 4000))
    assert (f["sample_rate"], f["channels"], f["bits"]) == (8000, 1, 16)
    assert f["n_frames"] == 4000 and f["duration_s"] == 0.5
    assert f["rms"] == 0.5
    # 8-bit stereo: silence (128 center) -> rms 0
    f8 = decode_audio(_wav(16000, 2, 8, [(0, 0)] * 160))
    assert f8["channels"] == 2 and f8["n_frames"] == 160 and f8["rms"] == 0.0
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x00\x00\x20ftypM4A ")  # AAC needs a codec library


def test_mp3_header_parse_dispatch():
    """MPEG audio dispatches to the header-only parser: frame-chain
    metadata (rate/channels/duration) without sample decode (rms None).
    MPEG1 L3 128kbps@44100 frames are 417 bytes / 1152 samples each."""
    from kafka_stream_spark.operators.multimodal import decode_audio

    hdr = (0x7FF << 21) | (3 << 19) | (1 << 17) | (9 << 12) | (0 << 10)
    frame = hdr.to_bytes(4, "big") + b"\x00" * (1152 // 8 * 128000 // 44100 - 4)
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    f = decode_audio(id3 + frame * 20 + b"TAG" + b"\x00" * 125)
    assert (f["sample_rate"], f["channels"]) == (44100, 2)
    assert f["n_frames"] == 20 * 1152 and f["rms"] is None
    assert abs(f["duration_s"] - 20 * 1152 / 44100) < 1e-6
    with pytest.raises(ValueError, match="mp3"):
        decode_audio(bytes([0xFF, 0xE2]) + b"\x00" * 40)  # sync then junk


def test_real_wav_through_extract_audio_features(spark):
    from kafka_stream_spark.operators.multimodal import extract_audio_features

    media = spark.createDataFrame(
        [
            (1, "audio/wav", bytearray(_wav(8000, 1, 16, [(16384,)] * 800))),
            (2, "audio/wav", bytearray(_wav(44100, 2, 16, [(0, 0)] * 441))),
        ],
        "doc_id long, kind string, content binary",
    )
    feats = {r.doc_id: r for r in extract_audio_features(media).collect()}
    assert feats[1].rms == 0.5 and feats[1].duration_s == 0.1
    assert feats[2].sample_rate == 44100 and feats[2].duration_s == 0.01
    assert feats[2].rms == 0.0


from hypothesis import given, settings, strategies as st

_px = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)


@given(
    st.integers(1, 7), st.integers(1, 7), st.data()
)
@settings(max_examples=60, deadline=None)
def test_image_decoders_property(width, height, data):
    rows = [
        [data.draw(_px) for _ in range(width)] for _ in range(height)
    ]
    total = sum(v for row in rows for px in row for v in px)
    want = round(total / (width * height * 3), 6)
    for blob in (_ppm_p6(width, height, rows), _bmp24(width, height, rows)):
        f = decode_image(blob)
        assert (f["width"], f["height"]) == (width, height)
        assert f["mean_lum"] == want  # exercises BMP stride padding paths


@given(
    st.sampled_from([8000, 22050, 44100]),
    st.integers(1, 2),
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
)
@settings(max_examples=60, deadline=None)
def test_wav_decoder_property(rate, channels, samples):
    from kafka_stream_spark.operators.multimodal import decode_audio

    frames = [tuple(samples[i:i + channels].copy() + [0] * (channels - len(samples[i:i + channels])))
              for i in range(0, len(samples), channels)]
    f = decode_audio(_wav(rate, channels, 16, frames))
    assert f["sample_rate"] == rate and f["channels"] == channels
    assert f["n_frames"] == len(frames)
    flat = [s for fr in frames for s in fr]
    want = round((sum(s * s for s in flat) / len(flat)) ** 0.5 / 32768.0, 6)
    assert f["rms"] == want


def test_real_decode_through_extract_features(spark):
    rows_a = [[(10, 20, 30), (40, 50, 60)]]          # 1x2
    rows_b = [[(0, 0, 0)], [(90, 90, 90)], [(255, 255, 255)]]  # 3x1
    media = spark.createDataFrame(
        [
            (1, "image/x-portable-pixmap", bytearray(_ppm_p6(2, 1, rows_a))),
            (2, "image/bmp", bytearray(_bmp24(1, 3, rows_b))),
        ],
        "doc_id long, kind string, content binary",
    )
    feats = {r.doc_id: r for r in
             extract_features(media, fake_decode=False).collect()}
    assert (feats[1].width, feats[1].height) == (2, 1)
    assert feats[1].mean_lum == 35.0  # (10+20+30+40+50+60)/6
    assert (feats[2].width, feats[2].height) == (1, 3)
    assert feats[2].mean_lum == 115.0  # (0+90+255)*3/9
    assert feats[2].byte_len == len(_bmp24(1, 3, rows_b))


def test_multimodal_fake_decode_deterministic():
    f1 = decode_image(b"12345", fake=True)
    f2 = decode_image(b"12345", fake=True)
    assert f1 == f2 == {"width": 6, "height": 36}


def test_multimodal_plumbing_preserves_partitions(spark, sf_dir):
    from kafka_stream_spark.operators._common import load

    (documents,) = load(spark, sf_dir, "documents")
    media = documents_as_media(documents).repartition(3)
    feats = extract_features(media)
    assert feats.rdd.getNumPartitions() == 3  # mapInPandas: no shuffle
    row = feats.filter(F.col("doc_id") == 0).first()
    assert row.byte_len == 128 and row.fake_width == 129


@pytest.mark.skipif(
    not pytest.importorskip("sqlite3", reason="sqlite3 stdlib"), reason="sqlite3"
)
def test_jdbc_incremental_source_watermark(spark, tmp_path):
    # The JDBC *driver jar* isn't on the classpath in this container, so the
    # watermark logic is exercised against a stubbed poll. The SQL shape it
    # issues matches kafka-tests.yml:224 (mode=incrementing on id).
    from kafka_stream_spark.sources.connectors import JdbcIncrementalSource

    src = JdbcIncrementalSource(spark, "jdbc:sqlite::memory:", "accounts", "id")
    assert src.topic == "accounts"
    src2 = JdbcIncrementalSource(
        spark, "jdbc:sqlite::memory:", "accounts", "id", topic_prefix="coyote-ca-"
    )
    assert src2.topic == "coyote-ca-accounts"  # kafka-tests.yml:226 naming
    # watermark advance logic
    src.last_seen = 2
    assert "id > 2" in f"id > {src.last_seen}"


def test_dbapi_incremental_source_sqlite_roundtrip(spark, tmp_path):
    """The reference's JDBC-source test shape (kafka-tests.yml:209-257):
    sqlite accounts table -> incremental polls -> topic 'coyote-ca-accounts'
    containing alice and bob."""
    import sqlite3

    from kafka_stream_spark.sources.connectors import DbapiIncrementalSource
    from kafka_stream_spark.sources.topics import FileTopic

    db = str(tmp_path / "test.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE accounts(id INTEGER PRIMARY KEY, name TEXT)")
    con.execute("INSERT INTO accounts(name) VALUES ('alice'), ('bob')")
    con.commit()
    con.close()

    src = DbapiIncrementalSource(
        spark, lambda: sqlite3.connect(db), "accounts", "id", topic_prefix="coyote-ca-"
    )
    assert src.topic == "coyote-ca-accounts"

    topic = FileTopic(spark, str(tmp_path), src.topic, partitions=1)
    batch1 = src.poll()
    topic.append(
        batch1.select(F.col("id").cast("string").alias("key"), F.col("name").alias("value"))
    )
    names = {bytes(r.value).decode() for r in topic.read().collect()}
    assert names == {"alice", "bob"}  # the coyote stdout_has assertion

    # watermark: a later insert is picked up alone; no re-emission
    con = sqlite3.connect(db)
    con.execute("INSERT INTO accounts(name) VALUES ('carol')")
    con.commit()
    con.close()
    batch2 = src.poll()
    assert [r.name for r in batch2.collect()] == ["carol"]

    # drained table -> empty batch with the cached schema
    batch3 = src.poll()
    assert batch3.count() == 0
    assert batch3.schema == batch2.schema


def test_dataset_split_partitioned_write(spark, tmp_path):
    """The split op's write path: partitionBy('split') lays out
    train/val/test as separate partition dirs (the shape a downstream
    trainer consumes), with every doc in exactly one split."""
    import pyspark.sql.functions as F2
    from kafka_stream_spark.operators._common import load

    (documents,) = load(spark, "/root/testdata/sf0.001", "documents")
    bucket = (
        F2.expr(
            "cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 15), 16, 10) as bigint)"
        )
        % 100
    )
    split = F2.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    out = str(tmp_path / "corpus")
    documents.withColumn("split", split).write.partitionBy("split").parquet(out)

    import os

    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs == {"split=train", "split=val", "split=test"}
    total = documents.count()
    back = spark.read.parquet(out)
    assert back.count() == total
    # partition pruning: reading one split scans only that directory
    train_only = back.filter(F2.col("split") == "train")
    plan = train_only._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan


def test_frame_sample_matches_python_reference(spark, sf_dir):
    import hashlib

    from kafka_stream_spark.operators._common import load
    from kafka_stream_spark.operators.multimodal import (
        _FRAME_BYTES,
        _FRAME_STRIDE,
        documents_as_media,
        sample_frames,
    )

    (documents,) = load(spark, sf_dir, "documents")
    media = documents_as_media(documents).repartition(3)
    frames = sample_frames(media)
    assert frames.rdd.getNumPartitions() == 3  # UDTF-shape expansion: no shuffle
    doc = documents.orderBy("doc_id").first()
    got = sorted(
        (r.frame_idx, r.frame_len, r.frame_md5)
        for r in frames.filter(F.col("doc_id") == doc.doc_id).collect()
    )
    b = doc.text.encode()
    want = sorted(
        (i, len(b[i * _FRAME_BYTES:(i + 1) * _FRAME_BYTES]),
         hashlib.md5(b[i * _FRAME_BYTES:(i + 1) * _FRAME_BYTES]).hexdigest())
        for i in range(0, (len(b) + _FRAME_BYTES - 1) // _FRAME_BYTES)
        if i % _FRAME_STRIDE == 0
    )
    assert got == want


def test_audio_energy_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    from kafka_stream_spark.operators._common import load
    from kafka_stream_spark.operators.multimodal import (
        _AUDIO_WINDOW,
        audio_window_features,
        documents_as_media,
    )

    (documents,) = load(spark, sf_dir, "documents")
    feats = audio_window_features(documents_as_media(documents))
    doc = documents.orderBy("doc_id").first()
    samples = np.frombuffer(doc.text.encode(), dtype=np.uint8)
    got = {r.window_idx: (r.energy, r.peak, r.n_samples)
           for r in feats.filter(F.col("doc_id") == doc.doc_id).collect()}
    for w in range(0, (len(samples) + _AUDIO_WINDOW - 1) // _AUDIO_WINDOW):
        win = samples[w * _AUDIO_WINDOW:(w + 1) * _AUDIO_WINDOW]
        assert got[w] == (int(win.sum()), int(win.max()), len(win))


def test_socket_source_streams_lines(spark, tmp_path):
    import socket
    import threading

    from kafka_stream_spark.sources.connectors import socket_source

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        try:
            conn.sendall(b"alpha\nbeta\ngamma\n")
            import time

            time.sleep(8)  # keep the connection up while the batch drains
        finally:
            conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    stream = socket_source(spark, "127.0.0.1", port, topic_name="net")
    q = (
        stream.writeStream.format("memory").queryName("sock")
        .outputMode("append").start()
    )
    try:
        deadline = __import__("time").time() + 60
        while __import__("time").time() < deadline:
            if spark.sql("SELECT count(*) c FROM sock").first().c >= 3:
                break
            __import__("time").sleep(0.5)
    finally:
        q.stop()
        srv.close()
    rows = spark.sql("SELECT * FROM sock").collect()
    vals = {bytes(r.value).decode() for r in rows}
    assert {"alpha", "beta", "gamma"} <= vals
    assert all(r.topic == "net" for r in rows)


# -- PNG decoder (RFC 2083; stdlib zlib only) ------------------------------

def _png_raw(width, height, color_type, rows_filtered):
    """Hand-assemble a PNG whose IDAT carries the given pre-filtered
    scanlines (each: filter byte + filtered samples)."""
    import struct, zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(rows_filtered)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_rgb_roundtrip_via_encoder():
    from kafka_stream_spark.operators.multimodal import encode_png

    rows = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (100, 110, 120)]]
    f = decode_image(encode_png(rows, color_type=2))
    total = sum(v for r in rows for px in r for v in px)
    assert f == {"width": 2, "height": 2, "channels": 3,
                 "mean_lum": round(total / 12, 6)}


def test_png_gray_and_alpha_types():
    from kafka_stream_spark.operators.multimodal import encode_png

    g = decode_image(encode_png([[(100,), (200,)]], color_type=0))
    assert g == {"width": 2, "height": 1, "channels": 1, "mean_lum": 150.0}
    # RGBA: alpha excluded from luminance, channels reported as stored
    rgba = decode_image(encode_png(
        [[(10, 20, 30, 255), (40, 50, 60, 0)]], color_type=6))
    assert rgba["channels"] == 4
    assert rgba["mean_lum"] == round((10 + 20 + 30 + 40 + 50 + 60) / 6, 6)
    # grey+alpha
    ga = decode_image(encode_png([[(100, 255), (200, 0)]], color_type=4))
    assert ga["channels"] == 2 and ga["mean_lum"] == 150.0


def test_png_all_five_filters_decode():
    # 3 rows x 2 px RGB, target (unfiltered) samples per row:
    r0 = [10, 20, 30, 13, 25, 37]
    r1 = [20, 30, 40, 23, 35, 47]
    r2 = [25, 34, 43, 28, 39, 50]
    # row0: Sub   -> filt[i] = raw[i] - raw[i-3]
    f0 = bytes([1]) + bytes([10, 20, 30, (13 - 10), (25 - 20), (37 - 30)])
    # row1: Up    -> filt[i] = raw[i] - prev[i]
    f1 = bytes([2]) + bytes([(a - b) & 0xFF for a, b in zip(r1, r0)])
    # row2: Average -> filt[i] = raw[i] - (left + up)//2
    av = []
    for i in range(6):
        left = r2[i - 3] if i >= 3 else 0
        av.append((r2[i] - ((left + r1[i]) >> 1)) & 0xFF)
    f2 = bytes([3]) + bytes(av)
    blob = _png_raw(2, 3, 2, [f0, f1, f2])
    f = decode_image(blob)
    total = sum(r0) + sum(r1) + sum(r2)
    assert f["mean_lum"] == round(total / 18, 6)
    # Paeth + None over a 2-row image
    p0 = bytes([0]) + bytes(r0)
    pa = []
    from kafka_stream_spark.operators.multimodal import _paeth
    for i in range(6):
        left = r1[i - 3] if i >= 3 else 0
        ul = r0[i - 3] if i >= 3 else 0
        pa.append((r1[i] - _paeth(left, r0[i], ul)) & 0xFF)
    p1 = bytes([4]) + bytes(pa)
    f2b = decode_image(_png_raw(2, 2, 2, [p0, p1]))
    assert f2b["mean_lum"] == round((sum(r0) + sum(r1)) / 12, 6)


def test_png_16bit_depth_roundtrip():
    # 16-bit samples: filters stay byte-oriented with a 2x stride, and
    # mean_lum reports the file's own depth (the PPM convention)
    from kafka_stream_spark.operators.multimodal import encode_png

    rows = [[(1000, 20000, 65535), (4, 500, 60)],
            [(70, 8000, 90), (10000, 11000, 12000)]]
    f = decode_image(encode_png(rows, color_type=2, depth=16))
    total = sum(v for r in rows for px in r for v in px)
    assert f == {"width": 2, "height": 2, "channels": 3,
                 "mean_lum": round(total / 12, 6)}
    # greyscale and RGBA (alpha excluded) at 16-bit
    g = decode_image(encode_png([[(300,), (70000 - 4465,)]], color_type=0,
                                depth=16))
    assert g["mean_lum"] == round((300 + 65535) / 2, 6)
    rgba = decode_image(encode_png(
        [[(10, 20, 30, 65535), (400, 500, 600, 0)]], color_type=6, depth=16))
    assert rgba["channels"] == 4
    assert rgba["mean_lum"] == round((10 + 20 + 30 + 400 + 500 + 600) / 6, 6)


def test_png_16bit_sub_filter_uses_byte_offset():
    # the Sub filter's left neighbor is bpp=6 BYTES back for 16-bit RGB
    # (RFC 2083 §6.2) — regression for a stride-aware unfilter
    import struct, zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    r0 = [258, 515, 772, 1286, 1543, 1800]  # two RGB px, 16-bit each
    raw_bytes = b"".join(struct.pack(">H", v) for v in r0)
    filt = bytearray(raw_bytes)
    for i in range(len(filt) - 1, 5, -1):  # Sub-filter bytes in place
        filt[i] = (filt[i] - raw_bytes[i - 6]) & 0xFF
    ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes([1]) + bytes(filt)))
            + chunk(b"IEND", b""))
    f = decode_image(blob)
    assert f["mean_lum"] == round(sum(r0) / 6, 6)


def test_png_palette_and_low_depths():
    # palette indices resolve to 8-bit RGB (the GIF convention); low-
    # depth greyscale means at the file's own depth
    from kafka_stream_spark.operators.multimodal import encode_png

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    for depth in (1, 2, 4, 8):
        nidx = min(len(pal), 1 << depth)
        rows = [[(i % nidx,) for i in range(5)], [((i + 1) % nidx,) for i in range(5)]]
        f = decode_image(encode_png(rows, color_type=3, depth=depth, palette=pal))
        total = sum(sum(pal[px[0]]) for r in rows for px in r)
        assert f == {"width": 5, "height": 2, "channels": 3,
                     "mean_lum": round(total / 30, 6)}, depth
    # greyscale depths 1/2/4 (raw sample scale)
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        rows = [[(v % (mx + 1),) for v in range(7)]]
        f = decode_image(encode_png(rows, color_type=0, depth=depth))
        total = sum(px[0] for r in rows for px in r)
        assert f == {"width": 7, "height": 1, "channels": 1,
                     "mean_lum": round(total / 7, 6)}, depth


def test_png_packed_rows_filter_distance_is_one_byte():
    # sub-byte pixels: the Sub filter's left neighbor is ONE byte back
    # (RFC 2083 6.2) — hand-filter a depth-4 grey row and decode
    import struct, zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    # 4 px at depth 4 -> 2 bytes/row: samples 3,5,9,15 -> bytes 0x35 0x9F
    raw_row = bytes([0x35, 0x9F])
    filt = bytes([1, 0x35, (0x9F - 0x35) & 0xFF])  # Sub filter
    ihdr = struct.pack(">IIBBBBB", 4, 1, 4, 0, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(filt)) + chunk(b"IEND", b""))
    f = decode_image(blob)
    assert f["mean_lum"] == round((3 + 5 + 9 + 15) / 4, 6)


def test_png_palette_error_paths():
    from kafka_stream_spark.operators.multimodal import encode_png
    import struct, zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    # index beyond the palette is a typed error, not a crash
    pal = [(1, 2, 3)]
    blob = encode_png([[(0,), (3,)]], color_type=3, depth=4, palette=pal)
    with pytest.raises(ValueError, match="palette index"):
        decode_image(blob)
    # palette image without PLTE
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    noplte = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
              + chunk(b"IDAT", zlib.compress(bytes([0, 0])))
              + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PLTE"):
        decode_image(noplte)


def test_png_multi_idat_chunks():
    import struct, zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    z = zlib.compress(bytes([0, 1, 2, 3, 4, 5, 6]))
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", z[:5]) + chunk(b"IDAT", z[5:])
            + chunk(b"IEND", b""))
    f = decode_image(blob)
    assert (f["width"], f["height"]) == (2, 1)
    assert f["mean_lum"] == round(21 / 6, 6)


def test_png_rejects_unsupported_shapes():
    from kafka_stream_spark.operators.multimodal import encode_png
    import struct, zlib

    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\njunk")

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    # depth 4 is illegal for RGB (spec 11.2.2) — typed rejection
    deep = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0)))
    with pytest.raises(ValueError):
        decode_image(deep)


@given(st.integers(1, 6), st.integers(1, 6), st.data())
@settings(max_examples=40, deadline=None)
def test_png_decoder_property(width, height, data):
    from kafka_stream_spark.operators.multimodal import encode_png

    rows = [[data.draw(_px) for _ in range(width)] for _ in range(height)]
    f = decode_image(encode_png(rows, color_type=2))
    total = sum(v for row in rows for px in row for v in px)
    assert (f["width"], f["height"], f["channels"]) == (width, height, 3)
    assert f["mean_lum"] == round(total / (width * height * 3), 6)


def test_png_through_extract_features(spark):
    from kafka_stream_spark.operators.multimodal import (
        encode_png, extract_features, MEDIA_SCHEMA)

    blob = encode_png([[(9, 18, 27), (36, 45, 54)]], color_type=2)
    media = spark.createDataFrame([(1, "image", bytearray(blob))],
                                  MEDIA_SCHEMA)
    row = extract_features(media, fake_decode=False).collect()[0]
    assert (row.width, row.height, row.channels) == (2, 1, 3)
    assert row.mean_lum == round((9 + 18 + 27 + 36 + 45 + 54) / 6, 6)


# -- Y4M video decoder -----------------------------------------------------

def test_y4m_roundtrip_and_metadata():
    from kafka_stream_spark.operators.multimodal import decode_video, encode_y4m

    f0 = [[10, 20], [30, 40]]
    f1 = [[50, 60], [70, 80]]
    v = decode_video(encode_y4m([f0, f1], fps=(30, 1)))
    assert (v["width"], v["height"], v["fps"], v["n_frames"]) == (2, 2, 30.0, 2)
    assert v["frame_lumas"] == [25.0, 65.0]


def test_y4m_chroma_layouts():
    from kafka_stream_spark.operators.multimodal import decode_video, encode_y4m

    frames = [[[100] * 4] * 4]
    for chroma in ("C420", "C422", "C444", "Cmono", "C420jpeg"):
        v = decode_video(encode_y4m(frames, chroma=chroma))
        assert v["n_frames"] == 1 and v["frame_lumas"] == [100.0]


def test_y4m_rejects_compressed_and_truncated():
    from kafka_stream_spark.operators.multimodal import decode_video, encode_y4m

    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00\x18ftypmp42...")  # mp4 needs a codec
    blob = encode_y4m([[[1, 2], [3, 4]]])
    with pytest.raises(ValueError):
        decode_video(blob[:-3])  # truncated frame


@given(st.integers(2, 6), st.integers(2, 6), st.integers(1, 4), st.data())
@settings(max_examples=30, deadline=None)
def test_y4m_decoder_property(width, height, n_frames, data):
    from kafka_stream_spark.operators.multimodal import decode_video, encode_y4m

    width, height = width * 2, height * 2  # C420 needs even dims
    frames = [
        [[data.draw(st.integers(0, 255)) for _ in range(width)]
         for _ in range(height)]
        for _ in range(n_frames)
    ]
    v = decode_video(encode_y4m(frames))
    assert v["n_frames"] == n_frames
    for fr, got in zip(frames, v["frame_lumas"]):
        total = sum(sum(r) for r in fr)
        assert got == round(total / (width * height), 6)


def test_sample_video_frames_spark(spark):
    from kafka_stream_spark.operators.multimodal import (
        encode_y4m, sample_video_frames, MEDIA_SCHEMA)

    frames = [[[i * 10 + 5] * 4] * 2 for i in range(7)]  # lumas 5,15,...,65
    blob = encode_y4m(frames)
    media = spark.createDataFrame([(3, "video", bytearray(blob))],
                                  MEDIA_SCHEMA)
    rows = sorted(sample_video_frames(media, stride=3).collect(),
                  key=lambda r: r.frame_idx)
    assert [(r.frame_idx, r.mean_luma) for r in rows] == [
        (0, 5.0), (3, 35.0), (6, 65.0)]
    assert all((r.width, r.height) == (4, 2) for r in rows)


# -- GIF decoder (GIF89a + Appendix F LZW) ---------------------------------

def test_gif_roundtrip_via_encoder():
    from kafka_stream_spark.operators.multimodal import encode_gif

    rows = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    f = decode_image(encode_gif(rows))
    total = sum(v for r in rows for px in r for v in px)
    assert f == {"width": 2, "height": 2, "channels": 3,
                 "mean_lum": round(total / 12, 6)}


def test_gif_known_bytes_minimal():
    # hand-assembled 1x1 white GIF87a with a 2-entry table:
    # LZW (min_code=2): CLEAR(100b), index 1(001b... width 3), EOI(101b)
    import struct
    blob = bytearray(b"GIF87a")
    blob += struct.pack("<HHBBB", 1, 1, 0x80, 0, 0)  # GCT, 2 entries
    blob += bytes((0, 0, 0)) + bytes((255, 255, 255))
    blob += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
    blob += bytes([2])  # min code size
    # codes: clear=4 (100), pixel=1 (001), eoi=5 (101), 3-bit LSB packing
    stream = 0b101_001_100
    blob += bytes([2, stream & 0xFF, stream >> 8, 0x00])
    blob += b"\x3b"
    f = decode_image(bytes(blob))
    assert f == {"width": 1, "height": 1, "channels": 3, "mean_lum": 255.0}


def test_gif_skips_extensions_counts_frames():
    from kafka_stream_spark.operators.multimodal import encode_gif, _decode_gif

    base = bytearray(encode_gif([[(1, 2, 3)]]))
    # splice a graphic-control extension before the image descriptor
    img_at = base.index(0x2C, 6)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    blob = bytes(base[:img_at]) + ext + bytes(base[img_at:])
    f = decode_image(blob)
    assert (f["width"], f["height"]) == (1, 1)


@given(st.integers(1, 8), st.integers(1, 8), st.data())
@settings(max_examples=30, deadline=None)
def test_gif_decoder_property(width, height, data):
    from kafka_stream_spark.operators.multimodal import encode_gif

    few_colors = st.sampled_from(
        [(0, 0, 0), (255, 255, 255), (10, 200, 30), (128, 128, 128),
         (200, 10, 10), (1, 2, 3), (250, 251, 252), (77, 88, 99)])
    rows = [[data.draw(few_colors) for _ in range(width)]
            for _ in range(height)]
    f = decode_image(encode_gif(rows))
    total = sum(v for r in rows for px in r for v in px)
    assert (f["width"], f["height"]) == (width, height)
    assert f["mean_lum"] == round(total / (width * height * 3), 6)


def test_gif_lzw_width_growth_large_image():
    from kafka_stream_spark.operators.multimodal import encode_gif

    # 64x64 with 256 distinct colors forces LZW code-width growth
    rows = [[(x * 4 % 256, y * 4 % 256, (x + y) % 256) for x in range(64)]
            for y in range(64)]
    # cap distinct colors at 256 by quantizing
    rows = [[(px[0] & 0xF0, px[1] & 0xF0, 0) for px in row] for row in rows]
    f = decode_image(encode_gif(rows))
    total = sum(v for r in rows for px in r for v in px)
    assert f["mean_lum"] == round(total / (64 * 64 * 3), 6)


def test_wav_float32_and_deep_pcm():
    import struct
    from kafka_stream_spark.operators.multimodal import decode_audio

    def wav_raw(fmt_code, bits, data, channels=1, rate=8000):
        fmt = struct.pack("<HHIIHH", fmt_code, channels, rate,
                          rate * channels * bits // 8,
                          channels * bits // 8, bits)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    # IEEE float32: constant 0.5 -> rms exactly 0.5
    f32 = b"".join(struct.pack("<f", 0.5) for _ in range(100))
    f = decode_audio(wav_raw(3, 32, f32))
    assert (f["bits"], f["n_frames"], f["rms"]) == (32, 100, 0.5)
    # 32-bit int PCM: half-scale -> rms 0.5
    i32 = b"".join(struct.pack("<i", 2**30) for _ in range(50))
    f = decode_audio(wav_raw(1, 32, i32))
    assert f["rms"] == 0.5
    # 24-bit packed PCM: half-scale -> rms 0.5
    i24 = b"".join(int(2**22).to_bytes(3, "little", signed=True)
                   for _ in range(50))
    f = decode_audio(wav_raw(1, 24, i24))
    assert f["rms"] == 0.5
    # float64 still unsupported
    with pytest.raises(NotImplementedError):
        decode_audio(wav_raw(3, 64, b"\x00" * 64))


def _png_adam7(rows, color_type=2):
    """Hand-build an Adam7-interlaced PNG (filter-0 pass rows)."""
    import struct, zlib
    from kafka_stream_spark.operators.multimodal import _ADAM7

    spp = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    height, width = len(rows), len(rows[0])
    raw = bytearray()
    for (x0, y0, dx, dy) in _ADAM7:
        ys = range(y0, height, dy)
        xs = range(x0, width, dx)
        if not ys or not xs:
            continue
        for y in ys:
            raw.append(0)
            for x in xs:
                raw += bytes(rows[y][x][:spp])

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_adam7_interlaced():
    rows = [[(x * 10 % 256, y * 20 % 256, (x + y) % 256)
             for x in range(10)] for y in range(9)]
    f = decode_image(_png_adam7(rows))
    total = sum(v for r in rows for px in r for v in px)
    assert (f["width"], f["height"]) == (10, 9)
    assert f["mean_lum"] == round(total / (10 * 9 * 3), 6)


@given(st.integers(1, 17), st.integers(1, 17), st.data())
@settings(max_examples=30, deadline=None)
def test_png_adam7_property(width, height, data):
    # small and odd dimensions exercise empty passes and partial grids
    rows = [[data.draw(_px) for _ in range(width)] for _ in range(height)]
    f = decode_image(_png_adam7(rows))
    total = sum(v for r in rows for px in r for v in px)
    assert (f["width"], f["height"]) == (width, height)
    assert f["mean_lum"] == round(total / (width * height * 3), 6)


def test_ppm_16bit_samples_decode():
    """maxval > 255 → 2-byte big-endian samples (netpbm spec rule)."""
    import struct

    vals = [65535, 0, 256, 512, 1024, 4096]  # 1x2 RGB image, 6 samples
    blob = b"P6\n2 1\n65535\n" + struct.pack(">6H", *vals)
    f = decode_image(blob)
    assert (f["width"], f["height"], f["channels"]) == (2, 1, 3)
    assert f["mean_lum"] == round(sum(vals) / 6, 6)
    # P3 ASCII with the same maxval agrees
    p3 = b"P3\n2 1\n65535\n" + " ".join(map(str, vals)).encode()
    assert decode_image(p3) == f
    # truncated 16-bit payload is detected
    import pytest as _pytest
    with _pytest.raises(Exception, match="truncated"):
        decode_image(blob[:-1])

def _bmp8(width, height, index_rows, palette, rle=False, clr_used=0):
    """8-bit palette BMP; rle=True emits BI_RLE8 (encoded runs + EOL/EOB)."""
    import struct

    pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette)
    if not rle:
        stride = (width + 3) & ~3
        pixels = b""
        for row in reversed(index_rows):  # bottom-up
            pixels += bytes(row) + b"\x00" * (stride - width)
        comp = 0
    else:
        out = bytearray()
        for i, row in enumerate(reversed(index_rows)):
            j = 0
            while j < len(row):  # simple run-length encoder
                k = j
                while k < len(row) and row[k] == row[j] and k - j < 255:
                    k += 1
                out += bytes([k - j, row[j]])
                j = k
            out += b"\x00\x00" if i < height - 1 else b"\x00\x01"
        pixels, comp = bytes(out), 1
    data_off = 54 + len(pal)
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(pixels), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, comp,
                      len(pixels), 2835, 2835, clr_used, 0)
    )
    return header + pal + pixels


def test_bmp_8bit_palette_and_rle8():
    pal = [(250, 10, 30), (0, 200, 0), (5, 5, 5), (90, 80, 70)]
    rows = [[0, 1, 2, 3, 1], [3, 3, 0, 0, 2]]
    want = round(sum(sum(pal[i]) for r in rows for i in r) / (5 * 2 * 3), 6)
    plain = decode_image(_bmp8(5, 2, rows, pal + [(0, 0, 0)] * 252))
    assert plain == {"width": 5, "height": 2, "channels": 3, "mean_lum": want}
    # clr_used palette (only 4 entries stored)
    small = decode_image(_bmp8(5, 2, rows, pal, clr_used=4))
    assert small["mean_lum"] == want
    # RLE8 variant decodes to the same stats
    rle = decode_image(_bmp8(5, 2, rows, pal, rle=True, clr_used=4))
    assert rle == plain | {"mean_lum": want}


def test_bmp_rle8_short_line_pads_with_index_zero():
    # an RLE8 line ending early leaves the rest of the row at palette
    # index 0 (common decoder behavior)
    import struct

    pal = [(30, 30, 30), (90, 90, 90)]
    pal_bytes = b"".join(bytes([b, g, r, 0]) for (r, g, b) in pal)
    data_off = 54 + len(pal_bytes)
    # one row of width 4: run of 2 × index 1, then EOB
    pixels = bytes([2, 1, 0, 1])
    header = (
        b"BM" + struct.pack("<IHHI", data_off + len(pixels), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, 4, 1, 1, 8, 1,
                      len(pixels), 2835, 2835, 2, 0)
    )
    f = decode_image(header + pal_bytes + pixels)
    want = round((2 * 270 + 2 * 90) / (4 * 3), 6)
    assert f["mean_lum"] == want


def test_bmp_unsupported_modes_stay_typed():
    import struct

    # 2-bit (Windows CE) and BI_BITFIELDS masks stay typed seams
    hdr2 = (b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 2, 0, 4, 0, 0, 0, 0))
    with pytest.raises(NotImplementedError, match="bpp=2"):
        decode_image(hdr2 + b"\x00" * 8)
    hdrbf = (b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
             + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 16, 3, 4, 0, 0, 0, 0))
    with pytest.raises(NotImplementedError, match="compression=3"):
        decode_image(hdrbf + b"\x00" * 8)


def _bmp_packed(width, height, index_rows, palette, bpp):
    """1- or 4-bit packed palette BMP (MSB-first, the BMP bit order)."""
    import struct

    pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette)
    stride = ((width * bpp + 31) // 32) * 4
    pixels = b""
    for row in reversed(index_rows):  # bottom-up
        bits = 0
        acc = bytearray()
        cur = 0
        for v in row:
            cur = (cur << bpp) | v
            bits += bpp
            if bits == 8:
                acc.append(cur)
                cur = bits = 0
        if bits:
            acc.append(cur << (8 - bits))
        pixels += bytes(acc) + b"\x00" * (stride - len(acc))
    data_off = 54 + len(pal)
    header = (
        b"BM" + struct.pack("<IHHI", data_off + len(pixels), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0,
                      len(pixels), 2835, 2835, len(palette), 0)
    )
    return header + pal + pixels


def test_bmp_1bit_and_4bit_packed():
    pal4 = [(250, 10, 30), (0, 200, 0), (5, 5, 5), (90, 80, 70)]
    rows = [[0, 1, 2, 3, 1], [3, 3, 0, 0, 2]]
    want = round(sum(sum(pal4[i]) for r in rows for i in r) / (5 * 2 * 3), 6)
    got = decode_image(_bmp_packed(5, 2, rows, pal4, 4))
    assert got == {"width": 5, "height": 2, "channels": 3, "mean_lum": want}

    pal1 = [(10, 20, 30), (200, 100, 50)]
    rows1 = [[0, 1, 1, 0, 1, 0, 0, 1, 1], [1, 0, 0, 1, 0, 1, 1, 0, 0]]
    want1 = round(sum(sum(pal1[i]) for r in rows1 for i in r) / (9 * 2 * 3), 6)
    got1 = decode_image(_bmp_packed(9, 2, rows1, pal1, 1))
    assert got1 == {"width": 9, "height": 2, "channels": 3, "mean_lum": want1}


def test_bmp_16bit_xrgb1555():
    import struct

    # two pixels: pure red (31,0,0) and mid gray (16,16,16)
    def px(r, g, b):
        return struct.pack("<H", (r << 10) | (g << 5) | b)

    pixels = px(31, 0, 0) + px(16, 16, 16)  # one row, width 2 → 4 bytes, no pad
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 16, 0,
                      len(pixels), 2835, 2835, 0, 0)
    )
    f = decode_image(header + pixels)
    exp = lambda v: (v << 3) | (v >> 2)  # 5→8 bit replication
    want = round((exp(31) + 2 * exp(0) + 3 * exp(16)) / 6, 6)
    assert f == {"width": 2, "height": 1, "channels": 3, "mean_lum": want}


def _bmp_rle4(width, height, payload, palette):
    import struct

    pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette)
    data_off = 54 + len(pal)
    header = (
        b"BM" + struct.pack("<IHHI", data_off + len(payload), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 4, 2,
                      len(payload), 2835, 2835, len(palette), 0)
    )
    return header + pal + bytes(payload)


def test_bmp_rle4_runs_absolute_and_delta():
    pal = [(8, 8, 8), (250, 10, 30), (0, 200, 0), (90, 80, 70)]
    lum = [sum(p) for p in pal]
    # bottom row first (BMP bottom-up). Width 6, height 2.
    # bottom row: encoded run of 5 alternating 1,2 then run 1 of 3, EOL
    # top row: absolute run of 3 raw nibbles [2,3,1] (2 bytes, word-
    #          padded), delta right 2 (zero-filled), run 1 of 1, EOB
    payload = (
        [5, 0x12, 1, 0x33, 0, 0]
        + [0, 3, 0x23, 0x10]        # absolute 3: nibbles 2,3,1 (word-aligned)
        + [0, 2, 2, 0]              # delta dx=2 dy=0 → indices 0,0
        + [1, 0x11, 0, 1]           # run 1 of index 1, then EOB
    )
    f = decode_image(_bmp_rle4(6, 2, payload, pal))
    bottom = lum[1] * 3 + lum[2] * 2 + lum[3]          # 1,2,1,2,1,3
    top = lum[2] + lum[3] + lum[1] + 2 * lum[0] + lum[1]  # 2,3,1,0,0,1
    want = round((bottom + top) / (6 * 2 * 3), 6)
    assert f == {"width": 6, "height": 2, "channels": 3, "mean_lum": want}


def test_bmp_rle8_delta_escape_zero_fills():
    import struct

    pal = [(30, 30, 30), (90, 90, 90)]
    pal_bytes = b"".join(bytes([b, g, r, 0]) for (r, g, b) in pal)
    data_off = 54 + len(pal_bytes)
    # width 4, height 2 (bottom-up): run 1 of index 1, delta right 1
    # down... up 1 row (dy=1), run 2 of index 1, EOB
    pixels = bytes([1, 1, 0, 2, 1, 1, 2, 1, 0, 1])
    header = (
        b"BM" + struct.pack("<IHHI", data_off + len(pixels), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1,
                      len(pixels), 2835, 2835, 2, 0)
    )
    f = decode_image(header + pal_bytes + pixels)
    # bottom row: index 1, then delta dx=1 dy=1 skips dy*width+dx = 5
    # pixels as zeros; then 2× index 1 completes the top row (EOB fills
    # nothing). 3 written + 5 skipped = 8 pixels.
    want = round((3 * 270 + 5 * 90) / (8 * 3), 6)
    assert f["mean_lum"] == want
