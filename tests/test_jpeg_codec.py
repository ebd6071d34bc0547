"""Baseline JPEG codec: T.81 marker layout, Huffman/DCT round trips at
bounded error, 4:4:4 / 4:2:0 / grayscale / restart intervals, typed
errors on corruption and unsupported modes, and the extract_features
real-decode integration."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_stream_spark.operators.jpeg_codec import (
    JpegError,
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg,
)


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 4 % 256, yy * 5 % 256, (xx + yy) * 3 % 256], axis=-1
    ).astype(float)


def test_marker_layout():
    blob = encode_jpeg(_grad(16, 16))
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    # SOF0 present with our dims, 3 components, 8-bit precision
    i = blob.index(b"\xff\xc0")
    prec, h, w, nc = struct.unpack_from(">BHHB", blob, i + 4)
    assert (prec, h, w, nc) == (8, 16, 16, 3)
    # DQT, DHT, SOS all present
    for m in (b"\xff\xdb", b"\xff\xc4", b"\xff\xda"):
        assert m in blob


def test_flat_color_is_dc_exact():
    flat = np.full((16, 24, 3), [120, 64, 200], dtype=float)
    w, h, px = decode_jpeg_pixels(encode_jpeg(flat))
    assert (w, h) == (24, 16)
    assert np.abs(px.astype(float) - flat).max() <= 2  # DC quantization only


@pytest.mark.parametrize("sub", ["444", "420"])
def test_gradient_roundtrip_bounded_error(sub):
    img = _grad(40, 56)
    w, h, px = decode_jpeg_pixels(encode_jpeg(img, subsampling=sub))
    assert (w, h) == (56, 40) and px.shape == (40, 56, 3)
    mae = np.abs(px.astype(float) - img).mean()
    assert mae < 4.0, mae  # uniform Q=12 quantization error envelope


@pytest.mark.parametrize("sub", ["444", "420"])
def test_odd_dimensions_pad_and_crop(sub):
    img = _grad(33, 41)
    w, h, px = decode_jpeg_pixels(encode_jpeg(img, subsampling=sub))
    assert (w, h) == (41, 33) and px.shape == (33, 41, 3)


def test_grayscale():
    g = (np.mgrid[0:24, 0:32][0] * 6 % 256).astype(float)
    d = decode_jpeg(encode_jpeg(g, grayscale=True))
    assert (d["width"], d["height"], d["channels"]) == (32, 24, 1)
    assert abs(d["mean_lum"] - g.mean()) < 4


def test_restart_intervals():
    img = _grad(40, 56)
    blob = encode_jpeg(img, restart_interval=3)
    assert b"\xff\xdd" in blob  # DRI emitted
    assert b"\xff\xd0" in blob  # at least one RST0
    w, h, px = decode_jpeg_pixels(blob)
    assert np.abs(px.astype(float) - img).mean() < 4.0


def test_420_smaller_than_444():
    img = _grad(48, 48)
    assert len(encode_jpeg(img, subsampling="420")) < len(
        encode_jpeg(img, subsampling="444")
    )


def test_unsupported_and_corrupt():
    img = _grad(16, 16)
    good = encode_jpeg(img)
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"notajpeg")
    # extended sequential SOF1 refused by name
    ext = good.replace(b"\xff\xc0", b"\xff\xc1", 1)
    with pytest.raises(JpegError, match="SOF0"):
        decode_jpeg(ext)
    # a baseline stream RELABELED as SOF2 is malformed progressive
    # (its sequential SOS header claims a DC scan with Se=63)
    mislabeled = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(JpegError):
        decode_jpeg(mislabeled)
    with pytest.raises(JpegError):
        decode_jpeg(good[:40])  # truncated
    # corrupt a Huffman-coded byte region: typed error or wrong-but-
    # decoded pixels, never a crash
    broken = bytearray(good)
    broken[-20] ^= 0x55
    try:
        decode_jpeg(bytes(broken))
    except JpegError:
        pass


@given(st.binary(min_size=0, max_size=120))
@settings(max_examples=120, deadline=None)
def test_fuzz_hostile_bytes(blob):
    try:
        decode_jpeg(b"\xff\xd8" + blob)
    except JpegError:
        pass
    except (IndexError, struct.error):
        pytest.fail("untyped decoder crash")


def test_dispatch_and_extract_features(spark):
    """decode_image routes FFD8 payloads to the JPEG decoder, and the
    Spark real-decode path extracts true dimensions."""
    from kafka_stream_spark.operators.multimodal import (
        decode_image,
        extract_features,
    )

    img = _grad(24, 40)
    blob = encode_jpeg(img)
    d = decode_image(blob)
    assert (d["width"], d["height"], d["channels"]) == (40, 24, 3)

    media = spark.createDataFrame(
        [(1, "image", bytearray(blob))],
        "doc_id long, kind string, content binary",
    )
    rows = extract_features(media, fake_decode=False).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height, r.channels) == (40, 24, 3)
    assert abs(r.mean_lum - img.mean()) < 4


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sub", ["444", "420"])
def test_progressive_decodes_exactly_like_baseline(sub):
    """Same quantizer, all magnitude bits transmitted across the scan
    script -> progressive reconstruction is BIT-IDENTICAL to baseline."""
    img = _grad(23, 37)
    base = encode_jpeg(img, subsampling=sub)
    prog = encode_jpeg(img, subsampling=sub, progressive=True)
    assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
    assert prog.count(b"\xff\xda") >= 6  # multi-scan script
    _, _, pb = decode_jpeg_pixels(base)
    _, _, pp = decode_jpeg_pixels(prog)
    assert (pb == pp).all()


def test_progressive_grayscale_and_adversarial_content():
    """Flat (pure EOB bands), isolated spikes (ZRL in first AND
    refinement passes), checkerboard (band-edge energy), dense noise
    (correction-bit heavy) all round-trip bit-identically."""
    rng = np.random.default_rng(7)
    flat = np.full((32, 32, 3), 128.0)
    sp = np.full((40, 48), 128.0)
    for y, x in [(3, 5), (3, 6), (17, 40), (33, 2), (39, 47)]:
        sp[y, x] = 255
    cb = (np.indices((24, 24)).sum(0) % 2) * 255.0
    cases = [
        flat,
        np.stack([sp, sp, sp], -1),
        np.stack([cb, 255 - cb, cb], -1),
        rng.integers(0, 256, (33, 31, 3)).astype(float),
    ]
    for px in cases:
        b = encode_jpeg(px)
        p = encode_jpeg(px, progressive=True)
        assert (decode_jpeg_pixels(b)[2] == decode_jpeg_pixels(p)[2]).all()
    g = _grad(17, 19)[..., 0]
    b = encode_jpeg(g, grayscale=True)
    p = encode_jpeg(g, grayscale=True, progressive=True)
    assert (decode_jpeg_pixels(b)[2] == decode_jpeg_pixels(p)[2]).all()


def test_progressive_stats_dispatch():
    img = _grad(20, 28)
    stats = decode_jpeg(encode_jpeg(img, progressive=True))
    assert (stats["width"], stats["height"], stats["channels"]) == (28, 20, 3)
    base = decode_jpeg(encode_jpeg(img))
    assert stats["mean_lum"] == base["mean_lum"]


def test_progressive_truncation_is_typed_error():
    prog = encode_jpeg(_grad(16, 16), progressive=True)
    for cut in (len(prog) // 3, len(prog) // 2, len(prog) - 3):
        try:
            decode_jpeg(prog[:cut])
        except JpegError:
            pass  # typed error or (for late cuts) partial-scan decode


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_progressive_fuzz_corrupt_entropy(seed):
    """Flipping bytes inside a progressive stream never crashes with
    anything but JpegError (or decodes to wrong-but-valid pixels)."""
    prog = bytearray(encode_jpeg(_grad(16, 16), progressive=True))
    rng = np.random.default_rng(seed)
    i = int(rng.integers(2, len(prog) - 2))
    prog[i] ^= int(rng.integers(1, 256))
    try:
        decode_jpeg(bytes(prog))
    except JpegError:
        pass
