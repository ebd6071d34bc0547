"""Hostile-input fuzz across every wire/file decoder: arbitrary bytes
must TERMINATE with a clean, typed error (or parse) — no hangs, no
unexpected exception classes. This is the property a network-facing
codec actually needs; per-format correctness lives in each codec's own
test file."""

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

# every decoder raises from this set (or returns) on garbage
OK_ERRORS = (ValueError, NotImplementedError, KeyError, IndexError,
             EOFError, zlib.error, UnicodeDecodeError, struct.error)

_garbage = st.binary(min_size=0, max_size=400)


def _check(fn, data):
    try:
        fn(data)
    except OK_ERRORS:
        pass


@given(_garbage)
@settings(max_examples=120, deadline=None)
def test_image_decoders_terminate(data):
    from kafka_stream_spark.operators.multimodal import decode_image

    _check(decode_image, data)
    # also with plausible magics prepended — exercises deeper paths
    for magic in (b"P6\n", b"BM", b"\x89PNG\r\n\x1a\n", b"GIF89a"):
        _check(decode_image, magic + data)


@given(_garbage)
@settings(max_examples=80, deadline=None)
def test_audio_video_decoders_terminate(data):
    from kafka_stream_spark.operators.multimodal import (
        decode_audio, decode_video)

    _check(decode_audio, data)
    _check(decode_audio, b"RIFF" + data)
    _check(decode_video, data)
    _check(decode_video, b"YUV4MPEG2 " + data)


@given(_garbage)
@settings(max_examples=80, deadline=None)
def test_stream_codecs_terminate(data):
    from kafka_stream_spark.sources import (
        blockchain_codec, mqtt_codec, resp_codec, stomp_codec)

    for mod in (blockchain_codec, mqtt_codec, stomp_codec, resp_codec):
        try:
            frames, rest = mod.decode_stream(data)
            # incremental contract: remainder is a suffix of the input
            assert data.endswith(rest)
        except OK_ERRORS:
            pass


@given(_garbage)
@settings(max_examples=80, deadline=None)
def test_coap_and_avro_terminate(data):
    from kafka_stream_spark.functions import avro_ocf
    from kafka_stream_spark.sources import coap_codec

    _check(coap_codec.decode, data)
    _check(avro_ocf.read_ocf, data)
    _check(avro_ocf.read_ocf, b"Obj\x01" + data)


@given(_garbage)
@settings(max_examples=60, deadline=None)
def test_lzw_terminates(data):
    from kafka_stream_spark.operators.multimodal import _lzw_decode

    for mcs in (2, 4, 8):
        _check(lambda d: _lzw_decode(d, mcs), data)
