"""Tests for multimodal_phash_neardup and equidepth_histogram_value."""

import pyspark.sql.functions as F

from kafka_stream_spark.operators.multimodal import (
    _PH_BANDS,
    _PH_BAND_BITS,
    _PH_BITS,
    _PH_COLS,
    _PH_MAXDIST,
    _PH_SAMPLES,
    multimodal_phash_neardup,
)
from kafka_stream_spark.operators.olap_ext import equidepth_histogram_value


def _py_dhash(text: str) -> int:
    b = text.encode()
    n = len(b)
    smp = [b[(k * n) // _PH_SAMPLES] for k in range(_PH_SAMPLES)]
    h = 0
    for i in range(_PH_BITS):
        r, c = divmod(i, _PH_COLS)
        if smp[r * (_PH_COLS + 1) + c] < smp[r * (_PH_COLS + 1) + c + 1]:
            h |= 1 << i
    return h


def _bands(h: int):
    mask = (1 << _PH_BAND_BITS) - 1
    return {(j, (h >> (_PH_BAND_BITS * j)) & mask) for j in range(_PH_BANDS)}


def test_phash_pairs_match_reference(spark, sf_dir):
    """The banded-LSH result must equal the reference computation: all
    pairs sharing >= 1 band with Hamming <= threshold, hashes per the
    pure-Python dHash."""
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    hashes = {d: _py_dhash(t) for d, t in docs.items()}
    expect = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if _bands(hashes[a]) & _bands(hashes[b]):
                ham = bin(hashes[a] ^ hashes[b]).count("1")
                if ham <= _PH_MAXDIST:
                    expect.add((a, b, ham))

    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in multimodal_phash_neardup(spark, sf_dir).collect()
    }
    assert got == expect


def test_equidepth_histogram_is_balanced(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = events.count()
    # round-3 default: sketch-derived boundaries — every row lands in a
    # bucket and populations stay near-equal (the 2% plan-test bound)
    rows = equidepth_histogram_value(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(1, 11))
    assert sum(r.n for r in rows) == total
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 0.04 * total / 10 + 4
    # buckets are ordered, non-overlapping ranges (ties may touch)
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo + 1e-9
        assert a.lo <= a.hi
    # exact=True restores strict ntile balance: sizes differ by <= 1
    exact = equidepth_histogram_value(spark, sf_dir, exact=True).collect()
    esizes = [r.n for r in exact]
    assert sum(esizes) == total
    assert max(esizes) - min(esizes) <= 1
