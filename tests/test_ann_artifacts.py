"""Frozen ANN artifacts (operators/ann_artifacts/) must stay in lockstep
with what the queries train inline — the guard that keeps the artifact-
backed DuckDB oracles honest. If any of these fail after touching ANN
training code, regenerate with ``python tools/make_ann_goldens.py``.
"""

import json
import math
import pathlib

import pytest

from kafka_stream_spark.operators.similarity import train_ann_artifacts

ART = (
    pathlib.Path(__file__).resolve().parent.parent
    / "kafka_stream_spark"
    / "operators"
    / "ann_artifacts"
)
TAG = "sf0.001"  # the test-session SF

NAMES = [
    "ivf_centroids",
    "pq_codebooks",
    "ivfpq_coarse",
    "ivfpq_pq",
    "opq_rotation",
    "opq_pq",
]


def test_artifacts_exist_for_all_tags():
    meta = json.loads((ART / "meta.json").read_text())
    assert set(meta) >= {"sf0.001", "sf0.01", "sf0.1"}
    assert len(set(meta.values())) == len(meta), "fingerprints must be distinct"
    for tag in meta:
        for name in NAMES:
            assert (ART / tag / f"{name}.parquet").exists(), f"{tag}/{name}"


def test_fingerprint_matches_dispatch_key(spark, sf_dir):
    # the oracle's SQL dispatch key must hit this SF's meta entry exactly
    meta = json.loads((ART / "meta.json").read_text())
    fp = spark.read.parquet(f"{sf_dir}/embeddings.parquet").selectExpr(
        "count(*) * 1000000 + sum(label) AS fp"
    ).first().fp
    assert int(fp) == meta[TAG]


@pytest.mark.slow
def test_inline_training_reproduces_frozen_artifacts(spark, sf_dir):
    """Retrain everything at sf0.001 and compare against the frozen
    parquet: same keys, element values within float summation-order
    noise (1e-9 — far below the 6dp rounding the searches compare at)."""
    import pandas as pd

    fresh = train_ann_artifacts(spark, sf_dir)
    for name in NAMES:
        frozen = pd.read_parquet(ART / TAG / f"{name}.parquet")
        live = fresh[name].toPandas()
        key_cols = [c for c in frozen.columns if c in ("m", "cid", "i")]
        vec_col = [c for c in frozen.columns if c not in key_cols][0]
        frozen = frozen.sort_values(key_cols).reset_index(drop=True)
        live = live.sort_values(key_cols).reset_index(drop=True)
        assert len(frozen) == len(live), name
        assert (frozen[key_cols].values == live[key_cols].values).all(), name
        for a, b in zip(frozen[vec_col], live[vec_col]):
            assert len(a) == len(b), name
            assert all(
                math.isclose(x, y, rel_tol=0, abs_tol=1e-9)
                for x, y in zip(a, b)
            ), name
