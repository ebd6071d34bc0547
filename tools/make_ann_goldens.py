"""Regenerate the TRAINED ARTIFACTS backing the ANN oracles.

Round-2 froze golden row selections (self-referential). Round 3 freezes
the trained index artifacts instead — IVF centroids, PQ codebooks,
IVF-PQ coarse+fine codebooks, the OPQ rotation — as single-file parquet
under ``kafka_stream_spark/operators/ann_artifacts/<sf-tag>/``, one set
per testdata SF, plus a ``meta.json`` mapping sf-tag → embeddings corpus
count (the oracle's SF dispatch key). The DuckDB oracles in
``operators/_ann_oracles.py`` recompute the FULL search from these, so
the engine's row selection is cross-engine verified.

Run after changing any ANN training code:
    python tools/make_ann_goldens.py
then re-verify with:
    python tools/verify_local.py ann_ivf_kmeans_topk ann_pq_topk \
        ann_ivfpq_topk ann_opq_topk mmr_diverse_topk
and run tests/test_ann_artifacts.py.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIRS = [
    d
    for d in os.environ.get(
        "SPARK_GRAFT_GOLDEN_SF_DIRS",
        "/root/testdata/sf0.001:/root/testdata/sf0.01:/root/testdata/sf0.1",
    ).split(":")
    if d
]
OUT = REPO / "kafka_stream_spark" / "operators" / "ann_artifacts"

# per-artifact sort keys → byte-stable files across regenerations
SORT_KEYS = {
    "ivf_centroids": ["cid"],
    "pq_codebooks": ["m", "cid"],
    "ivfpq_coarse": ["cid"],
    "ivfpq_pq": ["m", "cid"],
    "opq_rotation": ["i"],
    "opq_pq": ["m", "cid"],
}


def main() -> int:
    from kafka_stream_spark.operators.similarity import train_ann_artifacts
    from kafka_stream_spark.session import get_spark

    spark = get_spark("make-ann-artifacts")
    meta: dict[str, int] = {}
    for sf_dir in SF_DIRS:
        tag = pathlib.Path(sf_dir.rstrip("/")).name
        # exact-integer fingerprint matching _ann_oracles._FINGERPRINT
        # (count alone collides: sf0.001 and sf0.01 both have 500 rows)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        agg = emb.selectExpr(
            "count(*) * 1000000 + sum(label) AS fp"
        ).first()
        meta[tag] = int(agg.fp)
        dest = OUT / tag
        dest.mkdir(parents=True, exist_ok=True)
        for name, df in train_ann_artifacts(spark, sf_dir).items():
            pdf = df.toPandas().sort_values(SORT_KEYS[name]).reset_index(drop=True)
            pq.write_table(pa.Table.from_pandas(pdf), dest / f"{name}.parquet")
            print(f"{tag}/{name}: {len(pdf)} rows")
    fps = list(meta.values())
    if len(set(fps)) != len(fps):
        raise SystemExit(f"corpus fingerprints must be distinct per SF, got {meta}")
    (OUT / "meta.json").write_text(json.dumps(meta, indent=2) + "\n")
    print(f"wrote {OUT}/meta.json: {meta}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
