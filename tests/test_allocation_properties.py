"""Adversarial-input invariants for the largest-remainder proration:
the fixed TPC-H-ish parquet exercises one distribution; this generates
a hostile one (single-item orders, heavy skew, exact remainder ties,
zero-cent items) and asserts the allocation law itself."""

import random

from kafka_stream_spark.registry import load_all


def _synthetic_lineitem(spark, path: str):
    """200 orders: sizes 1..8, weights mixing 0-cent items, ties (equal
    weights -> equal remainders, broken by l_linenumber), and 6-order-of-
    magnitude skew. Seeded: the frame is reproducible."""
    rng = random.Random(42)
    rows = []
    for ok in range(1, 201):
        n = rng.randint(1, 8)
        style = rng.choice(["equal", "skew", "mixed"])
        for ln in range(1, n + 1):
            if style == "equal":
                cents = 333  # all-equal: every remainder ties
            elif style == "skew":
                cents = 10 ** rng.randint(0, 6)
            else:
                cents = rng.choice([0, 1, 99, 100_000])
            rows.append((ok, ln, cents / 100.0, 0.0, 0.0))
        # guarantee W > 0 even if every mixed draw was 0
        rows[-1] = (ok, n, max(rows[-1][2], 0.01), 0.0, 0.0)
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_extendedprice double,"
        " l_discount double, l_tax double",
    )
    df.write.parquet(f"{path}/lineitem.parquet")


def test_allocation_law_on_adversarial_orders(spark, tmp_path):
    _synthetic_lineitem(spark, str(tmp_path))
    spec = load_all()["prorate_penny_allocation"]
    out = spec.build(spark, str(tmp_path)).collect()
    assert len(out) == 200
    for r in out:
        # the law: allocations sum EXACTLY to the target, every order
        assert r.alloc_sum_cents == r.target_cents, r
        # floor/ceil bound: no item exceeds its exact share by > 1 cent,
        # which implies max - min spread is bounded by share spread + 1
        assert r.min_alloc_cents >= 0, r
        assert r.max_alloc_cents <= r.target_cents, r
