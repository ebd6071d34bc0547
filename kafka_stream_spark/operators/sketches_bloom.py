"""Bloom-filter membership sketch — the bounded-size answer to
"is this key in that huge set" (Bloom 1970, public).

`decontaminate_documents` broadcasts the benchmark set exactly; that
works while the set fits an exact broadcast. At 100 TB the build side
can be billions of keys, and the production shape is a fixed-size
Bloom filter: k hashed bit positions per key OR-ed into an M-bit
array. The sketch is MERGEABLE (bit_or is associative/commutative →
map-side partial aggregation collapses each partition to 64 words
before the exchange) and probes are pure bit math — the classic
semi-join pruning filter Spark itself applies as runtime bloom
pruning, here surfaced as an explicit, auditable operator.

This query builds a 4032-bit / 3-hash bloom over one customer market
segment's keys, probes EVERY order against it, and joins back the
exact membership to report the realized false-positive rate next to
the bloom's pass counts — the sketch and its quality audit in one
result. Hashes are the same integer linear-congruential family the
MinHash family uses (exact in both engines), so every count is
integer-deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

_BLOOM_P = 2147483647  # 2^31 - 1, same modulus as the MinHash family
_BLOOM_BITS = 4032  # M: 64 words x 63 bits (bit 63 would overflow a signed shift)
_BLOOM_HASHES = ((1103515245, 12345), (1140671485, 12820163), (22695477, 1))
_SEGMENT = "BUILDING"


def _positions(x: str) -> list[str]:
    """The k bit-position expressions for key column `x` — identical
    arithmetic text for Spark and DuckDB (signed 64-bit %, *)."""
    return [
        f"(({a} * {x} + {b}) % {_BLOOM_P}) % {_BLOOM_BITS}"
        for a, b in _BLOOM_HASHES
    ]


def _duck_oracle() -> str:
    pos_legs = " UNION ALL ".join(
        f"SELECT ({p}) // 63 AS w, ({p}) % 63 AS bit FROM keys"
        for p in _positions("c_custkey")
    )
    probe_cols = ", ".join(
        f"({p}) // 63 AS w{i}, ({p}) % 63 AS b{i}"
        for i, p in enumerate(_positions("o_custkey"))
    )
    return f"""
    WITH keys AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = '{_SEGMENT}'
    ),
    pos AS ({pos_legs}),
    bloom AS (
      SELECT w, bit_or(1::BIGINT << CAST(bit AS INTEGER)) AS word
      FROM pos GROUP BY w
    ),
    probe AS (
      SELECT o_orderkey, o_custkey, {probe_cols} FROM orders
    ),
    hits AS (
      SELECT p.o_orderkey, p.o_custkey
      FROM probe p
      JOIN bloom w0 ON w0.w = p.w0
      JOIN bloom w1 ON w1.w = p.w1
      JOIN bloom w2 ON w2.w = p.w2
      WHERE (w0.word & (1::BIGINT << CAST(p.b0 AS INTEGER))) <> 0
        AND (w1.word & (1::BIGINT << CAST(p.b1 AS INTEGER))) <> 0
        AND (w2.word & (1::BIGINT << CAST(p.b2 AS INTEGER))) <> 0
    ),
    truth AS (
      SELECT h.o_orderkey,
             CASE WHEN k.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS is_member
      FROM hits h LEFT JOIN keys k ON k.c_custkey = h.o_custkey
    )
    SELECT CAST((SELECT count(*) FROM keys) AS BIGINT) AS n_keys,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_probes,
           CAST(count(*) AS BIGINT) AS n_bloom_pass,
           CAST(sum(is_member) AS BIGINT) AS n_true_members,
           CAST(count(*) - sum(is_member) AS BIGINT) AS n_false_pos,
           round((count(*) - sum(is_member)) * 1.0
                 / (SELECT count(*) FROM orders), 6) AS fp_rate
    FROM truth
    """


@query(
    "bloom_membership_orders",
    oracle=_duck_oracle(),
    description=(
        "4032-bit/3-hash Bloom membership filter over one market "
        "segment's customers, probed by every order, with the realized "
        "false-positive rate audited against exact membership — the "
        "mergeable semi-join pruning sketch"
    ),
    bench=True,
)
def bloom_membership_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build: one groupBy over 3x|keys| position rows whose bit_or
    partials collapse map-side to <= 64 words per task — the sketch
    costs one 64-row exchange no matter how many keys. Probe: the
    64-row bloom broadcasts onto the order scan; the membership test is
    three bit-tests (at scale this prunes the probe side BEFORE any
    expensive join — the false-positive audit here exists to measure
    that trade). Exact-membership comparison joins the (already
    bloom-passed) hits only.
    """
    customer, orders = load(spark, sf_dir, "customer", "orders")
    keys = customer.filter(F.col("c_mktsegment") == _SEGMENT).select("c_custkey")

    pos_legs = [
        keys.select(
            F.expr(f"({p}) div 63").alias("w"),
            F.expr(f"({p}) % 63").alias("bit"),
        )
        for p in _positions("c_custkey")
    ]
    pos = pos_legs[0].unionByName(pos_legs[1]).unionByName(pos_legs[2])
    bloom = pos.groupBy("w").agg(
        F.expr("bit_or(shiftleft(cast(1 as bigint), cast(bit as int)))").alias("word")
    )

    # The sketch is 64 words BY CONSTRUCTION at any corpus size, so it
    # collects once and probes as a LITERAL array — the probe side is
    # map-only bit math with zero joins (r7; the r6 plan ran three
    # broadcast-hash-joins of the same 64-row table, three broadcast
    # builds + probe-side join machinery for what is a fixed-size
    # filter. This is exactly how a production bloom prunes a scan:
    # the bits ride inside the predicate, not through a join).
    words = [0] * (_BLOOM_BITS // 63)
    for r in bloom.collect():
        words[int(r["w"])] = int(r["word"])
    words_sql = f"array({', '.join(f'{x}L' for x in words)})"
    bit_tests = [
        f"(element_at({words_sql}, cast(({p}) div 63 as int) + 1)"
        f" & shiftleft(cast(1 as bigint), cast(({p}) % 63 as int))) <> 0"
        for p in _positions("o_custkey")
    ]
    hits = orders.select("o_orderkey", "o_custkey").filter(
        F.expr(" AND ".join(bit_tests))
    )
    truth = hits.join(
        F.broadcast(keys.withColumn("is_member", F.lit(1))),
        hits.o_custkey == F.col("c_custkey"),
        "left",
    ).select(F.coalesce("is_member", F.lit(0)).alias("is_member"))

    n_keys = keys.agg(F.count(F.lit(1)).alias("n_keys"))
    n_probes = orders.agg(F.count(F.lit(1)).alias("n_probes"))
    agg = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bloom_pass"),
        F.sum("is_member").cast("bigint").alias("n_true_members"),
        (F.count(F.lit(1)) - F.sum("is_member")).cast("bigint").alias("n_false_pos"),
    )
    return (
        agg.crossJoin(F.broadcast(n_keys))
        .crossJoin(F.broadcast(n_probes))
        .select(
            F.col("n_keys").cast("bigint").alias("n_keys"),
            F.col("n_probes").cast("bigint").alias("n_probes"),
            "n_bloom_pass",
            "n_true_members",
            "n_false_pos",
            F.round(F.col("n_false_pos") * 1.0 / F.col("n_probes"), 6).alias(
                "fp_rate"
            ),
        )
    )
