"""One-more-decade scaling audit for the steepest pairwise query shapes.

Synthesizes a ~sf0.3 dataset (3x sf0.1) without touching the read-only
testdata: three copies of sf0.1 with REMAPPED identity spaces —
documents get copy-prefixed tokens (so cross-copy similarity is zero and
the dedup pair structure grows linearly, the correct null model for
"more independent data"), lineitem gets offset order keys over the same
part catalog ("more orders, same catalog"). A naive verbatim copy would
manufacture cross-copy duplicate pairs and fake a super-linear blowup.

Measures the judge-flagged steepest queries at sf0.1 vs the synthetic
3x and reports the growth factor; linear cost = factor <= ~3.

Usage: python tools/scale_decade.py [query ...]
Output: one JSON line per query {"query", "t_sf01", "t_3x", "x_growth"}.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from kafka_stream_spark.registry import load_all  # noqa: E402
from kafka_stream_spark.session import get_spark  # noqa: E402

_TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")
SRC = f"{_TESTDATA}/sf0.1"
SYN = str(REPO / ".scale_syn" / "sf0.3")
COPIES = 3

DEFAULT_QUERIES = [
    "part_cooccurrence_lift",
    "dedup_simhash",
    "tfidf_top_terms",
    "dedup_ngram_jaccard",
]

# every table the default queries read
_NEEDED = ["documents", "lineitem", "part", "orders", "events", "embeddings",
           "customer", "supplier", "nation", "region"]


def synthesize(spark) -> None:
    if os.path.isdir(SYN) and os.path.exists(f"{SYN}/_OK"):
        return
    os.makedirs(SYN, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.count()
    doc_copies = []
    for k in range(COPIES):
        prefixed = docs.select(
            (F.col("doc_id") + F.lit(k * n_docs)).alias("doc_id"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
            F.array_join(
                F.transform(F.split("text", " "), lambda t: F.concat(F.lit(f"c{k}_"), t)),
                " ",
            ).alias("text"),
        )
        doc_copies.append(prefixed.select(docs.columns))
    d = doc_copies[0]
    for extra in doc_copies[1:]:
        d = d.unionByName(extra)
    d.write.mode("overwrite").parquet(f"{SYN}/documents.parquet")

    # One shared orderkey offset for BOTH lineitem and orders copies:
    # separate per-table maxima only align while every order has >=1
    # lineitem; a shared offset keeps copy-k rows joined regardless.
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    od = spark.read.parquet(f"{SRC}/orders.parquet")
    max_ok = (
        max(
            li.agg(F.max("l_orderkey")).first()[0],
            od.agg(F.max("o_orderkey")).first()[0],
        )
        + 1
    )
    li_copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * max_ok))
        for k in range(COPIES)
    ]
    s = li_copies[0]
    for extra in li_copies[1:]:
        s = s.unionByName(extra)
    s.write.mode("overwrite").parquet(f"{SYN}/lineitem.parquet")

    # orders: more orders over the SAME customer base (the realistic
    # fact-growth model — dimension keys stay put, fact keys offset)
    oc = [
        od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * max_ok))
        for k in range(COPIES)
    ]
    o = oc[0]
    for extra in oc[1:]:
        o = o.unionByName(extra)
    o.write.mode("overwrite").parquet(f"{SYN}/orders.parquet")

    # events: more events over the same users/types (offset event ids)
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    max_ev = ev.agg(F.max("event_id")).first()[0] + 1
    ec = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(k * max_ev))
        for k in range(COPIES)
    ]
    e = ec[0]
    for extra in ec[1:]:
        e = e.unionByName(extra)
    e.write.mode("overwrite").parquet(f"{SYN}/events.parquet")

    for t in _NEEDED:
        if t in ("documents", "lineitem", "orders", "events"):
            continue
        # embeddings/dims copy verbatim: duplicating vectors would
        # manufacture exact near-dup pairs (the WRONG null model for
        # similarity queries) — embedding-family growth is audited by
        # scale_check's real sf decades instead
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{SYN}/{t}.parquet"
        )
    open(f"{SYN}/_OK", "w").write("ok\n")


def main() -> None:
    spark = get_spark("kafka-stream-spark-scale-decade")
    specs = load_all()
    names = sys.argv[1:] or DEFAULT_QUERIES
    synthesize(spark)
    for name in names:
        spec = specs[name]
        out = {"query": name}
        for label, sf_dir in (("t_sf01", SRC), ("t_3x", SYN)):
            spec.build(spark, sf_dir).collect()  # warm cache/codegen
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                spec.build(spark, sf_dir).collect()
                best = min(best, time.time() - t0)
            out[label] = round(best, 2)
        out["x_growth"] = round(out["t_3x"] / max(out["t_sf01"], 1e-9), 2)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
