"""Local replica of the driver's correctness gate.

Runs every queries() entry at sf0.01 on Spark AND its oracle_sql() on
DuckDB, then compares row count, column names, and cell values
(order-insensitive: columns sorted by name, rows sorted by all columns).
Exact equality is required — if this passes, any value-hash the driver
computes passes too.

Usage: python tools/verify_local.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def normalize(rows: list[tuple], cols: list[str]):
    """Sort columns by name and rows by value; canonicalize cell types."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def canon(v):
        if v is None:
            return (0, "")
        if isinstance(v, bool):
            return (1, str(int(v)))
        if isinstance(v, float):
            if math.isnan(v):
                return (2, "nan")
            return (2, repr(v))  # exact — driver hashes raw values
        if isinstance(v, int):
            return (2, repr(float(v)) if abs(v) < 2**52 else str(v))
        return (3, str(v))

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]


def main(argv: list[str]) -> int:
    from __spark_entry__ import oracle_sql, queries
    from kafka_stream_spark.session import get_spark

    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = argv
    spark = get_spark("verify-local")
    con = duck_connection()
    qs, oracles = queries(), oracle_sql()
    names = only or sorted(qs)
    failures = []
    results = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            results[name] = {"rows": None, "match": False, "err": f"spark: {type(e).__name__}"}
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            results[name] = {"rows": len(srows), "match": None, "err": None}
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            results[name] = {"rows": len(srows), "match": False, "err": f"duckdb: {type(e).__name__}"}
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            results[name] = {"rows": len(srows), "match": False, "err": "columns"}
            print(f"FAIL {name}: columns differ: spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            results[name] = {"rows": len(srows), "match": False, "err": "rowcount"}
            print(f"FAIL {name}: row count: spark={len(srows)} duck={len(drows)}")
            continue
        sn, _ = normalize(srows, scols)
        dn, _ = normalize(drows, dcols)
        if sn != dn:
            bad = next(i for i, (a, b) in enumerate(zip(sn, dn)) if a != b)
            failures.append(name)
            results[name] = {"rows": len(srows), "match": False, "err": "values"}
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"  spark: {sn[bad]}")
            print(f"  duck : {dn[bad]}")
            continue
        results[name] = {"rows": len(srows), "match": True, "err": None}
        print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if json_path:
        import json as _json

        with open(json_path, "w") as f:
            _json.dump(results, f, indent=1, sort_keys=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
