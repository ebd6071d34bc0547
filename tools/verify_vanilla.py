"""Vanilla-session sweep: run every query on a DRIVER-SHAPED session.

The round driver calls ``__spark_entry__`` with a vanilla SparkSession
(no engine confs) under whatever TZ the host has. ``verify_local.py``
uses the engine-configured session, so it cannot catch a query that
forgot to self-configure UTC / nanosAsLong via ``operators/_common.load``.
This sweep can — run it as:

    TZ=America/New_York python tools/verify_vanilla.py [query ...]

Comparison is stringified-value equality under sorted column names
(stricter in type-display terms than the driver's hash, same spirit).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def main() -> int:
    spark = SparkSession.builder.master("local[16]").getOrCreate()  # VANILLA
    from __spark_entry__ import oracle_sql, queries

    con = duckdb.connect()
    for t in TABLES.split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    qs, osql = queries(), oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    fails = []
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            s = sorted(
                tuple(str(x) for x in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            )
            rel = con.sql(osql[name])
            order = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
            d = sorted(tuple(str(r[i]) for i in order) for r in rel.fetchall())
            if s != d:
                fails.append((name, "value mismatch"))
                print(f"FAIL {name}: value mismatch", flush=True)
            else:
                print(f"PASS {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append((name, f"{type(e).__name__}: {e}"))
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
    print(f"\n{len(names) - len(fails)}/{len(names)} passed under vanilla session")
    for name, why in fails:
        print(f"  FAIL: {name}: {why[:160]}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
