#!/usr/bin/env python
"""Local mirror of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01 (or $SPARK_GRAFT_SF_DIR), compares
row count, sorted column names, and an order-insensitive value multiset.

Usage: python scripts/verify_contract.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from casf_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # queries round explicitly; this is belt-and-braces canonicalization
        return round(v, 9)
    if isinstance(v, int):
        return v
    try:  # Decimal and friends
        import decimal
        if isinstance(v, decimal.Decimal):
            f = float(v)
            return int(f) if f.is_integer() else round(f, 9)
    except Exception:
        pass
    return str(v)


def to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    args = sys.argv[1:]
    window = "--window" in args
    only = set(a for a in args if not a.startswith("--"))
    spark = get_spark("verify_contract")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    if window:
        # mirror the grading driver's gate: the FIRST 50 registered names
        qs = dict(list(qs.items())[:50])
        print(f"== --window: checking the driver's first "
              f"{len(qs)} names ==")
    oracles = entrymod.oracle_sql()
    missing_oracle = [k for k in qs if k not in oracles]

    print(f"== entry() smoke (sf0.001) ==", flush=True)
    t0 = time.time()
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"entry rows={n} ({time.time()-t0:.1f}s)  -> {'OK' if n > 0 else 'FAIL'}")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"{name}: SPARK ERROR: {e}")
            continue
        if name not in oracles:
            status = f"rows-only rows={len(srows)}"
            if len(srows) == 0:
                status += " (EMPTY?)"
            print(f"{name}: {status} ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"{name}: DUCKDB ERROR: {e}")
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount {len(srows)} != {len(drows)}")
        if ok:
            ms, md = to_multiset(scols, srows), to_multiset(dcols, drows)
            if ms != md:
                ok = False
                extra_s = [k for k in ms if ms[k] != md.get(k, 0)][:3]
                extra_d = [k for k in md if md[k] != ms.get(k, 0)][:3]
                msgs.append(f"values differ; spark-only={extra_s} duck-only={extra_d}")
        tag = "OK" if ok else "MISMATCH"
        if not ok:
            failures.append(name)
        print(f"{name}: {tag} rows={len(srows)} ({time.time()-t0:.1f}s)"
              + ("  " + "; ".join(msgs) if msgs else ""))

    if missing_oracle:
        print(f"(rows-only, no oracle: {missing_oracle})")
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
