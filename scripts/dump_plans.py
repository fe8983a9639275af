#!/usr/bin/env python
"""Dump .explain('formatted') for named queries without timing them.

Usage: python scripts/dump_plans.py --dir plans/r13 --suffix before q1 q2 ...
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from casf_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--dir", default="plans/r13")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()
    qs = entrymod.queries()
    spark = get_spark("dump_plans")
    os.makedirs(args.dir, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(args.dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
