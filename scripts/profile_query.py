#!/usr/bin/env python
"""Standalone per-query profiler for the optimization rounds.

Usage: python scripts/profile_query.py [--explain-dir DIR] [--runs N] q1 q2 ...

For each named query: 3 warm passes at $SPARK_GRAFT_SF_DIR, then best-of-N
timed noop-sink materializations (guide §1.4), with the job labeled
(guide §1.5). With --explain-dir, writes `<dir>/<name>_<suffix>.txt`
containing df.explain("formatted") output (--suffix, default "before").

Prints one line per query: `<name> best=<s> samples=[...]` and a final
JSON object {name: best}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from casf_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warms", type=int, default=3)
    args = ap.parse_args()

    qs = entrymod.queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("profile_query")
    results: dict[str, float] = {}
    for name in args.names:
        fn = qs[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain_dir,
                                   f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(txt)
        for _ in range(args.warms):
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        samples = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
        results[name] = min(samples)
        print(f"{name} best={min(samples)} samples={samples}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
