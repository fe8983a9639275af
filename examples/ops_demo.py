#!/usr/bin/env python
"""Table-operations walkthrough: the maintenance story end to end —
fragmented landing data is compacted, Z-order clustered, gated by
declarative quality checks, written with in-job Observation metrics,
and a keyed changelog is compacted to its current snapshot.

Run: python examples/ops_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.operators import checks as CK
from casf_spark.operators.cdc import cdc_snapshot
from casf_spark.operators.profile import materialize_with_metrics
from casf_spark.session import get_spark
from casf_spark.sources.maintenance import compact_parquet, zorder_parquet
from casf_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ops_demo")
    work = tempfile.mkdtemp(prefix="casf_ops_")
    ev = load_table(spark, sf_dir, "events")

    print("== 1. fragmented landing dir (32 small files) ==")
    land = f"{work}/landing"
    ev.repartition(32).write.parquet(land)

    print("== 2. compact + Z-order on (user_id, value) ==")
    zod = f"{work}/clustered"
    out = zorder_parquet(spark, land, zod, ["user_id", "value"],
                         target_file_bytes=256 * 1024)
    n_files = len([f for f in os.listdir(zod) if f.endswith(".parquet")])
    print(f"   {n_files} clustered files, {out.count()} rows")

    print("== 3. quality gate ==")
    CK.run_checks(out, [
        CK.not_null("event_id"), CK.unique("event_id"),
        CK.in_range("value", 0.0, 1000.0)]).show()

    print("== 4. write with in-job metrics (no second scan) ==")
    metrics = materialize_with_metrics(
        out, {"n_rows": F.count(F.lit(1)),
              "n_users": F.approx_count_distinct("user_id")},
        path=f"{work}/final")
    print("  ", metrics)

    print("== 5. CDC snapshot of the per-user value stream ==")
    log = out.select("user_id", "event_id", "ts", "value",
                     F.lit("u").alias("op"))
    snap = cdc_snapshot(log, ["user_id"], ["ts", "event_id"], "op")
    print(f"   {snap.count()} current rows (one per user)")


if __name__ == "__main__":
    main()
