#!/usr/bin/env python
"""A/B: winnow_overlap_pairs with vs without the fp localCheckpoint.
Run each in its own process: python scripts/exp_winnow.py base|ckpt
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.session import get_spark
from casf_spark.functions.text import winnow_fingerprints

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pairs(df, ckpt: bool, k=5, w=4, min_shared=2):
    fp = winnow_fingerprints(df, "doc_id", "text", k, w)
    if ckpt:
        fp = fp.localCheckpoint()
    a = fp.select(F.col("doc").alias("doc0"), "fp")
    b = fp.select(F.col("doc").alias("doc1"), "fp")
    return (a.join(b, "fp")
            .where(F.col("doc0") > F.col("doc1"))
            .groupBy("doc0", "doc1")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))


def main() -> None:
    ckpt = sys.argv[1] == "ckpt"
    spark = get_spark("exp_winnow")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    for _ in range(3):
        pairs(docs, ckpt).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(4):
        t0 = time.time()
        pairs(docs, ckpt).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"{sys.argv[1]}: best={min(samples)} samples={samples}")


if __name__ == "__main__":
    main()
