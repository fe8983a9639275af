#!/usr/bin/env python
"""A/B: dedup_edit_distance — does repartitioning the candidate pairs
before the levenshtein rescoring spread the O(len^2) work across cores?
Run: python scripts/exp_editdist.py base|repart
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.session import get_spark
from casf_spark.operators import dedup as DD

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q(docs, mode):
    cand = DD.minhash_lsh_pairs(docs, "doc_id", "text",
                                n=2, num_hashes=12, bands=4)
    if mode == "repart":
        cand = cand.repartition("doc0", "doc1")
    t0 = docs.select(F.col("doc_id").cast("long").alias("doc0"),
                     F.col("text").alias("t0"))
    t1 = docs.select(F.col("doc_id").cast("long").alias("doc1"),
                     F.col("text").alias("t1"))
    lev = F.levenshtein("t0", "t1")
    sim = F.lit(1.0) - lev / F.greatest(F.length("t0"), F.length("t1"))
    return (cand.join(t0, "doc0").join(t1, "doc1")
            .select("doc0", "doc1",
                    lev.cast("long").alias("edit_dist"),
                    F.round(sim, 6).alias("edit_sim")))


def main() -> None:
    mode = sys.argv[1]
    spark = get_spark("exp_editdist")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    for _ in range(3):
        q(docs, mode).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(3):
        t0 = time.time()
        q(docs, mode).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"{mode}: best={min(samples)} samples={samples}")


if __name__ == "__main__":
    main()
