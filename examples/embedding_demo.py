#!/usr/bin/env python
"""Embedding-pipeline demo: the vector-side workflow end to end —
corpus anisotropy (dominant eigenvector via one-pass Gram + power
iteration), exact brute-force ANN, hyperplane-LSH accelerated ANN,
near-duplicate detection, and label-centroid outliers.

Run: python examples/embedding_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.operators import relevance as RV
from casf_spark.operators import similarity as SIM
from casf_spark.operators.linalg import power_iteration
from casf_spark.session import get_spark
from casf_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("embedding_demo")
    emb = load_table(spark, sf_dir, "embeddings")

    print("== dominant principal direction (top-8 loadings) ==")
    power_iteration(emb, "embedding", n_iter=8) \
        .orderBy(F.desc(F.abs(F.col("loading")))).show(8)

    queries = emb.where(F.col("vec_id") < 5)
    print("== exact top-5 neighbors for 5 query vectors ==")
    SIM.brute_force_topk(emb, queries, k=5).orderBy("query_id", "rank") \
        .show(25)

    print("== LSH-bucketed approximate top-5 per vector (first 5 ids) ==")
    SIM.lsh_topk(emb, k=5, num_planes=8).where(F.col("id") < 5) \
        .orderBy("id", "rank").show(25)

    print("== label-centroid outliers (top 10) ==")
    RV.label_centroid_outliers(emb, k=10).show(10)


if __name__ == "__main__":
    main()
