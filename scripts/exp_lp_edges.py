#!/usr/bin/env python
"""A/B: does label_propagation's edges = union(pairs, pairs_rev)
localCheckpoint recompute the MinHash candidate pipeline once per union
leg, or does exchange reuse share it? Time the edge materialization with
raw pairs vs pairs.localCheckpoint() first.

    python scripts/exp_lp_edges.py base | ckpt
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.session import get_spark
from casf_spark.operators import dedup as DD
from casf_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
mode = sys.argv[1]

spark = get_spark("exp_lp_edges")
docs = load_table(spark, SF_DIR, "documents")

for i in range(3):
    t0 = time.time()
    pairs = DD.minhash_lsh_pairs(docs, "doc_id", "text",
                                 n=2, num_hashes=12, bands=4)
    if mode == "ckpt":
        pairs = pairs.localCheckpoint()
    edges = (pairs.select(F.col("doc0").alias("src"),
                          F.col("doc1").alias("dst"))
             .unionByName(
                 pairs.select(F.col("doc1").alias("src"),
                              F.col("doc0").alias("dst"))))
    edges = edges.localCheckpoint()
    n = edges.count()
    print(f"{mode} run{i}: {time.time()-t0:.3f}s n={n}", flush=True)
