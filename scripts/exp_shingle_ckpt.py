#!/usr/bin/env python
"""A/B: ngram_jaccard_pairs / containment_pairs — the hashed-shingle
table `sh` feeds BOTH a doc-grain size aggregation and a shingle-keyed
self-join; the two consumers shuffle on DIFFERENT keys, so exchange
reuse cannot kick in and the tokenize->slide->hash pipeline runs twice
(three times counting both join sides? no — the self-join's two sides
share one exchange). Does materializing sh once win?

Run each variant in its own process:
    python scripts/exp_shingle_ckpt.py jac_base | jac_ckpt | cont_base | cont_ckpt
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.session import get_spark
from casf_spark.operators import dedup as DD
from casf_spark.operators.dedup import _shingles
from casf_spark.functions.hashing import md5_long
from casf_spark import schemas

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def jaccard(df, ckpt, n=3, threshold=0.5):
    sh = _shingles(df, "doc_id", "text", n).select(
        "doc", md5_long("shingle").alias("sh"))
    if ckpt:
        sh = sh.localCheckpoint()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc").alias("doc0"), "sh")
    b = sh.select(F.col("doc").alias("doc1"), "sh")
    inter = (a.join(b, "sh").where(F.col("doc0") > F.col("doc1"))
             .groupBy("doc0", "doc1").agg(F.count(F.lit(1)).alias("n_inter")))
    sz0 = sizes.select(F.col("doc").alias("doc0"), F.col("n_sh").alias("n0"))
    sz1 = sizes.select(F.col("doc").alias("doc1"), F.col("n_sh").alias("n1"))
    out = (inter.join(sz0, "doc0").join(sz1, "doc1")
           .select("doc0", "doc1",
                   F.round(F.col("n_inter").cast("double")
                           / (F.col("n0") + F.col("n1") - F.col("n_inter")),
                           6).alias("jaccard"))
           .where(F.col("jaccard") >= threshold))
    return out


def main() -> None:
    mode = sys.argv[1]
    spark = get_spark("exp_shingle")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    if mode.startswith("jac"):
        fn = lambda: jaccard(docs, mode.endswith("ckpt"))
    else:
        if mode.endswith("ckpt"):
            raise SystemExit("containment ckpt variant: edit dedup.py, "
                             "use cont_base only for the baseline")
        fn = lambda: DD.containment_pairs(docs, "doc_id", "text", n=3,
                                          threshold=0.8)
    for _ in range(3):
        fn().write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(3):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"{mode}: best={min(samples)} samples={samples}")


if __name__ == "__main__":
    main()
