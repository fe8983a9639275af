#!/usr/bin/env python
"""A/B: q_cdc_chunk_reuse — does materializing the v1 chunk table once
(localCheckpoint) beat recomputing the chunker pipeline for its two
consumers (the per-doc distinct hash set and the v1 rollup)?

Run each variant in its own process:
    python scripts/exp_cdc.py base | ckpt
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.session import get_spark
from casf_spark.functions import text as TX
from casf_spark.operators import curation as CU

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q(docs, ckpt: bool):
    toks = TX.tokens("text")
    n, p = F.size(toks), F.least(F.lit(5), F.size(toks))
    edited = F.concat_ws(
        " ",
        F.concat(F.slice(toks, 1, p),
                 F.array(F.lit("zzedit")),
                 F.slice(toks, p + 1, F.greatest(n - p, F.lit(0)))))
    base = docs.where(n > 0).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text",
        edited.alias("etext"))
    v1 = CU.content_defined_chunks(base, "doc_id", "text", divisor=16)
    if ckpt:
        v1 = v1.select("doc_id", F.md5("chunk_text").alias("h"))
        v1 = v1.localCheckpoint()
        h1 = v1.select("doc_id", "h").distinct().withColumn("hit", F.lit(1))
        agg1 = v1.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks_v1"))
    else:
        h1 = (v1.select("doc_id", F.md5("chunk_text").alias("h"))
              .distinct().withColumn("hit", F.lit(1)))
        agg1 = v1.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks_v1"))
    v2 = CU.content_defined_chunks(
        base.select("doc_id", F.col("etext").alias("text")),
        "doc_id", "text", divisor=16)
    h2 = v2.select("doc_id", F.md5("chunk_text").alias("h"))
    agg2 = (h2.join(h1, ["doc_id", "h"], "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_chunks_v2"),
                 F.sum(F.coalesce("hit", F.lit(0))).cast("long")
                 .alias("n_reused")))
    return (agg1.join(agg2, "doc_id")
            .select("doc_id", "n_chunks_v1", "n_chunks_v2", "n_reused",
                    F.round(F.col("n_reused") / F.col("n_chunks_v2"), 6)
                    .alias("reuse_ratio")))


def main() -> None:
    ckpt = sys.argv[1] == "ckpt"
    spark = get_spark("exp_cdc")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    for _ in range(3):
        q(docs, ckpt).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(3):
        t0 = time.time()
        q(docs, ckpt).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"{'ckpt' if ckpt else 'base'}: best={min(samples)} "
          f"samples={samples}")


if __name__ == "__main__":
    main()
