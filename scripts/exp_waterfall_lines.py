#!/usr/bin/env python
"""A/B: q_dedup_waterfall's pseudo-line table feeds line_dedup_keep
(line-content window) AND the per-doc total count — differently keyed
consumers, so the tokenize->chunk explode runs twice without
materialization. Does a localCheckpoint win?

    python scripts/exp_waterfall_lines.py base | ckpt
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.session import get_spark
from casf_spark.functions import text as TX
from casf_spark.operators import dedup as DD
from casf_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def lstat(docs, ckpt):
    tok_df = docs.select(F.col("doc_id").cast("long").alias("doc"),
                         TX.tokens("text").alias("toks"))
    n_chunks = F.ceil(F.size("toks") / F.lit(10.0)).cast("int")
    chunk_arr = F.when(
        F.size("toks") > 0,
        F.transform(F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.array_join(
                        F.slice("toks", i * 10 + 1, 10), " ")),
    ).otherwise(F.array().cast("array<string>"))
    lines = tok_df.select("doc", F.posexplode(chunk_arr)
                          .alias("pos", "line"))
    if ckpt:
        lines = lines.localCheckpoint()
    kept_lines = DD.line_dedup_keep(lines)
    return (lines.groupBy("doc")
            .agg(F.count(F.lit(1)).alias("n_total"))
            .join(kept_lines.groupBy("doc")
                  .agg(F.count(F.lit(1)).alias("n_kept")), "doc", "left")
            .select(F.col("doc").alias("doc_id"),
                    ((F.coalesce("n_kept", F.lit(0)) * 2)
                     <= F.col("n_total")).alias("line")))


mode = sys.argv[1]
spark = get_spark("exp_wf_lines")
docs = load_table(spark, SF_DIR, "documents")
fn = lambda: lstat(docs, mode == "ckpt")
for _ in range(3):
    fn().write.format("noop").mode("overwrite").save()
samples = []
for _ in range(4):
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    samples.append(round(time.time() - t0, 3))
print(f"{mode}: best={min(samples)} samples={samples}")
