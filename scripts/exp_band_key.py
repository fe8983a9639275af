#!/usr/bin/env python
"""A/B: MinHash banding join keyed by the concat_ws STRING bucket vs the
raw signature LONG columns. Candidate pair sets are identical (longs
cannot contain the separator, so concat equality == componentwise
equality); the question is join-key cost: building/hashing ~25-char
strings vs 3 fixed-width longs.

    python scripts/exp_band_key.py str | long | check
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


def pairs_long(df, n=2, num_hashes=12, bands=4, seed=42):
    rows_per_band = num_hashes // bands
    sig = DD.minhash_signatures(df, "doc_id", "text", n, num_hashes, seed)
    banded = sig.select(
        "doc",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                *[F.col(f"mh_{b * rows_per_band + r}").alias(f"k{r}")
                  for r in range(rows_per_band)])
            for b in range(bands)
        ])).alias("bb"),
    ).select("doc", "bb.band",
             *[F.col(f"bb.k{r}") for r in range(rows_per_band)])
    keys = ["band"] + [f"k{r}" for r in range(rows_per_band)]
    a = banded.select(F.col("doc").alias("doc0"), *keys)
    b = banded.select(F.col("doc").alias("doc1"), *keys)
    return (a.join(b, keys)
            .where(F.col("doc0") > F.col("doc1"))
            .select("doc0", "doc1")
            .distinct())


def main():
    mode = sys.argv[1]
    spark = get_spark("exp_band_key")
    docs = load_table(spark, SF_DIR, "documents")
    if mode == "check":
        cur = DD.minhash_lsh_pairs(docs, "doc_id", "text", 2, 12, 4)
        new = pairs_struct(docs)
        a = {(r.doc0, r.doc1) for r in cur.collect()}
        b = {(r.doc0, r.doc1) for r in new.collect()}
        print("identical:", a == b, len(a), len(b))
        return
    fn = {"str": lambda: DD.minhash_lsh_pairs(docs, "doc_id", "text",
                                              2, 12, 4),
          "long": lambda: pairs_long(docs),
          "struct": lambda: pairs_struct(docs)}[mode]
    for _ in range(3):
        fn().write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(4):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"{mode}: best={min(samples)} samples={samples}")




def pairs_struct(df, n=2, num_hashes=12, bands=4, seed=42):
    rows_per_band = num_hashes // bands
    sig = DD.minhash_signatures(df, "doc_id", "text", n, num_hashes, seed)
    banded = sig.select(
        "doc",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.struct(*[
                    F.col(f"mh_{b * rows_per_band + r}").alias(f"k{r}")
                    for r in range(rows_per_band)]).alias("bucket"))
            for b in range(bands)
        ])).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    a = banded.select(F.col("doc").alias("doc0"), "band", "bucket")
    b = banded.select(F.col("doc").alias("doc1"), "band", "bucket")
    return (a.join(b, ["band", "bucket"])
            .where(F.col("doc0") > F.col("doc1"))
            .select("doc0", "doc1")
            .distinct())


if __name__ == "__main__":
    main()
