#!/usr/bin/env python
"""A/B experiment: does materializing the MinHash signature table once
(localCheckpoint) beat recomputing it on both sides of the LSH band
self-join? Run each variant in ITS OWN process:

    python scripts/exp_minhash_reuse.py base   # current code path
    python scripts/exp_minhash_reuse.py ckpt   # sig localCheckpointed
    python scripts/exp_minhash_reuse.py spans_base | spans_ckpt
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.session import get_spark
from casf_spark.operators import dedup as DD
from casf_spark.functions.hashing import md5_long
from casf_spark.functions import text as TXF
from casf_spark import schemas

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pairs_ckpt(df, id_col, text_col, n=2, num_hashes=12, bands=4, seed=42):
    rows_per_band = num_hashes // bands
    sig = DD.minhash_signatures(df, id_col, text_col, n, num_hashes, seed)
    sig = sig.localCheckpoint()
    banded = sig.select(
        "doc",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("_", *[
                    F.col(f"mh_{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ]).alias("bucket"))
            for b in range(bands)
        ])).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    a = banded.select(F.col("doc").alias("doc0"), "band", "bucket")
    b = banded.select(F.col("doc").alias("doc1"), "band", "bucket")
    out = (a.join(b, ["band", "bucket"])
           .where(F.col("doc0") > F.col("doc1"))
           .select("doc0", "doc1")
           .distinct())
    return schemas.conform(out, schemas.CANDIDATE_PAIR)


def spans(df, ckpt: bool, n=4):
    tok_df = df.select(F.col("doc_id").cast("long").alias("doc"),
                       TXF.tokens("text").alias("toks"))
    if ckpt:
        tok_df = tok_df.localCheckpoint()
    grams = F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.array_join(F.slice("toks", i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = (tok_df.select("doc", F.posexplode(grams).alias("pos", "gram"))
           .select("doc", "pos", md5_long("gram").alias("g")))
    if ckpt:
        occ = occ.localCheckpoint()
    dup = (occ.groupBy("g")
           .agg(F.countDistinct("doc").alias("nd"))
           .where(F.col("nd") >= 2)
           .select("g"))
    cov = (occ.join(dup, "g")
           .select("doc", F.explode(
               F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("tp"))
           .groupBy("doc")
           .agg(F.countDistinct("tp").alias("covered")))
    lens = tok_df.select("doc", F.size("toks").cast("long").alias("n_tokens"))
    return (lens.join(cov, "doc", "left")
            .select("doc", "n_tokens",
                    F.coalesce("covered", F.lit(0)).cast("long")
                    .alias("covered"),
                    F.round(F.coalesce("covered", F.lit(0))
                            / F.greatest(F.col("n_tokens"), F.lit(1)), 6)
                    .alias("dup_span_frac")))


def main() -> None:
    mode = sys.argv[1]
    spark = get_spark("exp_minhash")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def build():
        if mode == "base":
            return DD.minhash_lsh_pairs(docs, "doc_id", "text",
                                        n=2, num_hashes=12, bands=4)
        if mode == "ckpt":
            return pairs_ckpt(docs, "doc_id", "text")
        if mode == "spans_base":
            return spans(docs, ckpt=False)
        if mode == "spans_ckpt":
            return spans(docs, ckpt=True)
        raise SystemExit(f"unknown mode {mode}")

    for _ in range(3):  # warm
        build().write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(3):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"{mode}: best={min(samples)} samples={samples}")
    # cross-check row count for sanity
    print(f"{mode}: rows={build().count()}")


if __name__ == "__main__":
    main()
