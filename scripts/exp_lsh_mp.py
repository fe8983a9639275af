#!/usr/bin/env python
"""A/B: lsh_candidates_multiprobe current vs restructured (one signature
pass over all seeds, keys-only bucket joins, vectors attached once at
candidate grain). Run each in its own process:

    python scripts/exp_lsh_mp.py base | new
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.session import get_spark
from casf_spark.operators import similarity as SIM
from casf_spark.functions import vectors as V

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_PLANE_MOD = SIM._PLANE_MOD
_PLANE_SHIFT = SIM._PLANE_SHIFT


def bucket_expr(vec_col, num_planes, seed, dims):
    def comp(p, d):
        h = int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:15], 16)
        return h % _PLANE_MOD - _PLANE_SHIFT

    v = V.as_double(vec_col)

    def plane_dot(p):
        plane = F.array(*[F.lit(float(comp(p, d))) for d in range(dims)])
        return F.aggregate(F.zip_with(v, plane, lambda x, w: x * w),
                           F.lit(0.0), lambda acc, x: acc + x)

    bucket = None
    for p in range(num_planes):
        bit = F.when(plane_dot(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def mp_new(df, id_col="vec_id", vec_col="embedding", num_planes=8,
           seeds=(42, 43, 44), dims=64):
    base = df.select(F.col(id_col).cast("long").alias("id"),
                     F.col(vec_col).alias("v"))
    sig = base.select(
        "id", *[bucket_expr("v", num_planes, s, dims).alias(f"b{i}")
                for i, s in enumerate(seeds)])
    sig = sig.localCheckpoint()
    pairs = None
    for i in range(len(seeds)):
        a = sig.select(F.col("id").alias("id0"), F.col(f"b{i}").alias("bk"))
        b = sig.select(F.col("id").alias("id1"), F.col(f"b{i}").alias("bk"))
        p = (a.join(b, "bk").where(F.col("id0") > F.col("id1"))
             .select("id0", "id1"))
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.distinct()
    v0 = base.select(F.col("id").alias("id0"), F.col("v").alias("v0"))
    v1 = base.select(F.col("id").alias("id1"), F.col("v").alias("v1"))
    return (pairs.join(v0, "id0").join(v1, "id1")
            .select("id0", "id1",
                    F.round(V.cosine(F.col("v0"), F.col("v1")), 6)
                    .alias("cos_sim")))


def main() -> None:
    mode = sys.argv[1]
    spark = get_spark("exp_lsh_mp")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    def build():
        if mode == "base":
            return SIM.lsh_candidates_multiprobe(
                emb, num_planes=8, seeds=(42, 43, 44), dims=64)
        return mp_new(emb)

    for _ in range(3):
        build().write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(3):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"{mode}: best={min(samples)} samples={samples}")
    df = build()
    import hashlib as hl
    rows = sorted(map(tuple, df.collect()))
    dig = hl.md5(str(rows).encode()).hexdigest()
    print(f"{mode}: rows={len(rows)} digest={dig}")


if __name__ == "__main__":
    main()
