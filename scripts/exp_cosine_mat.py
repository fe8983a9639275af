#!/usr/bin/env python
"""A/B harness: materialization strategy for the cosine family's
`normalized` table (r13 optimization experiment, guide §2.4).

The sparse/dense all-pairs plans consume `normalized` 2-4x (pair-join
sides, per-vector mods); the pair join's build side is a
BroadcastExchange, which cannot reuse the probe side's shuffle — so the
lineitem scan + cell aggregation + max-normalize join runs 2x (sparse)
to 4x (dense) per query (plans/r13/cosine_{sparse,dense}_before.txt).

Variants, each timed best-of-N with the noop sink after 2 warm passes:
  base  — the committed spelling (persist=False for sparse/dense)
  pers  — fit(persist=True): lazy MEMORY_AND_DISK cache
  ckpt  — normalized.localCheckpoint() before the pair join
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.matrix.analyse import CosineAnalyser
from casf_spark.matrix.model import CosineModel
from casf_spark.session import get_spark
from casf_spark.sources.tables import matrix_from_lineitem

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, sparse: bool, mode: str):
    m = matrix_from_lineitem(spark, SF_DIR)
    an = CosineAnalyser(axis="y")
    if mode in ("base", "pers"):
        model = an.fit(m, is_sparse=sparse, persist=(mode == "pers"),
                       pre_aggregated=True)
    else:  # ckpt / ckpth
        elements = an._canonical_elements(m, pre_aggregated=True)
        normalized = an._normalized(elements).localCheckpoint()
        factor_pairs = an._factor_pairs(normalized)
        factor_mod = (an._factor_mod_sparse(factor_pairs) if sparse
                      else an._factor_mod_dense(normalized))
        if mode == "ckpth" and not sparse:
            # a checkpointed RDD has no size stats, so the planner loses
            # the broadcast choices the parquet-backed plan made — put
            # them back explicitly on the bounded side
            factor_mod = F.broadcast(factor_mod)
        model = CosineModel(normalized=normalized,
                            factor_pairs=factor_pairs,
                            factor_mod=factor_mod, is_sparse=sparse)
    return model.all_similarity().withColumn(
        "similarity_value", F.round("similarity_value", 6))


def main_ab() -> None:
    """Interleaved same-process A/B (EXP_AB="dense:base,dense:ckpth"):
    alternating the variants inside ONE JVM controls for the sticky
    per-process JIT state that dominates fresh-JVM variance here."""
    import collections
    spark = get_spark("exp_cosine_mat_ab")
    pairs = [v.split(":") for v in os.environ["EXP_AB"].split(",")]
    rounds = int(os.environ.get("EXP_ROUNDS", "4"))
    for sp, mode in pairs:  # shared warm: every variant's plan compiled
        sparse = sp == "sparse"
        build(spark, sparse, mode).write.format("noop") \
            .mode("overwrite").save()
        spark.catalog.clearCache()
    got = collections.defaultdict(list)
    for _ in range(rounds):
        for sp, mode in pairs:
            sparse = sp == "sparse"
            spark.sparkContext.setJobDescription(f"ab:{sp}:{mode}")
            t0 = time.time()
            build(spark, sparse, mode).write.format("noop") \
                .mode("overwrite").save()
            got[f"{sp}:{mode}"].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    for k, v in got.items():
        print(f"{k}: best={min(v)} samples={v}", flush=True)


def main() -> None:
    """One (sparse, mode) combination per process when EXP_ONLY is set
    ("sparse:base" etc.) — the cosine family's generated methods are
    JIT-fragile (BASELINE.md "Residual predict bimodality"), and a JVM
    that has run many variants' plans flips into a sticky slow compiled
    state that poisons every later sample; fresh-JVM-per-variant is the
    bench's own isolation protocol."""
    spark = get_spark("exp_cosine_mat")
    runs = int(os.environ.get("EXP_RUNS", "3"))
    only = os.environ.get("EXP_ONLY", "")
    for sparse in (True, False):
        for mode in ("base", "pers", "ckpt", "ckpth"):
            if only and f"{'sparse' if sparse else 'dense'}:{mode}" != only:
                continue
            for _ in range(2):  # warm
                build(spark, sparse, mode).write.format("noop") \
                    .mode("overwrite").save()
                spark.catalog.clearCache()
            samples = []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(
                    f"exp:{'sparse' if sparse else 'dense'}:{mode}")
                t0 = time.time()
                build(spark, sparse, mode).write.format("noop") \
                    .mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
            print(f"{'sparse' if sparse else 'dense'} {mode}: "
                  f"best={min(samples)} samples={samples}", flush=True)


if __name__ == "__main__":
    main_ab() if os.environ.get("EXP_AB") else main()
