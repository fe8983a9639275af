"""Instrumented CC loop: per-round wall time + round count at sf0.1."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as E
from casf_spark.session import get_spark
from casf_spark.operators import dedup as DD

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile_cc_rounds")

docs = E.load_table(spark, SF, "documents")


def timed_cc(pairs, probe_every=2, max_iter=25):
    t0 = time.time()
    e = pairs.select(F.col("doc0").cast("long").alias("src"),
                     F.col("doc1").cast("long").alias("dst"))
    edges = (e.union(e.select(F.col("dst").alias("src"),
                              F.col("src").alias("dst")))
             .distinct().persist())
    labels = (edges.groupBy("src")
              .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
              .select(F.col("src").alias("node"), "label")
              .localCheckpoint())
    print(f"  init: {time.time()-t0:.2f}s  nodes={labels.count()}")
    for it in range(max_iter):
        t1 = time.time()
        nbr = (
            edges.join(labels.select(F.col("node").alias("dst"),
                                     F.col("label").alias("nl")), "dst")
            .groupBy("src").agg(F.min("nl").alias("nbr_label"))
        )
        prop = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select("node",
                    F.least(F.col("label"),
                            F.coalesce("nbr_label", "label")).alias("label"))
        )
        hop = prop.select(F.col("node").alias("pnode"),
                          F.col("label").alias("plabel"))
        jumped = (
            prop.join(hop, prop["label"] == hop["pnode"], "left")
            .select("node",
                    F.least(F.col("label"),
                            F.coalesce("plabel", "label")).alias("label"))
            .localCheckpoint()
        )
        t2 = time.time()
        probed = it % probe_every == probe_every - 1 or it == max_iter - 1
        changed = -1
        if probed:
            changed = (
                jumped.join(labels.withColumnRenamed("label", "old"), "node")
                .where(F.col("label") != F.col("old")).limit(1).count()
            )
        t3 = time.time()
        print(f"  round {it}: work={t2-t1:.2f}s probe={t3-t2:.2f}s"
              f" changed={changed}")
        labels = jumped
        if probed and changed == 0:
            break
    edges.unpersist()
    print(f"  total: {time.time()-t0:.2f}s")


print("pairs:")
timed_cc(DD.minhash_lsh_pairs(docs, "doc_id", "text", n=2, num_hashes=12,
                              bands=4))
print("star:")
timed_cc(DD.minhash_lsh_star_edges(docs, "doc_id", "text", n=2,
                                   num_hashes=12, bands=4))
