"""CC experiments: shuffle-partition sizing + double-jump rounds at sf0.1."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as E
from casf_spark.session import get_spark
from casf_spark.operators import dedup as DD

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile_cc2")

docs = E.load_table(spark, SF, "documents")


def cc(pairs, probe_every=2, max_iter=25, jumps=1, parts=None):
    t0 = time.time()
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    e = pairs.select(F.col("doc0").cast("long").alias("src"),
                     F.col("doc1").cast("long").alias("dst"))
    edges = (e.union(e.select(F.col("dst").alias("src"),
                              F.col("src").alias("dst")))
             .distinct().persist())
    if parts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        labels = (edges.groupBy("src")
                  .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
                  .select(F.col("src").alias("node"), "label")
                  .localCheckpoint())
        rounds = 0
        for it in range(max_iter):
            rounds += 1
            nbr = (
                edges.join(labels.select(F.col("node").alias("dst"),
                                         F.col("label").alias("nl")), "dst")
                .groupBy("src").agg(F.min("nl").alias("nbr_label"))
            )
            prop = (
                labels.join(nbr, labels["node"] == nbr["src"], "left")
                .select("node",
                        F.least(F.col("label"),
                                F.coalesce("nbr_label", "label"))
                        .alias("label"))
            )
            jumped = prop
            for _ in range(jumps):
                hop = jumped.select(F.col("node").alias("pnode"),
                                    F.col("label").alias("plabel"))
                jumped = (
                    jumped.join(hop, jumped["label"] == hop["pnode"], "left")
                    .select("node",
                            F.least(F.col("label"),
                                    F.coalesce("plabel", "label"))
                            .alias("label"))
                    .localCheckpoint()
                )
            probed = it % probe_every == probe_every - 1 or it == max_iter - 1
            if probed:
                changed = (
                    jumped.join(labels.withColumnRenamed("label", "old"),
                                "node")
                    .where(F.col("label") != F.col("old")).limit(1).count()
                )
                labels = jumped
                if changed == 0:
                    break
            else:
                labels = jumped
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    edges.unpersist()
    out = labels.select(F.col("node").alias("doc_id"),
                        F.col("label").alias("cluster_id"))
    n = out.count()
    return time.time() - t0, rounds, n


star = lambda: DD.minhash_lsh_star_edges(docs, "doc_id", "text", n=2,
                                         num_hashes=12, bands=4)

for label, kw in [
    ("base j1 p32", dict()),
    ("j1 p4", dict(parts=4)),
    ("j2 p4", dict(parts=4, jumps=2)),
    ("j3 p4", dict(parts=4, jumps=3)),
    ("j2 p32", dict(jumps=2)),
    ("j1 p1", dict(parts=1)),
]:
    dt, rounds, n = cc(star(), **kw)
    print(f"{label}: {dt:.2f}s rounds={rounds} n={n}")
