"""CC loop variants: broadcast-hinted joins, bounded defaultSizeInBytes +
multi-jump. All at loop shuffle partitions sized to the graph."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as E
from casf_spark.session import get_spark
from casf_spark.operators import dedup as DD

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile_cc3")
docs = E.load_table(spark, SF, "documents")


def cc(pairs, jumps=1, bcast=False, probe_every=2, max_iter=25,
       default_size=None):
    t0 = time.time()
    e = pairs.select(F.col("doc0").cast("long").alias("src"),
                     F.col("doc1").cast("long").alias("dst"))
    edges = (e.union(e.select(F.col("dst").alias("src"),
                              F.col("src").alias("dst")))
             .distinct().persist())
    n_edges = edges.count()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    old_ds = spark.conf.get("spark.sql.defaultSizeInBytes", None)
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(max(1, min(32, -(-n_edges // 2_000_000)))))
    if default_size is not None:
        spark.conf.set("spark.sql.defaultSizeInBytes", str(default_size))
    H = F.broadcast if bcast else (lambda x: x)
    rounds = 0
    try:
        labels = (edges.groupBy("src")
                  .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
                  .select(F.col("src").alias("node"), "label")
                  .localCheckpoint())
        for it in range(max_iter):
            rounds += 1
            nbr = (
                edges.join(H(labels.select(F.col("node").alias("dst"),
                                           F.col("label").alias("nl"))),
                           "dst")
                .groupBy("src").agg(F.min("nl").alias("nbr_label"))
            )
            prop = (
                labels.join(H(nbr), labels["node"] == nbr["src"], "left")
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
                    jumped.join(H(hop), jumped["label"] == hop["pnode"],
                                "left")
                    .select("node",
                            F.least(F.col("label"),
                                    F.coalesce("plabel", "label"))
                            .alias("label"))
                    .localCheckpoint()
                )
            probed = (it % probe_every == probe_every - 1
                      or it == max_iter - 1)
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
        spark.conf.set("spark.sql.shuffle.partitions", old)
        if default_size is not None:
            if old_ds is None:
                spark.conf.unset("spark.sql.defaultSizeInBytes")
            else:
                spark.conf.set("spark.sql.defaultSizeInBytes", old_ds)
    edges.unpersist()
    cnt = labels.count()
    return time.time() - t0, rounds, cnt


star = lambda: DD.minhash_lsh_star_edges(docs, "doc_id", "text", n=2,
                                         num_hashes=12, bands=4)
# warm once
cc(star())
for label, kw in [
    ("j1 plain  ", dict()),
    ("j1 bcast  ", dict(bcast=True)),
    ("j2 ds1g   ", dict(jumps=2, default_size=1 << 30)),
    ("j3 ds1g   ", dict(jumps=3, default_size=1 << 30)),
    ("j2 bc ds1g", dict(jumps=2, bcast=True, default_size=1 << 30)),
    ("j1 bc pe3 ", dict(bcast=True, probe_every=3)),
]:
    try:
        dt, rounds, n = cc(star(), **kw)
        print(f"{label}: {dt:.2f}s rounds={rounds} n={n}")
    except Exception as ex:
        print(f"{label}: FAILED {type(ex).__name__}: {str(ex)[:100]}")
