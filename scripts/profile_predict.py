"""One-off profiling: cosine_predict variants at sf0.1."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as E
from casf_spark.session import get_spark
from casf_spark.matrix.analyse import CosineAnalyser

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile_predict")

# warmup
spark.read.parquet(f"{SF}/lineitem.parquet").groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()


def run(label, fn):
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.time()-t0:.2f}s")


def baseline():
    return E.q_cosine_predict(spark, SF)


def with_persist():
    m = E.matrix_from_lineitem(spark, SF)
    model = CosineAnalyser(axis="y").fit(m, is_sparse=False, persist=True,
                                         pre_aggregated=True)
    out = (model.predict_missing(k=3, round_to=6)
           .withColumn("predicted_value", F.round("predicted_value", 6)))
    return out


def with_sims_persist():
    m = E.matrix_from_lineitem(spark, SF)
    model = CosineAnalyser(axis="y").fit(m, is_sparse=False, persist=True,
                                         pre_aggregated=True)
    sims = model.all_similarity().persist()
    sims.count()
    # inline top_k on persisted sims
    from pyspark.sql import Window
    sims_r = sims.withColumn("similarity_value", F.round("similarity_value", 6))
    sym = sims_r.select(F.col("vector0").alias("vector"),
                        F.col("vector1").alias("neighbor"),
                        "similarity_value").unionByName(
        sims_r.select(F.col("vector1").alias("vector"),
                      F.col("vector0").alias("neighbor"),
                      "similarity_value"))
    w = Window.partitionBy("vector").orderBy(F.desc("similarity_value"), F.asc("neighbor"))
    neighbors = (sym.withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= 3)
                 .where(F.col("similarity_value") > 0.0))
    contrib = (neighbors.join(
        model.normalized.select(F.col("vector").alias("neighbor"), "coord", "normalized_value"),
        "neighbor")
        .groupBy("vector", "coord")
        .agg((F.sum(F.col("similarity_value") * F.col("normalized_value"))
              / F.sum("similarity_value")).alias("predicted_value")))
    out = (contrib.join(model.normalized.select("vector", "coord"),
                        ["vector", "coord"], "left_anti")
           .withColumn("predicted_value", F.round("predicted_value", 6)))
    return out


run("baseline(persist=False)", baseline)
run("persist=True", with_persist)
run("persist=True + sims persisted", with_sims_persist)
run("baseline again", baseline)
