"""One-off profiling: cosine_topk variants at sf0.1."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as E
from casf_spark.session import get_spark
from casf_spark.matrix.analyse import CosineAnalyser

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile_topk")
spark.read.parquet(f"{SF}/lineitem.parquet").groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()


def run(label, fn):
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.time()-t0:.2f}s")


def baseline():
    return E.q_cosine_topk(spark, SF)


def cached():
    m = E.matrix_from_lineitem(spark, SF)
    model = CosineAnalyser(axis="y").fit(m, is_sparse=False, persist=True,
                                         pre_aggregated=True)
    sims = model.all_similarity().persist()
    sims.count()
    sims_r = sims.withColumn("similarity_value", F.round("similarity_value", 6))
    sym = sims_r.select(F.col("vector0").alias("vector"),
                        F.col("vector1").alias("neighbor"),
                        "similarity_value").unionByName(
        sims_r.select(F.col("vector1").alias("vector"),
                      F.col("vector0").alias("neighbor"),
                      "similarity_value"))
    w = Window.partitionBy("vector").orderBy(F.desc("similarity_value"), F.asc("neighbor"))
    return (sym.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5))


run("topk baseline", baseline)
run("topk cached sims", cached)
run("topk baseline again", baseline)
run("topk cached again", cached)
