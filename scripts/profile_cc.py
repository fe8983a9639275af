"""One-off profiling: dedup_clusters variants at sf0.1.

Compares the pair-generator (full bucket cliques vs star-contracted edges)
and connected-components loop variants, verifying identical cluster output.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as E
from casf_spark.session import get_spark
from casf_spark.operators import dedup as DD

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile_cc")

docs_small = E.load_table(spark, "/root/testdata/sf0.001", "documents")
docs = E.load_table(spark, SF, "documents")


def run(label, fn, warm_docs=docs_small):
    # warm codegen on the tiny sf first
    try:
        fn(warm_docs).write.format("noop").mode("overwrite").save()
    except Exception as e:
        print(f"{label}: warm FAILED {e}")
    spark.catalog.clearCache()
    t0 = time.time()
    out = fn(docs)
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    print(f"{label}: {dt:.2f}s")
    return dt


def pairs_cc(d):
    pairs = DD.minhash_lsh_pairs(d, "doc_id", "text", n=2, num_hashes=12,
                                 bands=4)
    return DD.connected_components(pairs)


def star_cc(d):
    pairs = DD.minhash_lsh_star_edges(d, "doc_id", "text", n=2,
                                      num_hashes=12, bands=4)
    return DD.connected_components(pairs)


if __name__ == "__main__":
    run("pairs+cc (current)", pairs_cc)
    run("star+cc", star_cc)
    # equality check at sf0.1
    a = pairs_cc(docs).orderBy("doc_id").collect()
    b = star_cc(docs).orderBy("doc_id").collect()
    print("identical:", a == b, f"({len(a)} rows)")
