#!/usr/bin/env python
"""End-to-end demo reproducing the reference's KeyWordsDemo workload
(/root/reference/src/test/scala/com/saltfish/run/KeyWordsDemo.scala) with
this engine's Spark-first pipeline:

reference                                  | here
-------------------------------------------|----------------------------------
read 3 article files + stop words (KWD:19) | documents table (first 3 docs)
ansj tokenize flatMap (KWD:47-58)          | functions.text regex tokenizer
stop words collected to driver (KWD:43)    | broadcast anti-join
per-article term count + unionAll (KWD:59) | term_counts (one grouped agg)
simpleFit(word, isSparse=false) (KWD:102)  | CosineAnalyser.fit(dense)
allSimilarityValue.show() (KWD:104)        | all_similarity().show()
similarity(Array(a1, a2)).show() (KWD:105) | model.similarity([...]).show()

Run: python examples/keywords_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark import CosineAnalyser
from casf_spark.functions import text as TX
from casf_spark.session import get_spark
from casf_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("keywords_demo")

    articles = (load_table(spark, sf_dir, "documents")
                .where(F.col("doc_id") < 3)
                .select("doc_id", "text"))

    # per-article term matrices stacked with unionByName — the demo's
    # words1.unionAll(words2).unionAll(words3) (KWD:101, U1)
    per_article = [
        TX.term_counts(articles.where(F.col("doc_id") == i), "doc_id", "text")
        for i in range(3)
    ]
    term_matrix = per_article[0].unionByName(per_article[1]) \
                                .unionByName(per_article[2])
    model = CosineAnalyser(axis="y").fit(term_matrix, is_sparse=False,
                                         pre_aggregated=True)

    print("== all-pairs article similarity (dense, max-normalized) ==")
    model.all_similarity().orderBy("vector0", "vector1").show(truncate=False)

    print("== subset similarity for articles 0 and 1 ==")
    model.similarity(["0", "1"]).show(truncate=False)

    print("== top-1 neighbor per article ==")
    model.top_k(1).orderBy("vector").show(truncate=False)

    model.unpersist()


if __name__ == "__main__":
    main()
