#!/usr/bin/env python
"""Relevance-suite demo: the keyword-analytics workload the reference's
KeyWordsDemo gestures at, done with modern weighting — TF-IDF keyword
extraction, BM25 retrieval, corpus vocabulary coverage, and unigram
log-likelihood quality scoring over the documents table.

Run: python examples/relevance_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casf_spark.operators import relevance as RV
from casf_spark.session import get_spark
from casf_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("relevance_demo")
    docs = load_table(spark, sf_dir, "documents")

    print("== top-3 TF-IDF keywords (first 5 docs) ==")
    RV.tfidf_terms(docs, "doc_id", "text", top_k=3) \
        .where("doc < 5").orderBy("doc", "rank").show(15, truncate=False)

    print("== BM25 top-10 for query [spark, table, hash] ==")
    RV.bm25_rank(docs, ["spark", "table", "hash"], "doc_id", "text",
                 top_n=10).show(truncate=False)

    print("== vocabulary coverage (top 10 terms) ==")
    RV.vocab_coverage(docs, "doc_id", "text", top_n=10) \
        .orderBy("rank").show(truncate=False)

    print("== most surprising documents (unigram LM) ==")
    RV.unigram_logprob(docs, "doc_id", "text") \
        .orderBy("avg_neg_logprob", ascending=False).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
