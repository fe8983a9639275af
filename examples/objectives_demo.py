#!/usr/bin/env python
"""Pretraining-OBJECTIVE example building — the last mile between a
curated corpus and a trainer's data loader, for all three objective
families, plus the word2vec legacy pair (round-11 operators):

1. causal LM: concat-and-chunk windows crossing doc boundaries with
   attention-reset offsets (operators.curation.lm_causal_windows);
2. denoising (T5): hash-seeded span corruption -> (input with
   <extra_id_K> sentinels, target) pairs
   (operators.curation.t5_span_corruption);
3. infilling (FIM): prefix/suffix/middle PSM re-serialization
   (operators.curation.fim_examples);
4. word2vec: skip-gram co-occurrence pairs + unigram^0.75 negative
   draws (operators.relevance.skipgram_cooc / negative_sampling_table /
   negative_draws).

Every builder is hash-seeded — the same corpus yields byte-identical
examples on every run, engine, and partitioning, which is what makes
training-data builds reproducible and resumable.

Run: python examples/objectives_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.operators import curation as CU
from casf_spark.operators import relevance as RV
from casf_spark.session import get_spark
from casf_spark.sources.tables import load_table


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("objectives_demo")
    docs = load_table(spark, sf, "documents")

    print("== causal LM windows (ctx=64, doc-boundary offsets) ==")
    lm = CU.lm_causal_windows(docs, "doc_id", "text", ctx=64)
    lm.orderBy("window_id").select("window_id", "n_tokens", "n_docs",
                                   "doc_starts_str").show(5)
    n_win = lm.count()
    print(f"{n_win} windows; every token exactly once\n")

    print("== T5 span corruption (~15% mask) ==")
    t5 = CU.t5_span_corruption(docs, "doc_id", "text")
    t5.select("doc", "n_spans",
              F.substring("input_text", 1, 60).alias("input_head"),
              F.substring("target_text", 1, 40).alias("target_head")) \
        .orderBy("doc").show(3, truncate=False)

    print("== FIM (PSM order) ==")
    fim = CU.fim_examples(docs, "doc_id", "text")
    fim.select("doc", "p1", "p2",
               F.substring("fim_text", 1, 70).alias("fim_head")) \
        .orderBy("doc").show(3, truncate=False)

    print("== word2vec: skip-gram pairs + negative draws ==")
    pairs = RV.skipgram_cooc(docs, "doc_id", "text", window=2,
                             min_count=5)
    pairs.orderBy(F.desc("cnt"), "center", "context").show(5)
    table = RV.negative_sampling_table(docs, "doc_id", "text",
                                       vocab_size=64)
    keys = docs.select("doc_id").limit(5)
    RV.negative_draws(table, keys, "doc_id", k=3) \
        .orderBy("key_val", "j").show(15)

    spark.stop()


if __name__ == "__main__":
    main()
