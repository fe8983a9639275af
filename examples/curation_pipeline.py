#!/usr/bin/env python
"""End-to-end training-data curation over the documents corpus — the
composed pipeline a 100 TB pretraining-data job runs, at test scale:

1. funnel report: survivor counts per filter stage in one pass
   (operators.curation.curation_funnel);
2. quality + language filter, exact dedup, split labels — ONE declarative
   plan (operators.pipeline.curate_documents);
3. near-duplicate clustering: MinHash banding candidates -> connected
   components -> keep one representative per cluster;
4. domain-mixture resampling toward target source shares
   (operators.curation.mixture_resample);
5. token-budget sequence packing (operators.curation.pack_sequences);
6. write the curated corpus partitioned by split (parquet).

Run: python examples/curation_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.operators import curation as CU
from casf_spark.operators import dedup as DD
from casf_spark.operators.pipeline import curate_documents
from casf_spark.session import get_spark
from casf_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curated_corpus_")
    spark = get_spark("curation_pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    funnel = CU.curation_funnel(docs, [
        ("min_chars", F.col("n_chars") >= 60),
        ("latin_script", F.col("lang") != "zh"),
    ])
    print("funnel:", [(r["stage"], r["n_pass"]) for r in funnel.collect()])

    curated = curate_documents(docs).persist()
    n1 = curated.count()
    print(f"quality/lang/exact-dedup: {n0} -> {n1} docs")

    pairs = DD.minhash_lsh_pairs(docs, "doc_id", "text",
                                 n=2, num_hashes=12, bands=4)
    clusters = DD.connected_components(pairs)
    final = (curated.join(
        clusters.where(F.col("doc_id") != F.col("cluster_id")),
        "doc_id", "left_anti"))
    n2 = final.count()
    print(f"near-dup clustering removed {n1 - n2} more -> {n2} docs")

    mixed = CU.mixture_resample(
        final.join(docs.select("doc_id", "source", "text"), "doc_id"),
        F.col("doc_id").cast("string"), "source",
        {f"src{i}": 1 / 20 for i in range(20)}, total_rows=max(1, n2 // 2))
    n3 = mixed.count()
    print(f"mixture resample toward uniform sources -> {n3} docs")

    packed = CU.pack_sequences(
        mixed.select("doc_id", F.col("n_tokens")), "doc_id", "n_tokens",
        budget=512)
    n_bins = packed.select("bin").distinct().count()
    print(f"packed into {n_bins} 512-token bins")

    out = mixed.select("doc_id", "n_tokens", "pred_lang", "split", "text")
    out.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    print(f"wrote {back.count()} docs to {out_dir} "
          f"(splits: {sorted(r.split for r in back.select('split').distinct().collect())})")
    spark.stop()


if __name__ == "__main__":
    main()
