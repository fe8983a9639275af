#!/usr/bin/env python
"""End-to-end training-data curation over the documents corpus — the
composed pipeline a 100 TB pretraining-data job runs, at test scale:

1. funnel report: survivor counts per filter stage in one pass
   (operators.curation.curation_funnel), plus the Gopher rule report
   (functions.text.gopher_quality);
2. quality + language filter, exact dedup, split labels — ONE declarative
   plan (operators.pipeline.curate_documents);
3. near-duplicate clustering: MinHash banding candidates -> connected
   components -> keep the BEST-quality representative per cluster
   (operators.dedup.keep_cluster_representative);
4. cross-document substring cleanup: duplicated 4-gram spans removed
   everywhere but their first occurrence
   (operators.dedup.remove_duplicated_spans);
5. DSIR importance selection toward a target domain
   (operators.sampling.dsir_logweights — keep docs more
   target-like than raw-like);
6. domain-mixture resampling toward target source shares
   (operators.curation.mixture_resample);
7. token-budget sequence packing (operators.curation.pack_sequences);
8. vocabulary id mapping (operators.curation.build_vocab +
   tokenize_to_ids) and write, partitioned by split (parquet).

Run: python examples/curation_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from casf_spark.functions import text as TX
from casf_spark.operators import curation as CU
from casf_spark.operators import dedup as DD
from casf_spark.operators import sampling as SP
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
    gopher = TX.gopher_quality(docs, "doc_id", "text")
    grep = gopher.agg(
        F.sum(F.col("passes_gopher").cast("int")).alias("n_pass"),
        F.sum((F.col("n_required_stopwords") >= 2).cast("int"))
        .alias("n_stop")).first()
    print(f"gopher rules: {grep.n_pass}/{n0} docs pass "
          f"({grep.n_stop} meet the required-stopword rule — the synthetic "
          f"corpus speaks generated vocabulary, so this rule dominates; "
          f"on natural text it is the rarest filter)")

    curated = curate_documents(docs).persist()
    n1 = curated.count()
    print(f"quality/lang/exact-dedup: {n0} -> {n1} docs")

    pairs = DD.minhash_lsh_pairs(docs, "doc_id", "text",
                                 n=2, num_hashes=12, bands=4)
    clusters = DD.connected_components(pairs)
    qual = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.size(TX.tokens("text")).cast("long")
                       .alias("n_toks"))
    reps = DD.keep_cluster_representative(clusters, qual, "n_toks")
    final = curated.join(reps.where(~F.col("keep")), "doc_id", "left_anti")
    n2 = final.count()
    print(f"near-dup clustering (keep best per cluster) removed "
          f"{n1 - n2} more -> {n2} docs")

    cleaned = DD.remove_duplicated_spans(
        final.join(docs.select("doc_id", "text"), "doc_id"),
        "doc_id", "text", n=4)
    n_span_tokens = cleaned.agg(F.sum("n_removed")).first()[0] or 0
    print(f"substring cleanup removed {n_span_tokens} duplicated-span "
          f"tokens across {n2} docs")

    dsir = SP.dsir_logweights(docs, "doc_id", "text",
                              F.col("source") == "src0", n_buckets=256)
    keep_ids = dsir.where((F.col("log_weight") > 0) | F.col("is_target"))
    selected = final.join(keep_ids.select("doc_id"), "doc_id", "left_semi")
    n_sel = selected.count()
    print(f"DSIR selection toward src0 -> {n_sel} docs")

    mixed = CU.mixture_resample(
        selected.join(docs.select("doc_id", "source", "text"), "doc_id"),
        F.col("doc_id").cast("string"), "source",
        {f"src{i}": 1 / 20 for i in range(20)},
        total_rows=max(1, n_sel // 2))
    n3 = mixed.count()
    print(f"mixture resample toward uniform sources -> {n3} docs")

    packed = CU.pack_sequences(
        mixed.select("doc_id", F.col("n_tokens")), "doc_id", "n_tokens",
        budget=512)
    n_bins = packed.select("bin").distinct().count()
    print(f"packed into {n_bins} 512-token bins")

    vocab = CU.build_vocab(mixed, "text", 2048)
    ids = CU.tokenize_to_ids(mixed, "doc_id", "text", vocab)
    oov = ids.agg(F.round(F.avg("oov_frac"), 4)).first()[0]
    print(f"tokenized to ids over a 2048-token vocab (mean OOV {oov})")

    out = (mixed.select("doc_id", "n_tokens", "pred_lang", "split", "text")
           .join(ids.select("doc_id", "ids"), "doc_id", "left"))
    out.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    print(f"wrote {back.count()} docs to {out_dir} "
          f"(splits: {sorted(r.split for r in back.select('split').distinct().collect())})")
    spark.stop()


if __name__ == "__main__":
    main()
