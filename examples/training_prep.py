#!/usr/bin/env python
"""Training-data PREP — the stage after curation: turn a curated corpus
into the sharded, packed, reproducibly-shuffled artifact a trainer
consumes. Composes the round-4 operators end to end at test scale:

1. curate: quality + language filter, exact dedup, split labels in one
   declarative plan (operators.pipeline.curate_documents);
2. chunk: overlapping token windows, shuffle-free array HOFs
   (the q_text_chunks shape — no per-token explode);
3. pack: greedy first-fit of chunks into token-budget bins
   (operators.curation.pack_greedy_chunks, applyInPandas per id-chunk);
4. shard: seeded md5 -> (shard, in-shard position) — reproducible
   shuffled order with NO global sort (the q_train_shards shape);
5. write: one parquet tree partitioned by (split, shard), with write
   metrics observed in the same job (operators.profile
   .materialize_with_metrics — no second scan of the output).

Run: python examples/training_prep.py [sf_dir] [out_dir] [chunker]

``chunker`` is ``stride`` (default: overlapping fixed windows) or
``cdc`` (content-defined boundaries, operators.curation
.content_defined_chunks — edits upstream don't shift later chunks, so
re-prepping a revised corpus re-uses cached/deduped chunks).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window

from casf_spark.functions import text as TX
from casf_spark.operators import curation as CU
from casf_spark.operators.pipeline import curate_documents
from casf_spark.session import get_spark
from casf_spark.sources.tables import load_table

CHUNK, STRIDE, BUDGET, SHARDS = 32, 24, 512, 4


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="training_prep_")
    chunker = sys.argv[3] if len(sys.argv) > 3 else "stride"
    spark = get_spark("training_prep")
    docs = load_table(spark, sf_dir, "documents")

    # 1. curate (filters + exact dedup + split labels, one plan);
    # curate_documents emits (doc_id, n_tokens, pred_lang, split) — join
    # the surviving ids back for the text payload
    curated = (curate_documents(docs).select("doc_id", "split")
               .join(docs.select(F.col("doc_id").cast("long")
                                 .alias("doc_id"), "text"), "doc_id"))

    # 2. chunk: map-only either way — fixed-stride overlapping windows,
    # or content-defined boundaries (chunker == "cdc")
    if chunker == "cdc":
        chunks = (CU.content_defined_chunks(
                      curated, "doc_id", "text", divisor=STRIDE)
                  .join(curated.select(F.col("doc_id").cast("long")
                                       .alias("doc_id"), "split"),
                        "doc_id"))
        return _pack_shard_write(spark, chunks, out_dir)
    toks = TX.tokens("text")
    n = F.size(toks)
    n_chunks = F.ceil((n - F.lit(CHUNK - STRIDE)) / F.lit(STRIDE)).cast("int")
    windows = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.slice(toks, i * STRIDE + 1, CHUNK).alias("ctoks")))
    ).otherwise(F.array().cast(
        "array<struct<chunk_id:int,ctoks:array<string>>>"))
    chunks = (curated.select(F.col("doc_id").cast("long").alias("doc_id"),
                             "split", F.explode(windows).alias("c"))
              .select("doc_id", "split",
                      F.col("c.chunk_id").cast("long").alias("chunk_id"),
                      F.size("c.ctoks").cast("long").alias("n_tokens"),
                      F.array_join("c.ctoks", " ").alias("chunk_text")))

    return _pack_shard_write(spark, chunks, out_dir)


def _pack_shard_write(spark, chunks, out_dir) -> None:
    # 3. pack chunks into token-budget bins (keyed by a dense chunk id)
    keyed = chunks.withColumn("cid", F.col("doc_id") * 1000
                              + F.col("chunk_id"))
    packed = CU.pack_greedy_chunks(
        keyed.select("cid", "n_tokens"), "cid", "n_tokens",
        budget=BUDGET, chunk=64)
    chunks = (keyed.join(packed.select(F.col("doc").alias("cid"),
                                       F.col("bin").alias("bin_id")), "cid")
              .drop("cid"))

    # 4. reproducible shard + position (seeded, no global sort)
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#"),
                       F.col("chunk_id").cast("string"), F.lit("#epoch0")))
    chunks = chunks.withColumn("h", h).withColumn(
        "shard", F.conv(F.substring("h", 1, 8), 16, 10).cast("long")
        % SHARDS)
    w = Window.partitionBy("split", "shard").orderBy("h", "doc_id",
                                                     "chunk_id")
    final = (chunks.withColumn("pos", F.row_number().over(w))
             .drop("h"))

    # 5. one observed write, partitioned by (split, shard)
    from casf_spark.operators.profile import materialize_with_metrics

    got = materialize_with_metrics(
        final.repartition("split", "shard"),
        {"n_chunks": F.count(F.lit(1)),
         "n_tokens": F.sum("n_tokens"),
         # DISTINCT aggregates are not allowed in observed metrics —
         # approx_count_distinct is the observable form
         "n_bins": F.approx_count_distinct("bin_id")},
        path=None)  # noop materialization for the demo; pass out_dir to keep
    print(f"curated chunks: {got['n_chunks']}, tokens: {got['n_tokens']}, "
          f"bins: {got['n_bins']}, out_dir (unused for noop): {out_dir}")


if __name__ == "__main__":
    main()
