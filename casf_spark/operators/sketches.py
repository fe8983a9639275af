"""Mergeable-summary operators beyond the built-in sketches.

Spark ships HLL (distinct) and t-digest/GK (quantiles) but no frequent-
items path that scales: ``df.stat.freqItems`` collects to the driver and
a full ``groupBy(item)`` shuffles the ENTIRE vocabulary — at 100 TB of
text that is billions of distinct tokens moved to find the dozen that
matter. The standard scale answer is candidate pruning + exact recount
(two passes over data that stays put), implemented here.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_items(items: DataFrame, item_col: str,
                   theta: float) -> DataFrame:
    """EXACT heavy hitters: items whose global frequency is >= theta * N,
    with their exact counts — in two passes and a candidates-only
    shuffle.

    Pass 1 (candidate pruning, shuffle-free): each Arrow batch emits the
    items that are theta-heavy WITHIN the batch (vectorized
    ``value_counts``, no per-row Python). Pigeonhole guarantees the
    union is a superset of the global heavy hitters: if freq(x) >=
    theta*N, some batch must have freq_b(x) >= theta*n_b (otherwise
    summing the strict shortfalls gives freq(x) < theta*N). Light items
    — the overwhelming bulk of a Zipfian vocabulary — never leave their
    batch.

    Pass 2 (exact): occurrences of the (small, broadcast) candidate set
    are re-counted exactly and filtered by the global threshold. Only
    candidate occurrences shuffle, so shuffle volume is proportional to
    the heavy tail, not the vocabulary.

    Output: (item, cnt), exact and deterministic — unlike sketch-based
    top-k, this is oracle-checkable against a plain GROUP BY/HAVING.
    ``theta`` must be in (0, 1]; N is measured with one count() (a
    planning action, like AQE stats).
    """
    if not 0.0 < theta <= 1.0:
        raise ValueError(f"frequent_items: theta must be in (0, 1], "
                         f"got {theta}")
    src = items.select(F.col(item_col).alias("item"))

    def batch_heavy(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            vc = pdf["item"].value_counts()
            cand = vc[vc >= theta * n]
            if len(cand):
                yield pd.DataFrame({"item": cand.index})

    total = src.count()
    if total == 0:
        return src.withColumn("cnt", F.lit(0).cast("long")).limit(0)
    min_count = math.ceil(theta * total)
    cand = src.mapInPandas(batch_heavy, "item string").distinct()
    return (src.join(F.broadcast(cand), "item")
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= F.lit(min_count))
            .select(F.col("item"), F.col("cnt").cast("long").alias("cnt")))


def grouped_frequent_items(items: DataFrame, group_col: str,
                           item_col: str, theta: float) -> DataFrame:
    """Per-group exact heavy hitters: for each group, the items whose
    within-group frequency is >= theta * N_group — the mixture-audit
    shape ("which tokens dominate each language/source slice") at the
    same cost profile as :func:`frequent_items`.

    Pass 1 prunes per (batch x group): an item theta-heavy in a group
    globally must be theta-heavy in that group's slice of at least one
    batch (the pigeonhole argument applied within the group), so the
    per-batch groupby('group').value_counts() survivors are a superset.
    Pass 2 joins candidates back on (group, item) — a broadcast when the
    candidate set is small, which it is for any Zipfian corpus — and
    recounts exactly against each group's own total (computed in the
    same aggregation pass, no separate count per group).
    """
    if not 0.0 < theta <= 1.0:
        raise ValueError(f"grouped_frequent_items: theta must be in "
                         f"(0, 1], got {theta}")
    src = items.select(F.col(group_col).alias("grp"),
                       F.col(item_col).alias("item"))

    def batch_heavy(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vc = pdf.groupby("grp")["item"].value_counts()
            gn = pdf.groupby("grp")["item"].size()
            keep = vc[vc >= theta * gn.reindex(
                vc.index.get_level_values("grp")).to_numpy()]
            if len(keep):
                out = keep.index.to_frame(index=False)
                yield out[["grp", "item"]]

    totals = src.groupBy("grp").agg(F.count(F.lit(1)).alias("grp_n"))
    cand = (src.mapInPandas(batch_heavy, "grp string, item string")
            .distinct())
    counted = (src.join(F.broadcast(cand), ["grp", "item"])
               .groupBy("grp", "item")
               .agg(F.count(F.lit(1)).alias("cnt")))
    return (counted.join(F.broadcast(totals), "grp")
            .where(F.col("cnt") >= F.ceil(F.col("grp_n") * F.lit(theta)))
            .select(F.col("grp").alias(group_col),
                    F.col("item"), F.col("cnt").cast("long").alias("cnt")))
