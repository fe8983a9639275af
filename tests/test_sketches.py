"""frequent_items: exact two-pass heavy hitters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from casf_spark.operators.sketches import frequent_items


def test_heavy_hitters_exact_vs_naive(spark):
    """Candidate pruning must not lose any true heavy hitter (pigeonhole
    superset guarantee) and the recount is exact — differential against
    the full groupBy."""
    rows = (["hot"] * 300 + ["warm"] * 120 + ["cool"] * 50
            + [f"tail{i}" for i in range(530)])
    df = spark.createDataFrame([(x,) for x in rows], "item string") \
        .repartition(8)
    theta = 0.1  # N=1000 -> threshold 100: hot(300), warm(120) qualify
    got = {r.item: r.cnt for r in
           frequent_items(df, "item", theta).collect()}
    naive = {r.item: r.n for r in
             df.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
             .where(F.col("n") >= 100).collect()}
    assert got == naive == {"hot": 300, "warm": 120}


def test_heavy_hitters_empty_and_bad_theta(spark):
    df = spark.createDataFrame([], "item string")
    assert frequent_items(df, "item", 0.5).count() == 0
    with pytest.raises(ValueError, match="theta"):
        frequent_items(df, "item", 0.0)


def test_heavy_hitters_threshold_boundary(spark):
    """An item at EXACTLY theta*N qualifies (>= semantics, matching the
    oracle's HAVING >= CEIL)."""
    rows = ["x"] * 10 + [f"t{i}" for i in range(90)]
    df = spark.createDataFrame([(x,) for x in rows], "item string")
    got = {r.item for r in frequent_items(df, "item", 0.1).collect()}
    assert got == {"x"}


def test_grouped_heavy_hitters_matches_naive(spark):
    """Per-group pruning + recount against the per-group full groupBy."""
    from casf_spark.operators.sketches import grouped_frequent_items

    rows = ([("en", "hot")] * 60 + [("en", f"t{i}") for i in range(40)]
            + [("de", "der")] * 30 + [("de", "hot")] * 5
            + [("de", f"d{i}") for i in range(65)])
    df = spark.createDataFrame(rows, "g string, item string").repartition(6)
    got = {(r.g, r.item): r.cnt for r in
           grouped_frequent_items(df, "g", "item", 0.2).collect()}
    # en: N=100 -> >=20: hot(60). de: N=100 -> >=20: der(30); hot only 5.
    assert got == {("en", "hot"): 60, ("de", "der"): 30}
