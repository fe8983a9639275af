from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from casf_spark.operators import skew as SK


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" carries 90% of rows; values repeat heavily
    rows = [("hot", i % 37) for i in range(1800)]
    rows += [(f"k{i % 20}", i % 11) for i in range(200)]
    return spark.createDataFrame(rows, "k string, v long")


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(20)],
        "k string, label string")
    plain = skewed.join(dim, "k").groupBy("k", "label") \
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    salted = SK.salted_join(skewed, dim, ["k"], n_salt=8) \
        .groupBy("k", "label") \
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    out = SK.salted_join(skewed, dim, ["k"], n_salt=4, how="left")
    assert out.count() == skewed.count()
    assert out.where(F.col("label").isNull()).count() == 200


def test_salted_count_distinct_exact(spark, skewed):
    truth = {r.k: r.n for r in
             skewed.groupBy("k")
             .agg(F.count_distinct("v").alias("n")).collect()}
    got = {r.k: r.n_distinct for r in
           SK.salted_count_distinct(skewed, ["k"], "v", n_salt=8).collect()}
    assert got == truth
    assert got["hot"] == 37


def test_approx_distinct_error_bound(spark, sf_dir):
    """HLL++ sketch estimate stays within its configured rsd of the exact
    count (5% rsd -> assert 3 sigma = 15%; the query emits the bound
    check as its within_bound contract column)."""
    import __spark_entry__ as E
    rows = E.q_events_approx_distinct(spark, sf_dir).collect()
    assert rows, "no event types"
    for r in rows:
        assert r["exact_users"] > 0 and r["within_bound"], r


def test_sketch_rollup_merge_matches_exact(spark, sf_dir):
    """Daily HLL sketches UNION-merged per type estimate the same distinct
    users as a direct exact count (within the sketch's error bound) —
    the mergeability contract that makes pre-aggregated sketch tables
    safe to roll up."""
    import __spark_entry__ as E
    got = {r.event_type: r for r in
           E.q_events_sketch_rollup(spark, sf_dir).collect()}
    exact = {r.event_type: r.n for r in
             E.load_table(spark, sf_dir, "events")
             .groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    assert set(got) == set(exact)
    for t, n in exact.items():
        assert got[t].exact_users == n and got[t].within_bound, (t, got[t], n)
