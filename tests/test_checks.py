"""operators.checks: planted violations are counted exactly; row-level
checks fuse into one scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from casf_spark.operators import checks as CK


def _df(spark):
    rows = [
        (1, "a", 5.0, 10),
        (2, "b", -1.0, 20),     # range violation
        (3, None, 5.0, 10),     # null + set violation
        (4, "z", 2000.0, 30),   # set + range violation
        (4, "a", 5.0, None),    # duplicate id + null fk
        (5, "a", 5.0, 99),      # orphan fk
    ]
    return spark.createDataFrame(
        rows, "id long, cat string, val double, fk long")


def test_counts_exact(spark):
    df = _df(spark)
    dim = spark.createDataFrame([(10,), (20,), (30,)], "k long")
    out = CK.run_checks(df, [
        CK.not_null("cat"),
        CK.in_set("cat", ["a", "b"]),
        CK.in_range("val", 0.0, 1000.0),
        CK.expression("id_gt_4", F.col("id") > 4),
        CK.unique("id"),
        CK.foreign_key("fk", dim, "k"),
    ])
    got = {r.check_name: r.n_violations for r in out.collect()}
    assert got == {
        "not_null(cat)": 1,
        "in_set(cat)": 2,       # null counts as not-in-set
        "in_range(val)": 2,
        "id_gt_4": 1,
        "unique(id)": 2,        # both rows of the duplicated key
        "foreign_key(fk)": 1,   # null fk is NOT an orphan
    }


def test_all_green_on_clean_data(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, cat string")
    out = CK.run_checks(df, [CK.not_null("id"), CK.in_set("cat", ["a", "b"]),
                             CK.unique("id")])
    assert all(r.n_violations == 0 for r in out.collect())


def test_row_level_checks_fuse_into_one_scan(spark):
    """Four row-level checks -> exactly ONE scan of the input in the
    physical plan (the fused-aggregation contract)."""
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 5).cast("double").alias("v"))
    out = CK.run_checks(df, [
        CK.not_null("id"), CK.not_null("v"),
        CK.in_range("v", 0.0, 10.0),
        CK.expression("big", F.col("v") > 3),
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_empty_check_list_raises(spark):
    """An empty declaration must fail loudly — an empty result would read
    as 'all checks passed'."""
    import pytest

    df = spark.range(3)
    with pytest.raises(ValueError, match="no checks declared"):
        CK.run_checks(df, [])


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------

def test_snapshot_diff_labels_and_conservation(spark):
    from casf_spark.operators.cdc import snapshot_diff
    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, None, "d")],
        "k long, price double, tag string")
    new = spark.createDataFrame(
        [(1, 10.0, "a"),          # unchanged
         (2, 21.0, "b"),          # price changed
         (4, None, "e"),          # tag changed; NULL == NULL on price
         (5, 50.0, "x")],         # added; key 3 removed
        "k long, price double, tag string")
    out = {r.k: r for r in
           snapshot_diff(old, new, ["k"], ["price", "tag"]).collect()}
    assert out[1].status == "unchanged" and out[1].changed_cols == ""
    assert out[2].status == "changed" and out[2].changed_cols == "price"
    assert out[3].status == "removed" and out[3].changed_cols == ""
    assert out[4].status == "changed" and out[4].changed_cols == "tag"
    assert out[5].status == "added" and out[5].changed_cols == ""
    # conservation: every key of either side appears exactly once
    assert len(out) == 5


def test_snapshot_diff_multi_change_sorted(spark):
    from casf_spark.operators.cdc import snapshot_diff
    old = spark.createDataFrame([(1, 1.0, "a")],
                                "k long, zz double, aa string")
    new = spark.createDataFrame([(1, 2.0, "b")],
                                "k long, zz double, aa string")
    r = snapshot_diff(old, new, ["k"], ["zz", "aa"]).first()
    assert r.status == "changed"
    assert r.changed_cols == "aa,zz"  # sorted-name order, not arg order
