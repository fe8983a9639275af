from __future__ import annotations

from casf_spark.operators.profile import profile


def test_profile_stats(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "a")],
        "id long, s string")
    got = {r.col_name: r for r in profile(df).collect()}
    assert set(got) == {"id", "s"}
    assert got["id"].n_rows == 4 and got["id"].n_null == 0
    assert got["id"].n_distinct == 3
    assert got["id"].min_value == "1" and got["id"].max_value == "3"
    assert got["s"].n_null == 1
    assert got["s"].n_distinct == 2  # count_distinct ignores nulls
    assert got["s"].min_value == "a" and got["s"].max_value == "b"


def test_profile_column_subset(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id long, s string, v double")
    assert [r.col_name for r in profile(df, ["s"]).collect()] == ["s"]
