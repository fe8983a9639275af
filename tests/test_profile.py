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


def test_materialize_with_metrics_single_job(spark, tmp_path):
    """Observed aggregates computed during the write match a separate
    aggregation — without a second scan of the input."""
    from pyspark.sql import functions as F

    from casf_spark.operators.profile import materialize_with_metrics

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
        .alias("v"))
    got = materialize_with_metrics(
        df, {"n_rows": F.count(F.lit(1)),
             "n_null_v": F.sum(F.col("v").isNull().cast("long")),
             "max_id": F.max("id")},
        path=str(tmp_path / "out"))
    assert got == {"n_rows": 1000, "n_null_v": 100, "max_id": 999}
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 1000


def test_materialize_with_metrics_empty_metrics_raises(spark):
    import pytest

    from casf_spark.operators.profile import materialize_with_metrics

    with pytest.raises(ValueError, match="no metrics declared"):
        materialize_with_metrics(spark.range(3), {})


def test_materialize_with_metrics_fmt_applies_to_path(spark, tmp_path):
    """fmt is honored when a path is given (json here, not the parquet
    default) and ignored for the noop materialization."""
    from pyspark.sql import functions as F

    from casf_spark.operators.profile import materialize_with_metrics

    out = str(tmp_path / "m_json")
    got = materialize_with_metrics(
        spark.range(5), {"n": F.count(F.lit(1))}, path=out, fmt="json")
    assert got["n"] == 5
    assert spark.read.json(out).count() == 5
