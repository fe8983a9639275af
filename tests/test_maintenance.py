"""Compaction: file-count targeting, content preservation, and the
range-clustering data-skipping contract (disjoint per-file min/max)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from casf_spark.sources.maintenance import compact_parquet


@pytest.fixture(scope="module")
def fragmented(spark, tmp_path_factory):
    """events written as 64 deliberately tiny files."""
    path = str(tmp_path_factory.mktemp("frag") / "events")
    ev = spark.range(0, 20000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 97).alias("user_id"),
        (F.col("id") * 37 % 10000).alias("val"))
    ev.repartition(64).write.parquet(path)
    return path


def _files(path):
    return [f for f in glob.glob(os.path.join(path, "*.parquet"))
            if os.path.getsize(f) > 0]


def test_compact_reduces_files_preserves_rows(spark, fragmented, tmp_path):
    out = str(tmp_path / "compact")
    got = compact_parquet(spark, fragmented, out, target_file_bytes=10**9)
    assert len(_files(out)) == 1
    assert got.count() == 20000
    before = spark.read.parquet(fragmented).agg(F.sum("val")).first()[0]
    assert got.agg(F.sum("val")).first()[0] == before


def test_compact_targets_file_count(spark, fragmented, tmp_path):
    out = str(tmp_path / "sized")
    total = sum(os.path.getsize(f) for f in _files(fragmented))
    compact_parquet(spark, fragmented, out, target_file_bytes=total // 4)
    assert 3 <= len(_files(out)) <= 6  # ceil(total/(total/4)) with rounding


def test_cluster_by_yields_disjoint_file_ranges(spark, fragmented, tmp_path):
    out = str(tmp_path / "clustered")
    compact_parquet(spark, fragmented, out, target_file_bytes=10**5,
                    cluster_by=["val"])
    ranges = []
    for f in _files(out):
        md = pq.read_metadata(f)
        lo = min(md.row_group(i).column(2).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(2).statistics.max
                 for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) > 1
    ranges.sort()
    for (_, hi0), (lo1, _) in zip(ranges, ranges[1:]):
        assert hi0 <= lo1  # disjoint: a val filter skips non-matching files


def test_zorder_bounds_every_dimension(spark, tmp_path):
    """Z-order vs lexicographic clustering on two independent uniform
    columns: lexicographic bounds only the leading column per file;
    z-order bounds BOTH (every file covers a sub-rectangle), which is
    what makes filters on the second column skip files."""
    from casf_spark.sources.maintenance import compact_parquet, zorder_parquet

    src = str(tmp_path / "src")
    ev = spark.range(0, 40000).select(
        (F.col("id") % 200).alias("a"),
        ((F.col("id") * 7919) % 200).alias("b"))
    ev.repartition(8).write.parquet(src)
    total = sum(os.path.getsize(f) for f in _files(src))
    target = total // 16

    def spans(path, colidx):
        out = []
        for f in _files(path):
            md = pq.read_metadata(f)
            lo = min(md.row_group(i).column(colidx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(colidx).statistics.max
                     for i in range(md.num_row_groups))
            out.append(hi - lo)
        return sum(out) / len(out)

    lex = str(tmp_path / "lex")
    compact_parquet(spark, src, lex, target_file_bytes=target,
                    cluster_by=["a", "b"])
    zod = str(tmp_path / "zorder")
    zorder_parquet(spark, src, zod, ["a", "b"], target_file_bytes=target)

    assert len(_files(zod)) > 4
    # leading column tight under both layouts
    assert spans(lex, 0) < 100 and spans(zod, 0) < 120
    # second column: lexicographic files span ~the full [0,200) range;
    # z-ordered files must be materially tighter
    assert spans(lex, 1) > 150
    assert spans(zod, 1) < 120
    # content preserved
    assert spark.read.parquet(zod).count() == 40000


def test_zorder_all_null_column_raises(spark, tmp_path):
    import pytest

    from casf_spark.sources.maintenance import zorder_parquet

    src = str(tmp_path / "nulls_in")
    spark.sql("SELECT id AS a, CAST(NULL AS DOUBLE) AS b FROM range(10)") \
        .write.parquet(src)
    with pytest.raises(ValueError, match="all-NULL"):
        zorder_parquet(spark, src, str(tmp_path / "out"), ["a", "b"])


def test_zorder_non_numeric_column_raises(spark, tmp_path):
    import pytest

    from casf_spark.sources.maintenance import zorder_parquet

    src = str(tmp_path / "str_in")
    spark.sql("SELECT id AS a, CAST(id AS STRING) AS s FROM range(10)") \
        .write.parquet(src)
    with pytest.raises(TypeError, match="non-numeric"):
        zorder_parquet(spark, src, str(tmp_path / "out2"), ["a", "s"])


def test_zorder_null_values_land_in_low_bucket(spark, tmp_path):
    """Rows with a NULL key must cluster at the LOW edge explicitly (the
    naive least/greatest arithmetic silently sent them to the top)."""
    from casf_spark.sources.maintenance import zorder_parquet

    src = str(tmp_path / "mixed_in")
    spark.sql("SELECT id AS a, CASE WHEN id = 3 THEN NULL ELSE id END AS b "
              "FROM range(100)").write.parquet(src)
    out = zorder_parquet(spark, src, str(tmp_path / "out3"), ["a", "b"],
                         target_file_bytes=2000)
    assert out.count() == 100
