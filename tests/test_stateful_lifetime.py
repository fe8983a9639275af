"""user_lifetime_stats: keyed state survives across micro-batches under
either stateful API (transformWithStateInPandas when its protobuf
runtime exists, applyInPandasWithState otherwise)."""

from __future__ import annotations

import glob
import os


def _landing(spark, tmp_path, batches, schema):
    land = tmp_path / "land"
    land.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(str(tmp_path / f"s{i}"))
        src = glob.glob(str(tmp_path / f"s{i}" / "*.parquet"))[0]
        os.symlink(src, str(land / f"f{i}.parquet"))
    return str(land)


def test_lifetime_stats_accumulate_across_batches(spark, tmp_path):
    from casf_spark.streaming.stateful import user_lifetime_stats

    schema = "user_id long, value double"
    land = _landing(spark, tmp_path,
                    [[(1, 1.0), (1, 2.0), (2, 5.0)], [(1, 4.0), (3, 7.0)]],
                    schema)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(land))
    out = user_lifetime_stats(stream)
    q = (out.writeStream.format("memory").queryName("t_lifetime")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.user_id, r.n_events): (r.total_value, r.max_value)
            for r in spark.sql("SELECT * FROM t_lifetime").collect()}
    # user 1: batch1 state (2 events, 3.0) then batch2 lifetime (3, 7.0)
    assert rows[(1, 2)] == (3.0, 2.0)
    assert rows[(1, 3)] == (7.0, 4.0)
    assert rows[(2, 1)] == (5.0, 5.0)
    assert rows[(3, 1)] == (7.0, 7.0)


def test_lifetime_stats_batch_of_one_key_shapes(spark, tmp_path):
    """Explicit api='apply' path is well-formed on a single batch."""
    from casf_spark.streaming.stateful import user_lifetime_stats

    schema = "user_id long, value double"
    land = _landing(spark, tmp_path, [[(9, 2.5), (9, 3.5)]], schema)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(land))
    out = user_lifetime_stats(stream, api="apply")
    q = (out.writeStream.format("memory").queryName("t_lifetime1")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    r = spark.sql("SELECT * FROM t_lifetime1").collect()[0]
    assert (r.user_id, r.n_events, r.total_value, r.max_value) \
        == (9, 2, 6.0, 3.5)
