from __future__ import annotations

from casf_spark.sources import load_table
from casf_spark.streaming import events as EV
from casf_spark.streaming.sessions import track_sessions


def test_stateful_sessions_match_batch(spark, sf_dir):
    """applyInPandasWithState session tracking over a single-batch replay
    must equal the batch lag-based sessionization."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    batch = (ev.withColumn(
        "new_s",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events")))
    want = {r.user_id: (r.n_sessions, r.n_events) for r in batch.collect()}

    stream = EV.read_events_stream(spark, sf_dir)
    out = track_sessions(stream, gap_sec=1800)
    q = (out.writeStream.format("memory").queryName("t_sessions")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.user_id: (r.n_sessions, r.n_events)
           for r in spark.sql("SELECT * FROM t_sessions").collect()}
    assert got == want
