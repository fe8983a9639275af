from __future__ import annotations

from pyspark.sql import functions as F

from casf_spark.sources import load_table
from casf_spark.streaming import events as EV


def test_stream_tumbling_equals_batch(spark, sf_dir):
    """Replay events.parquet as a stream with availableNow; the watermarked
    streaming aggregation must produce exactly the batch result."""
    batch = EV.tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")
    stream_src = EV.read_events_stream(spark, sf_dir)
    assert stream_src.isStreaming
    agg = EV.tumbling_counts(stream_src, "1 hour")
    EV.run_stream_to_memory(agg, "t_tumbling")
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_tumbling").collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    stream = EV.read_events_stream(spark, sf_dir)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    EV.write_stream_parquet(stream.select("event_id", "ts", "event_type"),
                            out, ckpt)
    back = spark.read.parquet(out)
    n_src = load_table(spark, sf_dir, "events").count()
    assert back.count() == n_src
    assert "_batch_id" in back.columns


def test_sliding_each_event_in_two_windows(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    sliding = EV.sliding_counts(ev, "1 hour", "30 minutes")
    total = sum(r.n_events for r in sliding.collect())
    assert total == 2 * n_events


def test_upsert_sink_matches_batch_twin(spark, tmp_path):
    """Update-mode tumbling counts upserted by window key must equal the
    batch aggregation over the same input — the exactly-once MERGE story."""
    from casf_spark.streaming.events import (read_events_stream,
                                             tumbling_counts,
                                             write_stream_upsert)

    sf = "/root/testdata/sf0.001"
    stream = tumbling_counts(read_events_stream(spark, sf), "1 hour")
    out = tmp_path / "upsert"
    write_stream_upsert(
        stream.withColumn("window_start",
                          F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")),
        str(out), str(tmp_path / "ckpt"),
        key_cols=["window_start", "event_type"])
    got = spark.read.parquet(str(out / "current"))
    from casf_spark.sources.tables import load_table
    want = tumbling_counts(load_table(spark, sf, "events"), "1 hour") \
        .withColumn("window_start",
                    F.date_format("window_start", "yyyy-MM-dd HH:mm:ss"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_dedup_stream_drops_cross_batch_duplicates(spark, sf_dir, tmp_path):
    """The same 200 events delivered twice in two micro-batches: the
    watermark-bounded streaming dedup must emit each event_id once."""
    src = load_table(spark, sf_dir, "events").limit(200)
    stage = tmp_path / "dup_stream"
    src.coalesce(1).write.parquet(str(stage / "a"))
    src.coalesce(1).write.parquet(str(stage / "b"))
    files = sorted(str(p) for p in stage.rglob("*.parquet")
                   if not p.name.startswith("_"))
    land = tmp_path / "landing"
    land.mkdir()
    for i, f in enumerate(files):
        (land / f"f{i}.parquet").symlink_to(f)
    stream = (spark.readStream.schema(src.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(land)))
    deduped = EV.dedup_stream(stream, ["event_id"], watermark="365 days")
    EV.run_stream_append_to_memory(deduped, "t_dedup_stream")
    out = spark.sql("SELECT event_id FROM t_dedup_stream")
    assert out.count() == 200
    assert out.distinct().count() == 200


def test_dedup_stream_batch_fallback(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(50)
    doubled = ev.unionByName(ev)
    assert EV.dedup_stream(doubled, ["event_id"]).count() == 50


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Self stream-stream join (purchases x prior clicks within 1h) with
    watermarks on both sides must equal the batch twin exactly."""
    batch = EV.clicks_before_purchases(load_table(spark, sf_dir, "events"))
    stream = EV.clicks_before_purchases(EV.read_events_stream(spark, sf_dir))
    assert stream.isStreaming
    EV.run_stream_append_to_memory(stream, "t_ss_join")
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_ss_join").collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0
