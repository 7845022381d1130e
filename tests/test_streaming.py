"""Structured Streaming tests: the real readStream path must produce exactly
the batch result (SURVEY.md §7.5 streaming slice)."""

from __future__ import annotations

import pytest

from pyspark_kmeans_spark.sources.tables import load_table
from pyspark_kmeans_spark.streaming.events import (
    hourly_rollup,
    read_events_stream,
    sliding_rollup,
    user_sessions,
)


def _run_stream_to_memory(df, name: str, spark, output_mode: str = "complete"):
    # Stream-stream joins only support append mode; aggregations without a
    # watermark require complete.
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, key_cols):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("agg", ["hourly", "sessions", "sliding"])
def test_stream_equals_batch(spark, sf_dir, agg):
    fn = {
        "hourly": hourly_rollup,
        "sessions": user_sessions,
        "sliding": sliding_rollup,
    }[agg]
    batch = fn(load_table(spark, sf_dir, "events"))
    stream_df = fn(read_events_stream(spark, sf_dir))
    streamed = _run_stream_to_memory(stream_df, f"stream_{agg}", spark)
    assert _rows(streamed, None) == _rows(batch, None)
    assert streamed.count() > 0


def test_streaming_dedup_equals_batch_distinct(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark over a duplicated file feed must yield
    exactly one row per event_id (stream == batch distinct)."""
    import os

    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.streaming.events import dedup_events_stream

    ev = load_table(spark, sf_dir, "events")
    # Simulate at-least-once delivery: the full feed plus a re-delivery
    # file, as two separate parquet files the file source picks up in
    # separate micro-batches.
    feed_dir = str(tmp_path / "feed")
    raw = ev.withColumn("ts_us", F.unix_micros("ts")).drop("ts")
    raw.coalesce(1).write.parquet(feed_dir)
    raw.filter(F.col("event_id") % 10 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(feed_dir)

    schema = (
        "event_id long, user_id long, event_type string, "
        "value double, props string, ts_us long"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us")
    )
    deduped = dedup_events_stream(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(str(tmp_path), "ckpt")
        )
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("stream_dedup")
    n_ids = ev.select("event_id").distinct().count()
    assert out.count() == n_ids
    assert out.select("event_id").distinct().count() == n_ids


def test_stream_static_segment_rollup_equals_batch(spark, sf_dir):
    """Stream–static broadcast enrichment: the streaming form (file-source
    events joined to the static customer dimension per micro-batch) must
    equal the batch form exactly."""
    from pyspark_kmeans_spark.streaming.events import (
        segment_rollup,
        streaming_segment_rollup,
    )

    batch = segment_rollup(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )
    streamed = _run_stream_to_memory(
        streaming_segment_rollup(spark, sf_dir), "stream_segment", spark
    )
    assert _rows(streamed, None) == _rows(batch, None)
    assert streamed.count() > 0


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Real stream-stream inner join: two watermarked streams over the
    events source joined within a 1-hour horizon must emit exactly the
    batch interval-join pairs."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.streaming.events import (
        streaming_view_click_join,
        view_click_join,
    )

    ev = load_table(spark, sf_dir, "events")
    batch = view_click_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
    )
    streamed = _run_stream_to_memory(
        streaming_view_click_join(spark, sf_dir),
        "stream_vc",
        spark,
        output_mode="append",
    )
    assert _rows(streamed, None) == _rows(batch, None)
    assert streamed.count() > 0


def test_streaming_sliding_rollup_equals_batch(spark, sf_dir):
    from pyspark_kmeans_spark.streaming.events import streaming_sliding_rollup

    batch = sliding_rollup(load_table(spark, sf_dir, "events"))
    streamed = _run_stream_to_memory(
        streaming_sliding_rollup(spark, sf_dir), "stream_sliding_wm", spark
    )
    assert _rows(streamed, None) == _rows(batch, None)
    assert streamed.count() > 0


def test_streaming_anomaly_rollup_equals_batch(spark, sf_dir):
    """Streaming anomaly scoring (watermarked windowed counts joined to
    the static batch-built baseline) must flag exactly what the batch
    form flags."""
    from pyspark_kmeans_spark.operators.analytics import hourly_type_stats
    from pyspark_kmeans_spark.streaming.events import (
        anomaly_rollup,
        streaming_anomaly_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    batch = anomaly_rollup(ev, hourly_type_stats(ev))
    streamed = _run_stream_to_memory(
        streaming_anomaly_rollup(spark, sf_dir), "stream_anomaly", spark
    )
    assert _rows(streamed, None) == _rows(batch, None)
    assert streamed.count() > 0
