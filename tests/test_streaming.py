"""Structured Streaming tests: the real readStream path must produce exactly
the batch result (SURVEY.md §7.5 streaming slice)."""

from __future__ import annotations

import pytest

from pyspark_kmeans_spark.sources.tables import load_table
from pyspark_kmeans_spark.streaming.events import (
    hourly_rollup,
    read_events_stream,
    user_sessions,
)


def _run_stream_to_memory(df, name: str, spark):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, key_cols):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("agg", ["hourly", "sessions"])
def test_stream_equals_batch(spark, sf_dir, agg):
    fn = hourly_rollup if agg == "hourly" else user_sessions
    batch = fn(load_table(spark, sf_dir, "events"))
    stream_df = fn(read_events_stream(spark, sf_dir))
    streamed = _run_stream_to_memory(stream_df, f"stream_{agg}", spark)
    assert _rows(streamed, None) == _rows(batch, None)
    assert streamed.count() > 0
