"""applyInPandasWithState test: state must carry across micro-batches and
final totals must equal the batch aggregation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_kmeans_spark.sources.tables import load_table
from pyspark_kmeans_spark.streaming.stateful import running_user_totals


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    """Split events into 2 files so maxFilesPerTrigger=1 yields 2 batches
    (state must survive the batch boundary)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, sf_dir, "events")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{d}/part_a")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{d}/part_b")
    flat = str(tmp_path_factory.mktemp("events_flat"))
    i = 0
    for sub in ("part_a", "part_b"):
        for f in os.listdir(f"{d}/{sub}"):
            if f.endswith(".parquet"):
                os.rename(f"{d}/{sub}/{f}", f"{flat}/batch_{i}.parquet")
                i += 1
    assert i == 2
    return flat


def test_state_carries_across_batches(spark, sf_dir, split_events_dir):
    schema = load_table(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_events_dir)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.lastProgress is not None

    # Update-mode memory sink appends each emission; the LAST emission per
    # user is the lifetime total.
    emitted = spark.table("user_totals").collect()
    finals = {}
    for r in emitted:  # memory sink preserves batch order
        finals[r.user_id] = (r.n_events, r.sum_value)

    batch = {
        r.user_id: (r.n, r.s)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(finals) == set(batch)
    for u, (n, s) in batch.items():
        fn, fs = finals[u]
        assert fn == n, f"user {u}: {fn} != {n}"
        assert abs(fs - s) < 1e-6
    # at least one user saw two emissions (proof state crossed batches)
    assert len(emitted) > len(finals)
