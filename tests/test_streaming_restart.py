"""Fault-tolerance: a stateful streaming query stopped and restarted from
its checkpoint must resume offsets + state — no reprocessing, no loss."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from pyspark_kmeans_spark.sources.tables import load_table
from pyspark_kmeans_spark.streaming.stateful import running_user_totals


def _one_file(df, src_dir, name, tmp):
    staging = f"{tmp}/_stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    import os

    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.makedirs(src_dir, exist_ok=True)
    shutil.copy(f"{staging}/{part}", f"{src_dir}/{name}.parquet")


def _run_until_done(spark, stream_df, checkpoint, out_dir):
    """foreachBatch parquet sink — supports checkpoint recovery (the memory
    sink does not)."""

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out_dir)


def test_restart_from_checkpoint(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").cache()
    first = events.filter(F.col("event_id") < 500)
    second = events.filter(F.col("event_id") >= 500)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = events.schema

    def stream():
        return running_user_totals(
            spark.readStream.schema(schema).parquet(src)
        )

    # Phase 1: only the first half exists.
    _one_file(first, src, "a", str(tmp_path))
    out1 = _run_until_done(spark, stream(), ckpt, str(tmp_path / "out1"))
    phase1 = {r.user_id: r.n_events for r in out1.collect()}
    expect1 = {r.user_id: r.n for r in first.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert phase1 == expect1

    # Phase 2: add the second half, NEW query instance, SAME checkpoint.
    _one_file(second, src, "b", str(tmp_path))
    out2 = _run_until_done(spark, stream(), ckpt, str(tmp_path / "out2"))
    # Phase-2 sink only contains phase-2 emissions (fresh memory table) —
    # totals must include phase-1 state, proving state restore, and only
    # users from the second file appear, proving offsets weren't replayed.
    phase2 = {r.user_id: r.n_events for r in out2.collect()}
    touched2 = {r.user_id for r in second.select("user_id").distinct().collect()}
    assert set(phase2) == touched2
    full = {
        r.user_id: r.n
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for u, n in phase2.items():
        assert n == full[u], f"user {u}: restarted total {n} != lifetime {full[u]}"
