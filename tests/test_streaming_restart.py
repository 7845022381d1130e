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


def test_idempotent_sink_survives_batch_replay(spark, sf_dir, tmp_path):
    """Replaying a batch (same batch_id — Structured Streaming's
    at-least-once contract after a crash between sink write and checkpoint
    commit) must NOT duplicate rows; the naive append sink does."""
    from pyspark_kmeans_spark.streaming.sinks import idempotent_batch_writer

    events = load_table(spark, sf_dir, "events").limit(100).cache()
    out = str(tmp_path / "sink")
    write = idempotent_batch_writer(out)
    write(events, 0)
    write(events, 0)  # replay of the SAME batch
    write(events.limit(10), 1)
    got = spark.read.parquet(out)
    assert got.count() == 110  # 100 + 10, no duplication
    assert {r.batch_id for r in got.select("batch_id").distinct().collect()} == {0, 1}

    # Control: the naive append spelling duplicates under the same replay.
    naive = str(tmp_path / "naive")
    events.write.mode("append").parquet(naive)
    events.write.mode("append").parquet(naive)
    assert spark.read.parquet(naive).count() == 200


def test_idempotent_sink_end_to_end_stream(spark, sf_dir, tmp_path):
    """availableNow stream through the idempotent sink: sink contents equal
    the batch source exactly."""
    from pyspark_kmeans_spark.streaming.sinks import idempotent_batch_writer

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    _one_file(events, src, "a", str(tmp_path))
    out = str(tmp_path / "sink")
    q = (
        spark.readStream.schema(events.schema)
        .parquet(src)
        .writeStream.foreachBatch(idempotent_batch_writer(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out).drop("batch_id")
    assert got.count() == events.count()
    assert sorted(r.event_id for r in got.select("event_id").collect()) == sorted(
        r.event_id for r in events.select("event_id").collect()
    )
