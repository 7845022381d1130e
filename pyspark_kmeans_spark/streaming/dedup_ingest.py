"""Streaming ingestion dedup: the production daily/continuous form of the
incremental LSH pipeline, wired end-to-end as a Structured Streaming job.

Batch twin: operators/dedup.py's `build_signature_table` +
`incremental_kept_against` (sign only the batch, band-join against the
stored corpus signatures).  This module runs that exact unit inside
`foreachBatch` with a persisted-on-parquet signature STATE table that grows
by each batch's kept documents — the loop a 100 TB ingestion service runs:

    new files → [micro-batch] → dedup against state → append kept ids
                                                    → append kept signatures

Exactly-once under replay (Structured Streaming re-runs a batch after a
crash between sink write and checkpoint commit) comes from two decisions:

 - Both outputs (kept ids, signature state) write to deterministic
   `batch_id=<id>/` directories with mode("overwrite") — the
   streaming/sinks.py idempotent pattern — so a replay overwrites its own
   partial output instead of appending next to it.
 - The state read EXCLUDES directories with batch_id >= the current batch
   (and directories without a _SUCCESS marker), so a replayed batch sees
   exactly the state the original attempt saw — the recomputation is
   bit-identical, not merely set-identical.

Scale shape: state is read as a plain parquet scan (at 100 TB: a compacted
table the ingestion service owns); only the batch is tokenized+signed; the
candidate stage is the capped band-bucket join from the batch twin.  Nothing
here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pyspark_kmeans_spark.functions.persist import release_persisted
from pyspark_kmeans_spark.operators.dedup import (
    build_signature_table,
    incremental_kept_against,
)

SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("toks", T.ArrayType(T.LongType())),
        T.StructField("n", T.IntegerType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ]
)


def read_signature_state(
    spark: SparkSession, state_dir: str, *, before_batch: int | None = None
) -> DataFrame:
    """The corpus signature table as of a point in the batch sequence:
    union of committed (`_SUCCESS`-marked) per-batch directories, optionally
    restricted to batch_id < `before_batch` (replay determinism).  Missing/
    empty state yields an empty frame with the signature schema."""
    dirs = []
    if os.path.isdir(state_dir):
        for name in sorted(os.listdir(state_dir)):
            if not name.startswith("batch_id="):
                continue
            bid = int(name.split("=", 1)[1])
            if before_batch is not None and bid >= before_batch:
                continue
            if os.path.exists(os.path.join(state_dir, name, "_SUCCESS")):
                dirs.append(os.path.join(state_dir, name))
    if not dirs:
        return spark.createDataFrame([], SIG_SCHEMA)
    return spark.read.schema(SIG_SCHEMA).parquet(*dirs)


def dedup_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_dir: str,
    kept_dir: str,
    threshold: float = 0.9,
    num_hashes: int = 64,
    bands: int = 8,
    seed: int = 7,
) -> None:
    """One micro-batch of the ingestion loop: dedup `batch_df` against the
    committed signature state, write kept docs' ids and signatures to this
    batch's own (overwrite-on-replay) directories."""
    spark = batch_df.sparkSession
    sigs = read_signature_state(spark, state_dir, before_batch=batch_id)
    kept_ids = incremental_kept_against(
        sigs,
        batch_df,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        seed=seed,
    )
    kept_docs = batch_df.join(kept_ids, on="doc_id", how="left_semi")
    kept_docs.select("doc_id").write.mode("overwrite").parquet(
        f"{kept_dir}/batch_id={batch_id}"
    )
    build_signature_table(
        kept_docs, num_hashes=num_hashes, seed=seed
    ).write.mode("overwrite").parquet(f"{state_dir}/batch_id={batch_id}")
    # incremental_kept_against persists the batch signature frame in the
    # session registry; a long-running stream must not accumulate one
    # cached frame per micro-batch.
    release_persisted()


def dedup_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    *,
    state_dir: str,
    kept_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.9,
    max_files_per_trigger: int = 1,
):
    """File-source ingestion stream: each arriving parquet file of documents
    becomes a micro-batch deduped against everything accepted before it.
    Returns the started StreamingQuery (caller awaits/stops)."""
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: dedup_ingest_batch(
                df, bid, state_dir=state_dir, kept_dir=kept_dir,
                threshold=threshold,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
