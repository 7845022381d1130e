"""Exactly-once foreachBatch sinks.

Structured Streaming guarantees at-least-once delivery to foreachBatch: after
a failure between the sink write and the checkpoint commit, the SAME batch
(same batch_id, same rows) is replayed on restart.  A naive
`write.mode("append")` sink therefore duplicates every replayed batch — the
classic silent-duplication bug in production pipelines.

`idempotent_batch_writer` is the canonical fix (the pattern Delta's
txn-version dedup formalizes, spelled with plain parquet): each batch writes
to a deterministic `batch_id=<id>/` directory with mode("overwrite"), so a
replay overwrites its own previous (possibly partial) output instead of
appending next to it.  Reading the sink root recovers `batch_id` as a
partition column — downstream consumers can also use it as the exactly-once
watermark ("process batches ≤ N").

At 100 TB this is the same one-directory-per-batch layout a bucketed/
partitioned lake sink uses; the overwrite is scoped to the single replayed
batch directory, never the table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent_batch_writer(out_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch function with exactly-once semantics under replay:
    deterministic per-batch directory + overwrite.  Pass to
    `writeStream.foreachBatch(...)`."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return write
