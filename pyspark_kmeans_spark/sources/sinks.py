"""Sinks: partitioned/bucketed writers with scale-aware layout control.

The reference's only sinks are a driver-local CSV and MLlib model dirs
(SURVEY.md §2.1 S3-S4).  A 100 TB engine needs layout-aware table output:

 - **partitionBy** columns become directory partitions → downstream reads
   prune entire directories (PartitionFilters, verified in tests).
 - **target file sizing** via repartition before write — thousands of tiny
   files (one per task × partition value) are a metadata DoS on any object
   store; one shuffle to `files_per_partition` tasks per partition value
   fixes the layout at the cost AQE would charge anyway.
 - CSV/JSON writers for interchange (header/compression options pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet with controlled file counts per
    partition value.

    Shuffle on (partition_cols + salt-in-[0, files_per_partition)) so each
    partition value's rows land in at most `files_per_partition` distinct
    tasks → at most that many files per directory.  (Repartitioning on
    `(files_per_partition, *cols)` — the previous spelling — instead hashes
    the partition columns into `files_per_partition` TOTAL tasks: the
    default funneled the entire dataset through one write task.)
    """
    if files_per_partition > 0 and partition_cols:
        # Deterministic content-derived salt: repartitioning on rand() is a
        # replay hazard — on task retry after a shuffle-fetch failure the
        # re-evaluated rand() can route rows to different reducers,
        # duplicating or dropping them.  xxhash64 over the row is a pure
        # function of content, so any replay routes identically.
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        df = df.repartition(*[F.col(c) for c in partition_cols], salt)
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(df: DataFrame, path: str, *, single_file: bool = False, mode: str = "overwrite") -> None:
    """CSV sink (S3 parity).  `single_file=True` only for driver-scale
    results (coalesce(1) serializes the write)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
