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


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    *,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout: repartitionByRange on `sort_cols`
    (contiguous, non-overlapping key ranges per file) + sortWithinPartitions
    (monotone within each file).

    Parquet stores per-row-group min/max statistics; a read with a
    predicate on `sort_cols` skips every row group whose range misses —
    on a 100 TB table this turns point/range lookups from full scans into
    a handful of row groups, and it is why fact tables get laid out by
    their hottest filter key.  With a random layout the same predicate
    matches SOME rows in almost every row group and nothing skips.
    Layout quality (disjoint sorted ranges across files) is asserted from
    the parquet footers in tests/test_sinks.py.

    The range exchange samples the sort key to build balanced boundaries —
    skew-safe without manual tuning; one shuffle total, same as any
    repartition-before-write.
    """
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Small-files compaction — the table-maintenance job every long-lived
    ingestion table needs: incremental/streaming writers leave thousands of
    KB-sized files, and at object-store scale per-file open latency and
    listing cost come to dominate scans long before bytes do.

    Sizes the output from the SOURCE byte size (sum of file lengths via the
    catalog listing — no data pass), coalesces to
    ceil(bytes / target_file_bytes) tasks, and rewrites to `dest_path`.
    `coalesce` (not repartition) — compaction must not pay a shuffle: each
    output task concatenates whole input splits.  Writing to a NEW path and
    swapping at the catalog/manifest level is the safe production form
    (an in-place overwrite that fails mid-write destroys the table);
    returns the output file count.

    Hive-style directory partitioning in the source (`key=value`
    subdirectories) is DETECTED and preserved with `partitionBy` on the
    rewrite — silently flattening it would trade the partition pruning
    this module's own writers establish for slightly fewer files.
    """
    import math
    import os

    df = spark.read.parquet(src_path)
    partition_cols = []
    if "://" not in src_path and os.path.isdir(src_path):
        d = src_path
        while True:
            subdirs = [
                n for n in os.listdir(d)
                if "=" in n and os.path.isdir(os.path.join(d, n))
            ]
            if not subdirs:
                break
            partition_cols.append(subdirs[0].split("=", 1)[0])
            d = os.path.join(d, subdirs[0])
    # Source byte size from the file listing (metadata only, no data pass).
    n_files = max(1, math.ceil(_dir_bytes(src_path) / target_file_bytes))
    writer = df.coalesce(n_files).write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dest_path)
    return n_files


def _dir_bytes(path: str) -> int:
    """Total bytes of data files under `path` (local FS listing; on a real
    deployment this is one LIST call against the object store)."""
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            if not name.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, name))
    return total
