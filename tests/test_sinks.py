"""Sink round-trips + partition-pruning verification."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark_kmeans_spark.plans import physical_plan
from pyspark_kmeans_spark.sources.sinks import (
    read_partitioned_parquet,
    write_csv,
    write_json,
    write_partitioned_parquet,
)
from pyspark_kmeans_spark.sources.tables import load_table


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "li_part")
    write_partitioned_parquet(li, out, ["l_returnflag"])
    # layout: one directory per partition value, one file per partition
    dirs = [d for d in os.listdir(out) if d.startswith("l_returnflag=")]
    assert sorted(dirs) == ["l_returnflag=A", "l_returnflag=N", "l_returnflag=R"]
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1

    back = read_partitioned_parquet(spark, out)
    assert back.count() == li.count()

    filtered = back.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    plan = physical_plan(filtered)
    assert "PartitionFilters" in plan
    assert "l_returnflag" in plan.split("PartitionFilters")[1].split("]")[0]
    n_direct = li.filter(F.col("l_returnflag") == "A").count()
    assert filtered.count() == n_direct


def test_csv_json_round_trip(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer")
    csv_path, json_path = str(tmp_path / "c_csv"), str(tmp_path / "c_json")
    write_csv(cust, csv_path, single_file=True)
    write_json(cust, json_path)
    csv_back = spark.read.schema(cust.schema).option("header", True).csv(csv_path)
    json_back = spark.read.schema(cust.schema).json(json_path)
    assert csv_back.count() == cust.count()
    assert json_back.count() == cust.count()
    a = {tuple(r) for r in cust.collect()}
    assert {tuple(r) for r in csv_back.collect()} == a
    assert {tuple(r) for r in json_back.collect()} == a


def test_partitioned_write_files_per_partition(spark, sf_dir, tmp_path):
    """files_per_partition=N must yield MULTIPLE files per partition value
    (up to N), not hash all values into N total tasks (ADVICE r1)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "li_part_n")
    # At test scale AQE coalesces the salted shuffle back into one
    # partition (groups are far below the 64MB advisory size) — disable
    # coalescing to observe the salting itself; at real scale the groups
    # exceed the advisory size and survive AQE untouched.
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        write_partitioned_parquet(li, out, ["l_returnflag"], files_per_partition=3)
    finally:
        spark.conf.set(coalesce_key, prev)
    per_dir = {}
    for d in os.listdir(out):
        if d.startswith("l_returnflag="):
            per_dir[d] = len(
                [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
            )
    assert set(per_dir) == {"l_returnflag=A", "l_returnflag=N", "l_returnflag=R"}
    # Each value's rows are salted across 3 tasks; hash collisions can
    # merge salts, so "at most 3, at least 2, for every busy partition".
    assert all(1 <= n <= 3 for n in per_dir.values()), per_dir
    assert max(per_dir.values()) >= 2, per_dir
    back = read_partitioned_parquet(spark, out)
    assert back.count() == li.count()


def test_sorted_layout_has_disjoint_rowgroup_ranges(spark, sf_dir, tmp_path):
    """write_sorted_parquet must produce files whose per-row-group
    (min, max) ranges on the sort key are internally sorted and
    non-overlapping ACROSS files — the property parquet min/max skipping
    needs to prune range predicates."""
    import pyarrow.parquet as pq

    from pyspark_kmeans_spark.sources.sinks import write_sorted_parquet

    out = str(tmp_path / "sorted")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_sorted_parquet(orders, out, ["o_custkey"], num_files=4)

    ranges = []
    for name in os.listdir(out):
        if not name.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(os.path.join(out, name))
        idx = pf.schema_arrow.names.index("o_custkey")
        file_ranges = [
            (
                pf.metadata.row_group(g).column(idx).statistics.min,
                pf.metadata.row_group(g).column(idx).statistics.max,
            )
            for g in range(pf.metadata.num_row_groups)
        ]
        # monotone within the file
        assert file_ranges == sorted(file_ranges), name
        ranges.append((file_ranges[0][0], file_ranges[-1][1]))
    assert len(ranges) == 4
    # disjoint (at most touching at boundaries) across files
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges
    back = spark.read.parquet(out)
    assert back.count() == orders.count()


def test_compaction_reduces_file_count(spark, sf_dir, tmp_path):
    """compact_parquet must turn a many-tiny-files table into
    ceil(bytes/target) files without losing rows."""
    from pyspark_kmeans_spark.sources.sinks import _dir_bytes, compact_parquet

    src = str(tmp_path / "fragmented")
    dest = str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(40).write.parquet(src)  # simulate streaming dribble
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src >= 30

    n_out = compact_parquet(spark, src, dest, target_file_bytes=_dir_bytes(src))
    files = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    assert n_out == 1 and len(files) == 1
    assert spark.read.parquet(dest).count() == orders.count()


def test_compact_preserves_partition_layout(spark, tmp_path):
    """Compacting a hive-partitioned table must keep the key=value layout
    (and thus PartitionFilters pruning), not flatten it (review fix)."""
    import os

    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.sources.sinks import compact_parquet

    df = spark.range(100).withColumn("part", (F.col("id") % 3).cast("int"))
    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    df.write.partitionBy("part").parquet(src)
    compact_parquet(spark, src, dest)
    assert sorted(
        n for n in os.listdir(dest) if n.startswith("part=")
    ) == ["part=0", "part=1", "part=2"]
    back = spark.read.parquet(dest)
    assert back.count() == 100
    assert back.filter(F.col("part") == 1).count() == df.filter(
        F.col("part") == 1
    ).count()
