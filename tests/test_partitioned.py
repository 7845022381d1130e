"""Partition-pruning layout: plan pins for sources/partitioned.py (values
are covered by test_oracle_parity.py)."""

from __future__ import annotations

from pyspark_kmeans_spark.plans import physical_plan
from pyspark_kmeans_spark.sources.partitioned import (
    ensure_month_partitioned_orders,
    q_partitioned_month_revenue,
)


def test_month_filter_becomes_partition_filter(spark, sf_dir):
    """The o_month equality must resolve at the file listing, not as a data
    filter: the scan node carries it under PartitionFilters, and no pushed
    DATA filter on o_month remains (reading then filtering would scan the
    whole table at 100 TB)."""
    plan = physical_plan(q_partitioned_month_revenue(spark, sf_dir))
    scan = [s for s in plan.split("FileScan parquet") if "o_month" in s][0]
    pf = scan.split("PartitionFilters: [")[1].split("]")[0]
    assert "o_month" in pf and "1996-03" in pf


def test_partitioned_copy_reused_not_rewritten(spark, sf_dir, tmp_path):
    """Second call must reuse the materialized layout (the ingestion-job
    contract: layout is written once, queries only read)."""
    import os

    df1 = ensure_month_partitioned_orders(spark, sf_dir)
    root = df1.inputFiles()[0]
    mtime = os.path.getmtime(root.replace("file:", ""))
    df2 = ensure_month_partitioned_orders(spark, sf_dir)
    assert os.path.getmtime(root.replace("file:", "")) == mtime
    assert df1.count() == df2.count()
