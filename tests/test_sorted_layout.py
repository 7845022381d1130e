"""Range-sorted layout: structural + plan pins for sources/sorted_layout.py
(values are covered by test_oracle_parity.py)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark_kmeans_spark.plans import physical_plan
from pyspark_kmeans_spark.sources.sorted_layout import (
    ensure_shipdate_sorted_lineitem,
    q_sorted_shipdate_window,
)


def _file_ranges(df):
    """(min, max) l_shipdate per parquet file, straight from the footers —
    the statistics the scan's row-group skipping actually uses."""
    root = sorted({f.replace("file:", "") for f in df.inputFiles()})
    ranges = []
    for path in root:
        meta = pq.ParquetFile(path).metadata
        idx = [
            i
            for i in range(len(meta.schema))
            if meta.schema.column(i).name == "l_shipdate"
        ][0]
        lo = min(
            meta.row_group(g).column(idx).statistics.min
            for g in range(meta.num_row_groups)
        )
        hi = max(
            meta.row_group(g).column(idx).statistics.max
            for g in range(meta.num_row_groups)
        )
        ranges.append((lo, hi))
    return sorted(ranges)


def test_files_cover_disjoint_shipdate_ranges(spark, sf_dir):
    """repartitionByRange + sortWithinPartitions must yield files whose
    shipdate ranges are pairwise disjoint — the property that lets footer
    min/max stats skip every file outside a range predicate."""
    df = ensure_shipdate_sorted_lineitem(spark, sf_dir)
    ranges = _file_ranges(df)
    assert len(ranges) > 1
    for (_, prev_hi), (next_lo, _) in zip(ranges, ranges[1:]):
        assert prev_hi <= next_lo, (prev_hi, next_lo)


def test_window_predicate_is_pushed(spark, sf_dir):
    """The shipdate window must reach the scan as a pushed range filter
    (GreaterThanOrEqual/LessThan on the raw column), not evaluate
    post-scan — otherwise the footer stats never get consulted."""
    plan = physical_plan(q_sorted_shipdate_window(spark, sf_dir))
    scan = [s for s in plan.split("FileScan parquet") if "l_shipdate" in s][0]
    pushed = scan.split("PushedFilters: [")[1].split("]")[0]
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_shipdate" in pushed
