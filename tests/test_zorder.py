"""Z-order layout: structural + plan pins for sources/zorder.py (values
are covered by test_oracle_parity.py — layout never changes results)."""

from __future__ import annotations

import pyarrow.parquet as pq

from pyspark_kmeans_spark.plans import physical_plan
from pyspark_kmeans_spark.sources.zorder import (
    ensure_zordered_orders,
    q_zorder_cust_window,
)


def _file_ranges(df, column):
    """(min, max) of `column` per parquet file, straight from the footers —
    the statistics the scan's file/row-group skipping actually uses."""
    paths = sorted({f.replace("file:", "") for f in df.inputFiles()})
    ranges = []
    for path in paths:
        meta = pq.ParquetFile(path).metadata
        idx = [
            i
            for i in range(len(meta.schema))
            if meta.schema.column(i).name == column
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
    return ranges


def _span_fractions(ranges):
    glo = min(lo for lo, _ in ranges)
    ghi = max(hi for _, hi in ranges)
    total = (ghi - glo) or 1
    try:
        total = total.total_seconds() or 1  # timestamp spans
        return [(hi - lo).total_seconds() / total for lo, hi in ranges]
    except AttributeError:
        return [(hi - lo) / total for lo, hi in ranges]


def test_files_are_narrow_in_both_dimensions(spark, sf_dir):
    """The defining Z-order property: every file spans a FRACTION of the
    global range in BOTH interleaved columns.  A single-column sort would
    leave the other column's per-file span at ~100%; with 16 z-range files
    (2 high bits per dimension) each file covers ~1/4 of each dimension,
    so 0.6 is a loose bound that still rules out one-dimensional layouts."""
    df = ensure_zordered_orders(spark, sf_dir)
    for column in ("o_custkey", "o_orderdate"):
        fracs = sorted(_span_fractions(_file_ranges(df, column)))
        assert len(fracs) > 4
        # Boundary effect: a file whose z-range crosses a high-order bit
        # flip of the OTHER dimension wraps through this dimension's full
        # range — cutting a Morton curve at arbitrary quantiles always
        # yields a couple such stragglers.  The layout claim is about the
        # bulk: all but 2 files narrow, and the mean far below the ~1.0
        # every file would show in a single-column sort on the other key.
        assert fracs[-3] <= 0.6, (column, fracs)
        assert sum(fracs) / len(fracs) <= 0.5, (column, fracs)


def test_both_predicates_are_pushed(spark, sf_dir):
    """Both the custkey band and the date window must reach the scan as
    pushed comparisons on the raw columns — otherwise the footer stats
    the layout exists for never get consulted."""
    plan = physical_plan(q_zorder_cust_window(spark, sf_dir))
    scan = [s for s in plan.split("FileScan parquet") if "o_custkey" in s][0]
    pushed = scan.split("PushedFilters: [")[1].split("]")[0]
    assert "GreaterThanOrEqual(o_custkey" in pushed
    assert "LessThanOrEqual(o_custkey" in pushed
    assert "GreaterThanOrEqual(o_orderdate" in pushed
    assert "LessThan(o_orderdate" in pushed
