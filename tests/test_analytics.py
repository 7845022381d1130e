"""Invariant tests for sketch-based aggregates (no oracle possible) and
multi-dimensional agg structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_kmeans_spark.operators.analytics import (
    q_approx_aggs,
    q_count_distinct,
    q_cube,
)


def test_approx_close_to_exact(spark, sf_dir):
    approx = {r.l_returnflag: r for r in q_approx_aggs(spark, sf_dir).collect()}
    exact = {r.l_returnflag: r for r in q_count_distinct(spark, sf_dir).collect()}
    for flag, e in exact.items():
        a = approx[flag]
        # HLL standard error at default rsd=5%; allow 15%.
        assert abs(a.approx_parts - e.n_parts) / e.n_parts < 0.15
        assert a.approx_median_price > 0
        # The query's own driver-visible invariant columns must agree.
        assert a.exact_parts == e.n_parts
        assert a.parts_in_bounds and a.median_in_bounds
        assert a.rel_err_parts >= 0.0 and a.rel_err_median >= 0.0


def test_cube_has_grand_total(spark, sf_dir):
    rows = q_cube(spark, sf_dir).collect()
    grand = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1
    total = sum(r.n_rows for r in rows if r.l_returnflag is not None and r.l_linestatus is not None)
    assert grand[0].n_rows == total
