"""Numerically deterministic aggregation helpers.

Floating-point SUM is order-dependent: at 100 TB the partial-aggregation
order is nondeterministic across runs and differs from any single-node
oracle.  Routing sums through DECIMAL makes the arithmetic associative and
exact, so results are bit-identical regardless of partitioning — which is
both what a correctness oracle needs and what a user re-running a 1000-executor
job expects.

The pattern (same formula the DuckDB oracle uses):
    sum:  CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
    avg:  sum_as_above / COUNT(x)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 18 digits / 6 decimal places comfortably covers money-like doubles
# (|x| < 1e12) while keeping the decimal narrow enough that SUM promotes
# without overflow (Spark: decimal(28,6)).
DEC = T.DecimalType(18, 6)


def decimal_sum(col: Column | str) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast(T.DoubleType())


def exact_avg(col: Column | str) -> Column:
    """Order-independent AVG of a double column (decimal sum / count)."""
    c = F.col(col) if isinstance(col, str) else col
    return decimal_sum(c) / F.count(c)
