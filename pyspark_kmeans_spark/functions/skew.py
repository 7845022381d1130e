"""Skew-mitigation: salted two-phase aggregation.

AQE's skew-join splitting covers joins, but a groupBy on a pathologically
hot key still funnels that key's rows into one reducer.  Salting splits each
key into `salt` sub-keys for a partial aggregate, then re-aggregates the
partials — the hot key's work spreads over `salt` reducers and the second
shuffle only moves (keys × salt) partial rows.

Result-identical to a plain groupBy for any associative aggregate (sums and
counts here are DECIMAL/integer → order-independent), verified by oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_kmeans_spark.functions.exact import DEC


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column | str],
    *,
    salt: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(decimal_sum, count) with a salted first phase.

    sum_cols maps output name → input column/expression; output also gets
    `n_rows`.  Use when one key value dominates the distribution.

    The salt is a CONTENT hash of the whole row, not a positional id:
    monotonically_increasing_id is order-dependent, so a partial recompute
    after a shuffle-fetch failure could re-salt rows differently and
    double-count or drop them in the final aggregate (the classic
    repartition-by-nondeterministic-key hazard; same fix as the
    partitioned-write salt in sources/sinks.py).  Limitation: rows that are
    bit-identical across EVERY column share a salt, so a hot key whose rows
    are exact duplicates does not spread — such inputs should carry any
    distinguishing column (an event id, an offset) into the frame.
    """
    exprs = {
        name: (F.col(c) if isinstance(c, str) else c) for name, c in sum_cols.items()
    }
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(e.cast(DEC)).alias(f"_s_{name}") for name, e in exprs.items()],
        F.count(F.lit(1)).alias("_n"),
    )
    final = partial.groupBy(*keys).agg(
        *[F.sum(f"_s_{name}").cast("double").alias(name) for name in exprs],
        F.sum("_n").alias("n_rows"),
    )
    return final
