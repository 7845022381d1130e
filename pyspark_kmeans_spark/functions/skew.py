"""Skew-mitigation: salted two-phase aggregation and salted replicated join.

AQE's skew-join splitting covers most join skew at runtime, but (a) a
groupBy on a pathologically hot key still funnels that key's rows into one
reducer, and (b) AQE can only split a skewed partition along MAP-task
boundaries — a hot key produced by few mappers, or a join whose output
must stay partitioned, falls back to one monster task.  The manual
mitigations below are result-identical to the plain forms (verified by
oracle) and deterministic under partial recompute.

 - `salted_agg`: split each key into `salt` sub-keys for a partial
   aggregate, then re-aggregate the partials.
 - `salted_join`: replicate the SMALL side `salt`× (one row per salt
   value) and spread the big side's hot keys over (key, salt) — every
   reducer sees ~1/salt of any hot key.  The replication multiplies the
   small side only, so it is the right tool exactly when the small side
   is dimension-like but too big (or too explode-derived) to broadcast.
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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over `salt` sub-keys.

    The big side salts each row by a content hash (same determinism
    rationale as salted_agg: positional ids could re-salt differently on
    partial recompute); the small side is replicated once per salt value
    via a literal-array explode (no shuffle — the replication happens
    map-side on the small frame).  The join key becomes (on, _salt), so
    one hot key's rows land on `salt` reducers instead of one.

    Result-identical to `big.join(small, on, how)` for inner/left joins
    (each big row matches exactly its own salt's replica).  Other join
    types are REJECTED: a right/full/semi/anti join would count the
    replicated small rows once per salt (e.g. 16 null-extended copies of
    an unmatched small row in a full join).  Cost: the small side's
    shuffle volume × salt — use when the small side is far below the big
    side but above broadcast size.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "the salt-replicated small side would multiply unmatched small "
            "rows under right/full/semi/anti semantics"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt))
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_big.join(
        replicated.hint("shuffle_hash"), on=[on, "_salt"], how=how
    ).drop("_salt")
