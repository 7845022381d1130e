"""Temporal join operators: as-of join and time-range join.

Spark has no native AS OF join (Flink/kdb/QuestDB/DuckDB do); the scalable
composition here is the union-sort trick:

    tag both sides → union → window over (key) ordered by (time, side tag)
    → last non-null right-side attribute → keep left rows

which is exactly one shuffle + one sort per side — the same cost profile as
a sort-merge join, with no row explosion regardless of how many right rows
precede each left row.  (The naive left-join + ROW_NUMBER approach — which
the DuckDB oracle uses — multiplies each left row by every earlier right row
first: fine for an oracle at sf0.01, quadratic poison at 100 TB.)

Determinism: ties on the time axis break by (side tag, right-side key), so
concurrent right rows resolve to the max key on both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_kmeans_spark.functions.exact import decimal_sum
from pyspark_kmeans_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row of the same key with
    right_time <= left_time (at-or-before semantics).

    Returns all left columns + `right_values` (null when no prior right
    row).  Semantic contracts (each latently wrong in the round-2 form):

     - The attached values come from ONE right row, carried as a single
       struct through the window — per-column last() could tear values
       from different right rows when some columns are null.
     - NULL keys follow SQL join semantics: a NULL-keyed left row attaches
       nothing and NULL-keyed right rows match nothing (the union-sort
       window would otherwise pair them with each other).
     - `tolerance` (an INTERVAL string, e.g. '7 days') bounds the
       lookback like pandas merge_asof: a match older than
       left_time − tolerance comes back as NULL.

    Ties at equal right_time resolve to the lexicographically greatest
    (right_values…) tuple — deterministic on both engines.
    """
    payload = [c for c in left.columns if c != left_key]
    r_struct_type = (
        "struct<_rt:"
        + right.schema[right_time].dataType.simpleString()
        + ","
        + ",".join(
            f"{v}:{right.schema[v].dataType.simpleString()}" for v in right_values
        )
        + ">"
    )
    lt = left.select(
        F.col(left_key),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_lp_{c}") for c in payload],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    rt = right.filter(F.col(right_key).isNotNull()).select(
        F.col(right_key).alias(left_key),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_lp_{c}")
            for c in payload
        ],
        F.struct(
            F.col(right_time).alias("_rt"),
            *[F.col(v) for v in right_values],
        ).alias("_r"),
    )
    unioned = lt.unionByName(rt)
    # Order: time asc, right rows (side 0) before left rows at equal time →
    # a right row exactly at left_time IS visible.  Within equal
    # (time, side), later right rows win via the struct sort (lexicographic
    # over (_rt, *right_values)).
    w = (
        Window.partitionBy(left_key)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_r = F.last("_r", ignorenulls=True).over(w)
    if tolerance is not None:
        last_r = F.when(
            last_r["_rt"] >= F.col("_t") - F.expr(f"INTERVAL {tolerance}"),
            last_r,
        )
    matched = F.when(F.col(left_key).isNotNull(), last_r)
    out = unioned.withColumn("_last", matched)
    return out.filter(F.col("_side") == 1).select(
        F.col(left_key),
        *[F.col(f"_lp_{c}").alias(c) for c in payload],
        *[F.col("_last")[v].alias(f"last_{v}") for v in right_values],
    )


# --------------------------------------------------------------------------
# Query registry
# --------------------------------------------------------------------------


def q_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the customer's most recent order key at-or-before the
    event time (ties on order date resolve to max orderkey)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    out = asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("last_o_orderkey").alias("last_orderkey"),
    )


def q_range_join_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi+range join: per event, count + revenue of the same customer's
    orders in the 365 days before the event.  The equi key (customer) bounds
    the fan-out, so the range predicate is a post-join filter — no
    quadratic blow-up; at 100 TB the join shuffles on the customer key."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    cond = (
        (events.user_id == orders.o_custkey)
        & (orders.o_orderdate <= events.ts)
        & (orders.o_orderdate >= events.ts - F.expr("INTERVAL 365 DAYS"))
    )
    joined = events.join(orders, cond, "left")
    return joined.groupBy("event_id").agg(
        F.count("o_orderkey").alias("n_recent_orders"),
        F.coalesce(decimal_sum("o_totalprice"), F.lit(0.0)).alias("recent_revenue"),
    )


def scd2_intervals(
    changes: DataFrame,
    *,
    key_col: str,
    time_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """SCD-type-2 dimension build from an observation stream: collapse the
    per-key value history into effective-dated intervals
    (value, effective_from, effective_to; open interval = NULL).

    Three per-key windows, all partitioned by the key (parallel at any
    key cardinality, no global sort): (1) pick one deterministic
    observation per (key, time) via the tie-break ordering, (2) keep only
    rows where the value CHANGES vs LAG — consecutive repeats collapse,
    (3) close each interval at LEAD(time) - 1 day.  One shuffle on the
    key feeds all three windows (same partitioning reused across stages).
    """
    w_pick = Window.partitionBy(key_col, time_col).orderBy(F.desc(tiebreak_col))
    picked = (
        changes.withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .drop("_rn", tiebreak_col)
    )
    w_key = Window.partitionBy(key_col).orderBy(time_col)
    # Null-safe change detection: `prev != value` is NULL (row dropped)
    # when either side is NULL, which would silently merge an A→NULL
    # transition into the prior interval.  A sentinel lag marks the true
    # first row — `prev IS NULL` cannot, because a NULL-valued
    # observation also produces a NULL prev.
    runs = (
        picked.withColumn("_prev", F.lag(value_col).over(w_key))
        .withColumn("_has_prev", F.lag(F.lit(1)).over(w_key).isNotNull())
        .filter(
            ~F.col("_has_prev")
            | ~F.col("_prev").eqNullSafe(F.col(value_col))
        )
    )
    return runs.select(
        key_col,
        value_col,
        F.col(time_col).cast("string").alias("effective_from"),
        F.date_sub(F.lead(time_col).over(w_key), 1)
        .cast("string")
        .alias("effective_to"),
    )


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-dated order-priority history per customer (SCD-2 build
    from the orders stream; latest orderkey wins within a day)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("obs_date"),
        "o_orderkey",
        "o_orderpriority",
    )
    return scd2_intervals(
        orders,
        key_col="o_custkey",
        time_col="obs_date",
        value_col="o_orderpriority",
        tiebreak_col="o_orderkey",
    )


def q_rolling_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: the customer's trailing-90-day order count and total —
    a RANGE-frame window (value-based, not row-based) over epoch days,
    partitioned by customer so every window task is key-local.  The
    windowed SUM accumulates in exact DECIMAL, so the trailing total is
    order-independent and bit-identical across engines and partitionings."""
    from pyspark.sql import types as T

    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    base = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", day.alias("_day")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("_day")
        .rangeBetween(-89, Window.currentRow)
    )
    return base.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(T.DecimalType(18, 6)))
        .over(w)
        .cast("double")
        .alias("spend_90d"),
        F.count(F.lit(1)).over(w).alias("n_orders_90d"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "asof_last_order": q_asof_last_order,
    "range_join_recent_orders": q_range_join_recent_orders,
    "scd2_intervals": q_scd2_intervals,
    "rolling_spend": q_rolling_spend,
}

ORACLES: dict[str, str] = {
    # Oracle spelling: left join + ROW_NUMBER (quadratic but exact; the
    # Spark side uses the scalable union-sort form).  ts is compared at
    # microsecond precision on both sides.
    "asof_last_order": """
        WITH ranked AS (
            SELECT e.event_id, e.user_id, epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
                   o.o_orderkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                   ) AS rn
            FROM events e
            LEFT JOIN orders o
              ON e.user_id = o.o_custkey
             AND CAST(o.o_orderdate AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
        )
        SELECT event_id, user_id, ts_us, o_orderkey AS last_orderkey
        FROM ranked WHERE rn = 1
    """,
    "range_join_recent_orders": """
        SELECT e.event_id,
               COUNT(o.o_orderkey) AS n_recent_orders,
               COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0.0)
                   AS recent_revenue
        FROM events e
        LEFT JOIN orders o
          ON e.user_id = o.o_custkey
         AND CAST(o.o_orderdate AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
         AND CAST(o.o_orderdate AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) - INTERVAL '365 days'
        GROUP BY e.event_id
    """,
    "scd2_intervals": """
        WITH daily AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS obs_date,
                   o_orderpriority,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
                       ORDER BY o_orderkey DESC
                   ) AS rn
            FROM orders
        ), picked AS (
            SELECT o_custkey, obs_date, o_orderpriority FROM daily WHERE rn = 1
        ), runs AS (
            SELECT o_custkey, obs_date, o_orderpriority,
                   LAG(o_orderpriority) OVER (
                       PARTITION BY o_custkey ORDER BY obs_date
                   ) AS prev
            FROM picked
        )
        SELECT o_custkey, o_orderpriority,
               CAST(obs_date AS VARCHAR) AS effective_from,
               CAST(LEAD(obs_date) OVER (
                   PARTITION BY o_custkey ORDER BY obs_date
               ) - 1 AS VARCHAR) AS effective_to
        FROM runs
        WHERE prev IS NULL OR prev != o_orderpriority
    """,
    "rolling_spend": """
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
                   AS spend_90d,
               COUNT(*) OVER w AS n_orders_90d
        FROM (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                       AS _day
            FROM orders
        )
        WINDOW w AS (PARTITION BY o_custkey ORDER BY _day
                     RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)
    """,
}
