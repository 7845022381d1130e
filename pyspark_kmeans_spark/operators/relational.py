"""Relational query surface over the driver testdata, oracle-checked.

One entry per operator family in SURVEY.md §2 (scans, projections, derived
columns, two-level aggregations, the four join shapes, dedup, null-fill,
window forms, sorts/limits, set ops, scalar functions), each expressed
Spark-first with a matching ANSI-SQL oracle for DuckDB.

Determinism rules used throughout (required for hash-equality with the
oracle AND for run-to-run reproducibility on a 1000-executor cluster):
 - money sums go through DECIMAL (functions/exact.py) — order-independent;
 - transcendental outputs (ln) are rounded to 6 decimals on both sides;
 - every LIMIT carries a total ORDER BY with a unique tie-break key;
 - timestamps are cast to DATE/epoch before leaving a query.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_kmeans_spark.functions.exact import decimal_sum, exact_avg
from pyspark_kmeans_spark.operators import segmentation as seg
from pyspark_kmeans_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship (SURVEY.md §2: P1-P6, J1-J4, A1-A5 composed)
# --------------------------------------------------------------------------


def q_customer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seg.customer_features(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "events"),
        _t(spark, sf_dir, "supplier"),
    )


_FLAGSHIP_SQL = """
WITH ages AS (
    SELECT o_custkey,
           datediff('day', MIN(CAST(o_orderdate AS DATE)), DATE '2026-01-01') / 365 AS age
    FROM orders GROUP BY o_custkey
), per_order AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS order_revenue
    FROM lineitem GROUP BY l_orderkey
), rev AS (
    SELECT o_custkey,
           CAST(SUM(CAST(order_revenue AS DECIMAL(18,6))) AS DOUBLE) / COUNT(order_revenue)
               AS avg_buy,
           MIN(order_revenue) AS min_buy,
           MAX(order_revenue) AS max_buy
    FROM per_order JOIN orders ON per_order.l_orderkey = orders.o_orderkey
    GROUP BY o_custkey
), hits AS (
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS hit_rate
    FROM events GROUP BY user_id
), str AS (
    SELECT s_nationkey, MAX(s_acctbal) AS strength FROM supplier GROUP BY s_nationkey
)
SELECT c_custkey, age, avg_buy, min_buy, max_buy, hit_rate,
       COALESCE(strength, 0.0) AS strength,
       CASE WHEN age     > 0 THEN ROUND(LN(age), 6)     END AS log_age,
       CASE WHEN avg_buy > 0 THEN ROUND(LN(avg_buy), 6) END AS log_avg_buy,
       CASE WHEN min_buy > 0 THEN ROUND(LN(min_buy), 6) END AS log_min_buy,
       CASE WHEN max_buy > 0 THEN ROUND(LN(max_buy), 6) END AS log_max_buy
FROM customer
JOIN ages ON c_custkey = ages.o_custkey
JOIN rev  ON c_custkey = rev.o_custkey
JOIN hits ON c_custkey = hits.user_id
LEFT JOIN str ON c_nationkey = str.s_nationkey
"""


# --------------------------------------------------------------------------
# Scans / projections / derived columns (S-, P-rows)
# --------------------------------------------------------------------------


def q_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P2: pure column projection — prunes the parquet scan to 3 columns.
    return _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")


def q_derived_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P1: datediff-against-constant derived column (utils/kmeans_utils.py:30).
    orders = _t(spark, sf_dir, "orders")
    age = F.datediff(
        F.to_date(F.lit(seg.TESTDATA_REFERENCE_DATE), "yyyy-MM-dd"),
        F.to_date("o_orderdate"),
    ) / 365
    return orders.select("o_orderkey", age.alias("order_age"))


def q_log_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P5: natural log, null for non-positive input (utils/kmeans_utils.py:63).
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey", F.round(F.log("c_acctbal"), 6).alias("log_acctbal")
    )


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.7 extension: date-part + string scalar functions, all JVM-side.
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.upper("o_orderstatus").alias("status_upper"),
        F.substring("o_orderpriority", 1, 1).alias("priority_code"),
        F.length("o_orderpriority").alias("priority_len"),
        # F.concat (NULL-propagating) to match the oracle's `||` — concat_ws
        # skips NULL args and would silently diverge on null inputs.
        F.concat("o_orderstatus", F.lit("-"), "o_orderpriority").alias(
            "status_priority"
        ),
    )


# --------------------------------------------------------------------------
# Aggregations (A-rows)
# --------------------------------------------------------------------------


def q_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1: two-key-style grouped sum (per-order revenue).
    return seg.order_revenue(_t(spark, sf_dir, "lineitem"))


def q_customer_revenue_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A2: two-level aggregation — avg/min/max of per-order sums.
    return seg.customer_revenue_stats(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    )


def q_event_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A3: mean of a 0/1 indicator per user.
    return seg.customer_hit_rate(_t(spark, sf_dir, "events"))


def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A4: dropDuplicates over a 2-column projection.
    return _t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").dropDuplicates()


# --------------------------------------------------------------------------
# Joins (J-rows)
# --------------------------------------------------------------------------


def q_supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J1: dimension equi-join (broadcast — nation is bounded at any SF).
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")  # broadcast via load_table
    return (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey, "inner")
        .select("s_suppkey", "s_name", "n_name")
    )


def q_left_join_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J4+A5: left join + null fill (utils/kmeans_utils.py:50).
    cust = _t(spark, sf_dir, "customer")
    counts = _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        cust.select("c_custkey")
        .join(counts, cust.c_custkey == counts.o_custkey, "left")
        .drop("o_custkey")
        .na.fill(0, subset=["n_orders"])
    )


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Extension: semi/anti joins (EXISTS / NOT EXISTS) — customers with
    # orders but no events.
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    events = _t(spark, sf_dir, "events")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .join(events, cust.c_custkey == events.user_id, "left_anti")
        .select("c_custkey", "c_name")
    )


# --------------------------------------------------------------------------
# Windows / unpivot (W-rows)
# --------------------------------------------------------------------------


def q_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1: per-group row number with a deterministic total order.
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W2: wide → long unpivot of the revenue-stat matrix.
    stats = seg.customer_revenue_stats(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    )
    return stats.unpivot(
        ids=["o_custkey"],
        values=["avg_buy", "min_buy", "max_buy"],
        variableColumnName="feature",
        valueColumnName="value",
    )


def q_distinct_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W3: distinct values of one column.
    return _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Extension: running aggregate window (cumulative revenue per customer).
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    total = F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w)
    return orders.select(
        "o_custkey", "o_orderkey", total.cast("double").alias("running_total")
    )


def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (§2.5 breadth): the remaining window shapes a warehouse
    workload uses — lag delta, lead, ntile quartiles, percent_rank, and a
    bounded moving average — all over ONE window spec, so the physical
    plan is a single partition-sort (one Exchange + one Sort for five
    functions, not five)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice").cast("decimal(18,6)")
    prev_gap = F.datediff("o_orderdate", F.lag("o_orderdate", 1).over(w))
    # Exact decimal sum / count (not AVG): both engines divide the same
    # exact double, so the rounded result is bit-identical.
    frame = w.rowsBetween(-2, 0)
    moving = F.sum(price).over(frame).cast("double") / F.count(F.lit(1)).over(frame)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        prev_gap.alias("days_since_prev"),
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(moving, 6).alias("moving_avg_3"),
    )


# --------------------------------------------------------------------------
# Sorts / limits / set ops (§2.6 — absent in the reference; added here)
# --------------------------------------------------------------------------


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Total-ordered LIMIT with unique tie-break (TakeOrderedAndProject plan —
    # no full sort shuffle at scale).
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(20)
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UNION (distinct) + EXCEPT: all segment/priority labels minus one.
    segments = _t(spark, sf_dir, "customer").select(F.col("c_mktsegment").alias("val"))
    priorities = _t(spark, sf_dir, "orders").select(F.col("o_orderpriority").alias("val"))
    excluded = spark.createDataFrame([("BUILDING",)], "val string")
    return segments.union(priorities).distinct().exceptAll(excluded)


# --------------------------------------------------------------------------
# TPC-H-shaped headline queries (aggregation + join-plan benchmarks)
# --------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q1 shape: wide grouped aggregation with derived measures.
    li = _t(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") <= F.lit("2000-09-02")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),  # integer-valued doubles: exact
        decimal_sum("l_extendedprice").alias("sum_base_price"),
        decimal_sum(disc_price).alias("sum_disc_price"),
        decimal_sum(charge).alias("sum_charge"),
        exact_avg("l_quantity").alias("avg_qty"),
        exact_avg("l_extendedprice").alias("avg_price"),
        exact_avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q3 shape: selective dim filter → fact join → grouped top-k.
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(decimal_sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5 shape: snowflake join (2 broadcast dims + 3 fact-side tables),
    # revenue per nation within one region.
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(nation, sup.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(decimal_sum(revenue).alias("revenue"))
    )


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q7 shape (testdata nation names): shipping volume between two
    # nations by year — the
    # supplier nation and customer nation are BOTH dimension joins (each
    # broadcast; nation is bounded at any SF), with the year derived from
    # the lineitem ship date so the predicate prunes at the scan.
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    n1 = nation.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10") | (
        F.col("supp_nation") == "NATION_10"
    ) & (F.col("cust_nation") == "NATION_9")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("_sk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("_ck"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).alias("l_year"),
        )
        .agg(decimal_sum(revenue).alias("revenue"))
    )


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q14 shape: monthly share of revenue from PROMO-type parts.
    # lineitem ⋈ part on partkey (part grows with SF — no broadcast hint,
    # AQE picks broadcast vs shuffle by size); both sums are exact DECIMAL,
    # divided once as doubles so the share is bit-stable cross-engine.
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            F.year(F.to_date("l_shipdate")).alias("ship_year"),
            F.month(F.to_date("l_shipdate")).alias("ship_month"),
        )
        .agg(
            decimal_sum(promo_rev).alias("_promo"),
            decimal_sum(revenue).alias("_total"),
        )
        .select(
            "ship_year",
            "ship_month",
            F.round(F.lit(100.0) * F.col("_promo") / F.col("_total"), 6).alias(
                "promo_share_pct"
            ),
        )
    )


def q_collection_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Array/collection function surface: per-priority sorted value list
    # (bounded by the segment-count dimension), its slice/size/contains
    # forms, and a string aggregation — one bounded-key shuffle.
    orders = _t(spark, sf_dir, "orders")
    per_seg = (
        orders.join(
            _t(spark, sf_dir, "customer"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("o_orderpriority", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_seg.groupBy("o_orderpriority")
        .agg(
            F.array_sort(F.collect_list("c_mktsegment")).alias("_segs"),
            F.sum("n").alias("n_orders"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.size("_segs").alias("n_segments"),
            F.array_contains("_segs", "BUILDING").alias("has_building"),
            # Array outputs leave the query as joined strings: the driver
            # value-hash stringifies cells, and list-vs-ndarray reprs
            # differ between engines' pandas bridges.
            F.concat_ws("|", F.slice("_segs", 1, 2)).alias("first_two"),
            F.concat_ws("|", "_segs").alias("segs_joined"),
        )
    )


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q18 shape: HAVING over a grouped sum selects the heavy keys,
    # then a join pulls their detail rows.  The HAVING side reduces to the
    # qualifying-key set before the join — at 100 TB that set is small and
    # AQE broadcasts it into the detail scan instead of shuffling lineitem
    # twice.
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_custkey",
            F.to_date("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


def merge_upsert(
    base: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """SCD-type-1 merge (MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT
    MATCHED INSERT, as a pure DataFrame transform): rows from `updates`
    win on key collision, unmatched base rows pass through.

    The scale-correct spelling is anti-join + union, ONE shuffle on the
    key (plus the update side's broadcast/shuffle, AQE-chosen) — not a
    full outer join with per-column coalesce, which shuffles both sides
    AND rewrites every column expression.  Snapshot maintenance at 100 TB
    additionally partitions the output by the key's bucket so tomorrow's
    merge prunes to dirty partitions; the transform is the same.

    Like SQL MERGE / Delta merge, an updates batch with MORE than one row
    per key is rejected (an eager bounded agg over the update side — same
    loud-failure convention as dedup's block-size guard): silently passing
    both rows through would corrupt the snapshot's primary key.
    """
    dups = (
        updates.groupBy(*key_cols)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dups:
        raise ValueError(
            f"merge_upsert: updates batch has multiple rows for key "
            f"{tuple(dups[0][c] for c in key_cols)}; deduplicate the batch "
            "(e.g. keep the latest by a version column) before merging"
        )
    untouched = base.join(
        updates.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    return updates.unionByName(untouched)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic update batch: every 7th order repriced (+100), every
    # 1000th re-keyed high (simulating inserts of unseen keys).
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    repriced = orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") + 100.0, 2)
    )
    inserts = orders.filter(F.col("o_orderkey") % 1000 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 1000000000
    )
    merged = merge_upsert(
        orders, repriced.unionByName(inserts), ["o_orderkey"]
    )
    return merged.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "o_orderpriority"
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    *,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change feed to a base snapshot (the lakehouse
    change-data-capture primitive: op ∈ {'I','U','D'} rows ordered by
    `seq_col`).  Per key, the LATEST change wins: D removes the key, I/U
    replace the row; untouched base keys pass through.  Callers must make
    (key, seq) unique — ties get a deterministic op tie-break but
    mean the feed itself is ambiguous.

    Scale shape: the window runs over the CHANGE FEED only (a day's
    changes, not the snapshot) — one key shuffle of the feed; the base
    pays one anti-join key shuffle and is never windowed.  Same
    partition-pruning note as merge_upsert: bucket the snapshot by key so
    tomorrow's apply prunes to dirty partitions.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    surviving = latest.filter(F.col(op_col) != "D").drop(op_col, seq_col)
    # Touched keys == distinct change keys (every changed key has a latest
    # row) — anti-joining on the raw feed's distinct keys instead of on
    # `latest` keeps the window subtree out of the second union branch, so
    # the feed is windowed once, not once per branch (plan-pinned).  The
    # anti-join is NULL-SAFE: `on=key_cols` never matches a NULL key, so a
    # change to a null-keyed base row would silently leave the old row in
    # place next to the new one (window partitioning already treats NULL
    # as a value — the join must agree).
    touched = changes.select(
        *[F.col(c).alias(f"_k_{c}") for c in key_cols]
    ).distinct()
    anti_cond = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_k_{c}")) for c in key_cols],
    )
    untouched = base.join(touched, anti_cond, "left_anti")
    return surviving.unionByName(untouched)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Generate the I/U/D change feed between two snapshots (the inverse
    of cdc_apply): keys only in `new` → I, only in `old` → D, in both with
    any value difference → U; identical rows emit nothing.  Output is the
    new-side row (old values for D) plus an `op` column —
    cdc_apply(old, snapshot_diff(old, new) + seq, keys) reproduces `new`.

    One full outer join on the key — both sides shuffle once; the value
    comparison is a null-safe struct equality, no per-column join
    conditions.  At 100 TB both snapshots bucket by the key so the join is
    zero-exchange (sources/bucketed.py layout).
    """
    val_cols = [c for c in new.columns if c not in key_cols]
    # Literal presence markers, NOT key-isNotNull: the key join is
    # null-safe (a NULL key is a legal key value), so key nullness cannot
    # distinguish "side absent" from "side present with a NULL key" — the
    # isNotNull spelling mislabeled null-key updates as inserts AND took
    # the old side's values (review fix, round-trip-pinned with null keys).
    n = new.withColumn("_n_present", F.lit(1))
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in old.columns]
    ).withColumn("_o_present", F.lit(1))
    cond = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_o_{c}")) for c in key_cols],
    )
    joined = n.join(o, cond, "full_outer")
    new_key_present = F.col("_n_present").isNotNull()
    old_key_present = F.col("_o_present").isNotNull()
    same_values = F.struct(*val_cols).eqNullSafe(
        F.struct(*[F.col(f"_o_{c}").alias(c) for c in val_cols])
    )
    op = (
        F.when(~old_key_present, F.lit("I"))
        .when(~new_key_present, F.lit("D"))
        .when(~same_values, F.lit("U"))
    )
    out_cols = [
        F.coalesce(F.col(c), F.col(f"_o_{c}")).alias(c) for c in key_cols
    ] + [
        F.when(new_key_present, F.col(c))
        .otherwise(F.col(f"_o_{c}"))
        .alias(c)
        for c in val_cols
    ]
    return joined.withColumn("op", op).filter(F.col("op").isNotNull()).select(
        *out_cols, "op"
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Old = orders; new = the cdc-applied snapshot shape: reprice %7,
    # delete %14, insert high keys — diffing back must recover exactly
    # those I/U/D rows.
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderpriority",
    )
    k = F.col("o_orderkey")
    new = (
        base.filter((k % 14 != 0))
        .withColumn(
            "o_totalprice",
            F.when(
                k % 7 == 0, F.round(F.col("o_totalprice") + 50.0, 2)
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            base.filter(k % 1000 == 0).withColumn(
                "o_orderkey", k + 2000000000
            )
        )
    )
    return snapshot_diff(base, new, ["o_orderkey"])


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic change feed over the orders snapshot: seq 1 reprices
    # every 7th key (U) and inserts unseen high keys (I); seq 2 deletes
    # every 14th key — proving latest-wins over the earlier reprice.
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    k = F.col("o_orderkey")
    u1 = (
        base.filter(k % 7 == 0)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") + 50.0, 2))
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(1))
    )
    i1 = (
        base.filter(k % 1000 == 0)
        .withColumn("o_orderkey", k + 2000000000)
        .withColumn("op", F.lit("I"))
        .withColumn("seq", F.lit(1))
    )
    d2 = base.filter(k % 14 == 0).select(
        "o_orderkey",
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.lit("D").alias("op"),
        F.lit(2).alias("seq"),
    )
    applied = cdc_apply(
        base, u1.unionByName(i1).unionByName(d2), ["o_orderkey"]
    )
    return applied.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderpriority",
    )


def q_full_outer_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FULL OUTER join + null-fill (the one join type the inventory lacked).
    # The disjoint nationkey filters (<20 vs ≥5) structurally guarantee
    # left-only, right-only, and matched rows at any SF.  Both sides are
    # pre-aggregated to nation cardinality before the join, so the full
    # outer join itself is over two bounded frames — at 100 TB the shuffles
    # are the two groupBys, both linear with map-side partial agg.
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 20)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") >= 5)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(
        sup, cust.c_nationkey == sup.s_nationkey, "full"
    ).select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


def q_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q13 shape: LEFT join so order-less customers count as 0, per-
    # customer order count, then the distribution of those counts.  Two
    # linear shuffles (custkey join+agg, then the tiny count-of-counts agg —
    # its key cardinality is max orders per customer, bounded at any SF).
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q10 shape: lost-revenue report — customers ranked by revenue on
    # RETURNED line items within one order quarter.  The returnflag filter
    # prunes lineitem at the scan; the quarter filter prunes orders; the
    # join then runs over two pre-filtered fact sides (shuffle on the join
    # keys, AQE picks broadcast for whichever side collapses); nation is a
    # bounded dim → explicit broadcast.
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(decimal_sum(revenue).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q22 shape: customers with above-average balance and NO orders,
    # aggregated per nation.  Exercises a global scalar aggregate (exact
    # DECIMAL avg over positive balances, broadcast back as a 1-row frame —
    # a bounded cross join, not a shuffle) plus a left-anti join against
    # the orders fact (shuffle on custkey; at 100 TB AQE turns the
    # pre-aggregated distinct-custkey side into a broadcast when it fits).
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    threshold = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(exact_avg("c_acctbal").alias("_avg_bal"))
    )
    return (
        cust.join(F.broadcast(threshold))  # 1-row scalar, bounded cross
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            decimal_sum("c_acctbal").alias("total_bal"),
        )
    )


def q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q16 shape: per (brand, size) distinct-supplier count, with the
    # supplier-part relation derived from lineitem.  COUNT(DISTINCT) over a
    # join: Catalyst plans it as the two-stage distinct-then-count expand —
    # the (partkey,suppkey) dedup happens BEFORE the part join, shrinking
    # the join input to the distinct relation; part joins on partkey
    # (AQE broadcast at bounded part sizes, shuffle when part grows).
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_revenue_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact percentiles (linear interpolation) of extendedprice per
    # returnflag.  Exact percentile buffers a full sorted group per
    # aggregation state — fine here because the group count is bounded (3
    # return flags) and this is the oracle-checkable twin; the 100 TB scale
    # path for unbounded groups is approx_percentile (registered under
    # approx_aggs, rows-only).  Spark's percentile() and DuckDB's
    # quantile_cont share the rank = p*(n-1) interpolation, so rounded
    # outputs hash-match bit-for-bit.
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.percentile("l_extendedprice", 0.25), 6).alias("p25"),
        F.round(F.percentile("l_extendedprice", 0.5), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", 0.75), 6).alias("p75"),
        F.round(F.percentile("l_extendedprice", 0.99), 6).alias("p99"),
    )


def q_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rank-family window suite the inventory lacked: NTILE / PERCENT_RANK /
    # CUME_DIST over per-customer lifetime order value, partitioned by
    # market segment (parallel windows — no global sort; the total order
    # inside each partition is unique via the custkey tie-break, which is
    # what makes all three functions deterministic and cross-engine-stable).
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(decimal_sum("o_totalprice").alias("lifetime_value"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("lifetime_value"), F.asc("c_custkey")
    )
    return per_cust.select(
        "c_custkey",
        "c_mktsegment",
        "lifetime_value",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q6 shape: the pure filter+aggregate — no join, no groupBy key.
    # Every predicate (date range, discount band, quantity cap) is
    # scan-eligible, so at 100 TB the query cost is parquet row-group
    # pruning + one partial/final agg of the survivors; the global sum is
    # exact DECIMAL, so the single output row is bit-stable.
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        decimal_sum(
            F.col("l_extendedprice") * F.col("l_discount")
        ).alias("revenue_effect"),
        F.count(F.lit(1)).alias("n_items"),
    )


RFM_REFERENCE_DATE = "2002-01-01"  # just past the testdata's order range


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer RFM segmentation — the reference's own domain (customer
    segmentation, SURVEY.md §0) expressed as a deterministic relational
    query rather than a clustering fit: recency (days from last order to
    a fixed reference date, the P1 hard-coded-date pattern), frequency
    (order count), monetary (exact DECIMAL lifetime value), each scored
    1-4 by fixed thresholds.  Fixed thresholds, not quantile buckets, so
    scores are stable as the corpus grows and need no global sort; one
    custkey groupBy shuffle is the whole query."""
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        decimal_sum("o_totalprice").alias("monetary"),
    )
    recency = F.datediff(F.to_date(F.lit(RFM_REFERENCE_DATE)), F.col("_last"))
    r = (
        F.when(recency <= 365, 4)
        .when(recency <= 730, 3)
        .when(recency <= 1460, 2)
        .otherwise(1)
    )
    f = (
        F.when(F.col("frequency") >= 20, 4)
        .when(F.col("frequency") >= 10, 3)
        .when(F.col("frequency") >= 5, 2)
        .otherwise(1)
    )
    m = (
        F.when(F.col("monetary") >= 2000000.0, 4)
        .when(F.col("monetary") >= 1000000.0, 3)
        .when(F.col("monetary") >= 500000.0, 2)
        .otherwise(1)
    )
    return per_cust.select(
        "o_custkey",
        recency.alias("recency_days"),
        "frequency",
        "monetary",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
        F.concat(
            r.cast("string"), f.cast("string"), m.cast("string")
        ).alias("rfm_segment"),
    )


_TOP_SUPPLIER_SQL = """
    WITH revenue0 AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_revenue
        FROM {lineitem}
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM {supplier} JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape via the engine's SQL entry path: quarterly revenue
    view + scalar-subquery max, run as one `spark.sql` statement over
    registered temp views.  Catalyst plans the scalar subquery natively
    (Subquery + ReusedExchange — the revenue CTE is computed once and
    reused for both the join side and the MAX, no driver round-trip, no
    nested-loop join), and the revenue comparison is exact because both
    sides of the equality come from the same DECIMAL-summed frame.
    Dates prune the lineitem scan before the aggregation."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q15_lineitem")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("_q15_supplier")
    return spark.sql(
        _TOP_SUPPLIER_SQL.format(
            lineitem="_q15_lineitem", supplier="_q15_supplier"
        )
    )


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "customer_features": q_customer_features,
    "scan_projection": q_scan_projection,
    "derived_age": q_derived_age,
    "log_features": q_log_features,
    "scalar_functions": q_scalar_functions,
    "order_revenue": q_order_revenue,
    "customer_revenue_stats": q_customer_revenue_stats,
    "event_hit_rate": q_event_hit_rate,
    "distinct_pairs": q_distinct_pairs,
    "supplier_nation": q_supplier_nation,
    "left_join_fill": q_left_join_fill,
    "semi_anti_join": q_semi_anti_join,
    "row_number": q_row_number,
    "unpivot": q_unpivot,
    "distinct_priorities": q_distinct_priorities,
    "running_sum": q_running_sum,
    "window_suite": q_window_suite,
    "top_customers": q_top_customers,
    "set_ops": q_set_ops,
    "pricing_summary": q_pricing_summary,
    "top_orders": q_top_orders,
    "region_volume": q_region_volume,
    "nation_trade_volume": q_nation_trade_volume,
    "promo_revenue_share": q_promo_revenue_share,
    "order_count_histogram": q_order_count_histogram,
    "full_outer_fill": q_full_outer_fill,
    "merge_upsert": q_merge_upsert,
    "cdc_apply": q_cdc_apply,
    "snapshot_diff": q_snapshot_diff,
    "large_orders": q_large_orders,
    "collection_functions": q_collection_functions,
    "returned_items": q_returned_items,
    "idle_rich_customers": q_idle_rich_customers,
    "part_supplier_counts": q_part_supplier_counts,
    "revenue_percentiles": q_revenue_percentiles,
    "revenue_deciles": q_revenue_deciles,
    "top_supplier": q_top_supplier,
    "customer_rfm": q_customer_rfm,
    "forecast_revenue": q_forecast_revenue,
}

ORACLES: dict[str, str] = {
    "top_supplier": _TOP_SUPPLIER_SQL.format(
        lineitem="lineitem", supplier="supplier"
    ),
    "forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue_effect,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "customer_rfm": """
        WITH per_cust AS (
            SELECT o_custkey,
                   MAX(CAST(o_orderdate AS DATE)) AS last_order,
                   COUNT(*) AS frequency,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                       AS monetary
            FROM orders GROUP BY o_custkey
        ), scored AS (
            SELECT o_custkey,
                   datediff('day', last_order, DATE '2002-01-01') AS recency_days,
                   frequency, monetary,
                   CASE WHEN datediff('day', last_order, DATE '2002-01-01') <= 365 THEN 4
                        WHEN datediff('day', last_order, DATE '2002-01-01') <= 730 THEN 3
                        WHEN datediff('day', last_order, DATE '2002-01-01') <= 1460 THEN 2
                        ELSE 1 END AS r_score,
                   CASE WHEN frequency >= 20 THEN 4
                        WHEN frequency >= 10 THEN 3
                        WHEN frequency >= 5 THEN 2
                        ELSE 1 END AS f_score,
                   CASE WHEN monetary >= 2000000.0 THEN 4
                        WHEN monetary >= 1000000.0 THEN 3
                        WHEN monetary >= 500000.0 THEN 2
                        ELSE 1 END AS m_score
            FROM per_cust
        )
        SELECT o_custkey, CAST(recency_days AS INT) AS recency_days,
               frequency, monetary,
               CAST(r_score AS INT) AS r_score,
               CAST(f_score AS INT) AS f_score,
               CAST(m_score AS INT) AS m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                   || CAST(m_score AS VARCHAR) AS rfm_segment
        FROM scored
    """,
    "returned_items": """
        SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal, n_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o_orderdate AS DATE) <  DATE '1996-04-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "idle_rich_customers": """
        WITH thr AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c_acctbal)
                       AS avg_bal
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey,
               COUNT(*) AS n_custs,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
        FROM customer, thr
        WHERE c_acctbal > thr.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """,
    "part_supplier_counts": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM ps JOIN part ON l_partkey = p_partkey
        WHERE p_size <= 25
        GROUP BY p_brand, p_size
    """,
    "revenue_percentiles": """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
               ROUND(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
               ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
        FROM lineitem GROUP BY l_returnflag
    """,
    "revenue_deciles": """
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                       AS lifetime_value
            FROM orders GROUP BY o_custkey
        )
        SELECT c_custkey, c_mktsegment, lifetime_value,
               CAST(NTILE(10) OVER w AS INT) AS decile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cum_dist
        FROM per_cust JOIN customer ON o_custkey = c_custkey
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY lifetime_value DESC, c_custkey ASC)
    """,
    "customer_features": _FLAGSHIP_SQL,
    "scan_projection": "SELECT c_custkey, c_name, c_acctbal FROM customer",
    "derived_age": """
        SELECT o_orderkey,
               datediff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') / 365 AS order_age
        FROM orders
    """,
    "log_features": """
        SELECT c_custkey,
               CASE WHEN c_acctbal > 0 THEN ROUND(LN(c_acctbal), 6) END AS log_acctbal
        FROM customer
    """,
    "scalar_functions": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               UPPER(o_orderstatus) AS status_upper,
               SUBSTRING(o_orderpriority, 1, 1) AS priority_code,
               CAST(LENGTH(o_orderpriority) AS INT) AS priority_len,
               o_orderstatus || '-' || o_orderpriority AS status_priority
        FROM orders
    """,
    "order_revenue": """
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                   AS order_revenue
        FROM lineitem GROUP BY l_orderkey
    """,
    "customer_revenue_stats": """
        WITH per_order AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                       AS order_revenue
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT o_custkey,
               CAST(SUM(CAST(order_revenue AS DECIMAL(18,6))) AS DOUBLE) / COUNT(order_revenue)
                   AS avg_buy,
               MIN(order_revenue) AS min_buy,
               MAX(order_revenue) AS max_buy
        FROM per_order JOIN orders ON per_order.l_orderkey = orders.o_orderkey
        GROUP BY o_custkey
    """,
    "event_hit_rate": """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS hit_rate
        FROM events GROUP BY user_id
    """,
    "distinct_pairs": "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "supplier_nation": """
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
    "left_join_fill": """
        SELECT c_custkey, COALESCE(n_orders, 0) AS n_orders
        FROM customer LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
        ) o ON c_custkey = o.o_custkey
    """,
    "semi_anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          AND NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
    """,
    "row_number": """
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS INT) AS rn
        FROM orders
    """,
    "unpivot": """
        WITH per_order AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                       AS order_revenue
            FROM lineitem GROUP BY l_orderkey
        ), stats AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(order_revenue AS DECIMAL(18,6))) AS DOUBLE) / COUNT(order_revenue)
                       AS avg_buy,
                   MIN(order_revenue) AS min_buy,
                   MAX(order_revenue) AS max_buy
            FROM per_order JOIN orders ON per_order.l_orderkey = orders.o_orderkey
            GROUP BY o_custkey
        )
        UNPIVOT stats ON avg_buy, min_buy, max_buy INTO NAME feature VALUE value
    """,
    "distinct_priorities": "SELECT DISTINCT o_orderpriority FROM orders",
    "window_suite": """
        SELECT o_custkey, o_orderkey,
               CAST(datediff('day',
                    LAG(CAST(o_orderdate AS DATE), 1) OVER w,
                    CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev,
               LEAD(o_orderkey, 1) OVER w AS next_orderkey,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER wf AS DOUBLE)
                     / COUNT(*) OVER wf, 6) AS moving_avg_3
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
               wf AS (PARTITION BY o_custkey
                      ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "running_sum": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total
        FROM orders
    """,
    "top_customers": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 20
    """,
    "set_ops": """
        SELECT c_mktsegment AS val FROM customer
        UNION
        SELECT o_orderpriority AS val FROM orders
        EXCEPT
        SELECT 'BUILDING' AS val
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                    AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity)
                   AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice)
                   AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount)
                   AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_orders": """
        SELECT o_orderkey, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
    "promo_revenue_share": """
        SELECT CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS ship_year,
               CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS ship_month,
               ROUND(100.0
                   * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                        THEN l_extendedprice * (1.0 - l_discount)
                                        ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                                   AS DECIMAL(18,6))) AS DOUBLE), 6)
                   AS promo_share_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    """,
    "nation_trade_volume": """
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
           OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9')
        GROUP BY 1, 2, 3
    """,
    "region_volume": """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "collection_functions": """
        WITH per_seg AS (
            SELECT o_orderpriority, c_mktsegment, COUNT(*) AS n
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ), agg AS (
            SELECT o_orderpriority,
                   list_sort(list(c_mktsegment)) AS segs,
                   CAST(SUM(n) AS BIGINT) AS n_orders
            FROM per_seg GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, n_orders,
               CAST(len(segs) AS INT) AS n_segments,
               list_contains(segs, 'BUILDING') AS has_building,
               array_to_string(segs[1:2], '|') AS first_two,
               array_to_string(segs, '|') AS segs_joined
        FROM agg
    """,
    "large_orders": """
        WITH big AS (
            SELECT l_orderkey, SUM(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 150
        )
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
               o_totalprice, total_qty
        FROM orders JOIN big ON o_orderkey = l_orderkey
    """,
    "merge_upsert": """
        WITH base AS (
            SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ), updates AS (
            SELECT o_orderkey, round(o_totalprice + 100.0, 2) AS o_totalprice,
                   o_orderpriority
            FROM base WHERE o_orderkey % 7 = 0
            UNION ALL
            SELECT o_orderkey + 1000000000, o_totalprice, o_orderpriority
            FROM base WHERE o_orderkey % 1000 = 0
        )
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
               o_orderpriority
        FROM (
            SELECT * FROM updates
            UNION ALL
            SELECT * FROM base
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        )
    """,
    "snapshot_diff": """
        WITH base AS (
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
                   o_orderpriority
            FROM orders
        ), new AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0
                        THEN round(o_totalprice + 50.0, 2)
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderpriority
            FROM base WHERE o_orderkey % 14 != 0
            UNION ALL
            SELECT o_orderkey + 2000000000, o_totalprice, o_orderpriority
            FROM base WHERE o_orderkey % 1000 = 0
        ), diffed AS (
            SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
                   CASE WHEN n.o_orderkey IS NOT NULL
                        THEN n.o_totalprice ELSE o.o_totalprice
                        END AS o_totalprice,
                   CASE WHEN n.o_orderkey IS NOT NULL
                        THEN n.o_orderpriority ELSE o.o_orderpriority
                        END AS o_orderpriority,
                   CASE WHEN o.o_orderkey IS NULL THEN 'I'
                        WHEN n.o_orderkey IS NULL THEN 'D'
                        WHEN n.o_totalprice IS DISTINCT FROM o.o_totalprice
                          OR n.o_orderpriority IS DISTINCT FROM o.o_orderpriority
                        THEN 'U' END AS op
            FROM new n FULL OUTER JOIN base o ON n.o_orderkey = o.o_orderkey
        )
        SELECT * FROM diffed WHERE op IS NOT NULL
    """,
    "cdc_apply": """
        WITH base AS (
            SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ), changes AS (
            SELECT o_orderkey, round(o_totalprice + 50.0, 2) AS o_totalprice,
                   o_orderpriority, 'U' AS op, 1 AS seq
            FROM base WHERE o_orderkey % 7 = 0
            UNION ALL
            SELECT o_orderkey + 2000000000, o_totalprice, o_orderpriority,
                   'I' AS op, 1 AS seq
            FROM base WHERE o_orderkey % 1000 = 0
            UNION ALL
            SELECT o_orderkey, NULL, NULL, 'D' AS op, 2 AS seq
            FROM base WHERE o_orderkey % 14 = 0
        ), latest AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY o_orderkey ORDER BY seq DESC, op DESC
                ) AS rn
                FROM changes
            ) WHERE rn = 1
        )
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
               o_orderpriority
        FROM (
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM latest WHERE op != 'D'
            UNION ALL
            SELECT * FROM base
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
        )
    """,
    "full_outer_fill": """
        WITH c AS (
            SELECT c_nationkey, COUNT(*) AS n_cust
            FROM customer WHERE c_nationkey < 20 GROUP BY c_nationkey
        ), s AS (
            SELECT s_nationkey, COUNT(*) AS n_supp
            FROM supplier WHERE s_nationkey >= 5 GROUP BY s_nationkey
        )
        SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
               COALESCE(n_cust, 0) AS n_cust,
               COALESCE(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
    """,
    "order_count_histogram": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
}
