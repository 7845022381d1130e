"""The remaining TPC-H query shapes (Q2,Q4,Q8,Q9,Q11,Q12,Q17,Q19,Q20,Q21),
completing the 22-query suite across the repo (Q1/Q3/Q5/Q6/Q7/Q10/Q13/Q14/
Q15/Q16/Q18/Q22 live in relational.py / segmentation.py).

The driver testdata is a trimmed TPC-H: no partsupp table and no
commitdate/receiptdate/shipmode/container lineitem columns.  Each query
keeps the CANONICAL PLAN SHAPE of its TPC-H counterpart (that is what the
engine must execute well at 100 TB) with the missing columns substituted by
documented derivations over the columns that exist:

 - partsupp           -> the distinct (l_partkey, l_suppkey) relation with
                         unit cost  min(l_extendedprice / l_quantity)
                         (Q2) or shipped-quantity totals (Q11, Q20);
 - receipt > commit   -> l_shipdate > o_orderdate + N days ("late ship");
 - l_shipmode buckets -> ship-delay buckets datediff(shipdate, orderdate).

Determinism follows relational.py's rules: money sums via DECIMAL
(functions/exact.py), division outputs rounded to 6, every LIMIT under a
total ORDER BY with a unique tie-break key.

Scale notes are per-query docstrings; the common pattern: bounded dims
(part 2k rows/SF-invariant vocabularies, supplier, nation, region) are
explicit broadcasts; fact-fact joins shuffle on their keys and AQE
(session.py) handles skew + the shrink-to-broadcast cases.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_kmeans_spark.functions.exact import decimal_sum
from pyspark_kmeans_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-cost supplier per part within one region.

    partsupp is derived from lineitem: unit_cost(part, supp) =
    MIN(l_extendedprice / l_quantity).  The correlated `= (SELECT MIN …)`
    becomes a per-part MIN aggregate joined back on (partkey, cost) — the
    standard decorrelation Catalyst itself would produce.  supplier/nation/
    region are bounded dims (broadcast); the unit-cost aggregate shuffles
    once on (partkey, suppkey), its per-part MIN re-aggregates partial →
    final.  Cost equality joins on the UNROUNDED double: both sides are
    MINs over the identical value set, so the equality is exact.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD")
        & (F.col("p_size") >= 10)
        & (F.col("p_size") <= 20)
    )
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    eligible_sup = (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    supply = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
        )
        .join(F.broadcast(eligible_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    min_cost = supply.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("unit_cost").alias("_min_cost")
    )
    return (
        supply.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("_pk"))
            & (F.col("unit_cost") == F.col("_min_cost")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "s_suppkey",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"), F.asc("s_suppkey"),
        )
        .limit(100)
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — orders in one quarter with
    at least one late line (EXISTS → left-semi join).  receipt>commit is
    unavailable, so "late" = l_shipdate > o_orderdate + 30 days.  The semi
    join is equi on orderkey with the lateness as a residual predicate;
    orders is pre-filtered to the quarter at the scan (partition-prunable
    on a date-partitioned layout), lineitem projects 2 columns.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-07-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (
                F.to_date("l_shipdate")
                > F.date_add(F.to_date("o_orderdate"), 30)
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — of the ECONOMY-part revenue
    sold into the ASIA market, the share supplied by NATION_5, per order
    year.  Snowflake join over both dimension arms (customer→nation→region
    restricts the market; supplier→nation tags the origin), part filter
    broadcast-pruned into the lineitem scan.  Share = conditional decimal
    sum / total decimal sum — both order-independent, so the final division
    is bit-stable and ROUND(…,6) matches the oracle exactly.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    nation_vol = F.when(F.col("n2.n_name") == "NATION_5", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n2), sup.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(decimal_sum(nation_vol) / decimal_sum(vol), 6).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by supplier nation and order
    year.  ps_supplycost is unavailable; cost proxy = 0.1 * p_retailprice *
    l_quantity (documented, deterministic), so
    amount = l_extendedprice*(1-l_discount) − 0.1*p_retailprice*l_quantity.
    part ('red' parts) and supplier/nation broadcast; the fact-fact
    lineitem⋈orders shuffles on orderkey; one grouped decimal sum.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) - (
        F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(decimal_sum(amount).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: important stock — parts whose traded value through
    NATION_9 suppliers exceeds a fraction of the total.  Value(part) =
    Σ l_extendedprice over lines supplied by that nation's suppliers
    (partsupp availqty·supplycost proxy).  The `HAVING > (SELECT SUM…)`
    global scalar becomes a 1-row aggregate broadcast back over the
    per-part frame — a bounded cross join, not a shuffle; the per-part agg
    itself shuffles once on partkey with map-side partials.
    """
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    nation_sup = sup.join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    per_part = (
        li.join(F.broadcast(nation_sup), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(decimal_sum("l_extendedprice").alias("value"))
    )
    total = per_part.agg(decimal_sum("value").alias("_total"))
    return (
        per_part.join(F.broadcast(total))  # 1-row scalar, bounded cross
        .filter(F.col("value") > F.lit(0.001) * F.col("_total"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
        .orderBy(F.desc("value"), F.asc("p_partkey"))
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: shipping buckets × order priority — conditional
    aggregation after a fact-fact join.  l_shipmode is unavailable; the
    two-value dimension is the ship-delay bucket ('slow' ≥ 30 days else
    'fast').  One shuffle for the orderkey join (AQE), one grouped
    CASE-WHEN sum over 2 groups.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = F.when(delay >= 30, F.lit("slow")).otherwise(F.lit("fast"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue — lines of one brand
    below 20% of that part's average quantity.  The correlated AVG becomes
    a per-part aggregate joined back (partkey equi-join); the brand filter
    is applied FIRST (broadcast part dim) so both the aggregate and the
    probe side run over the pruned fact.  avg(l_quantity) is a sum of
    integer-valued doubles — exact in any order, so the 0.2·avg threshold
    is bit-identical to the oracle's.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    thresh = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("_qty_thresh")
    )
    return (
        li.join(F.broadcast(thresh), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_qty_thresh"))
        .agg(
            F.round(decimal_sum("l_extendedprice") / F.lit(7.0), 6).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under an OR-of-ANDs predicate
    spanning both join sides (brand/size from part, quantity from
    lineitem).  The disjunction cannot be pushed below the join as a
    whole, but its per-side envelopes can: Catalyst pushes
    `p_brand IN (…)` into the part scan and the quantity envelope into
    lineitem; the residual OR evaluates post-join (broadcast — part is
    bounded).  Single-row output: decimal revenue + line count.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            decimal_sum(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers with excess supply of a part family —
    nested IN-subqueries become a semi-join chain.  availqty is
    unavailable: a (part, supplier) pair qualifies when its 1996 shipped
    quantity exceeds 100 (the 0.5·availqty proxy, documented).  Chain:
    'bolt' parts (broadcast) semi-restrict the per-(part,supp) quantity
    aggregate; qualifying suppkeys semi-restrict supplier; nation filter
    last.  Every join side is bounded or pre-aggregated — no fact-fact
    shuffle survives.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_6")
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(shipped, sup.s_suppkey == shipped.l_suppkey, "left_semi")
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept orders waiting — the
    EXISTS / NOT-EXISTS pair becomes a left-semi + left-anti join with a
    suppkey-inequality residual.  "Late" = l_shipdate > o_orderdate + 60
    days (receipt>commit proxy); orders restricted to status 'F'.  All
    three lineitem arms are equi-joined on orderkey (one co-partitioned
    shuffle family, AQE-handled); supplier is a broadcast dim restricted
    to NATION_9.  Counts l1 rows per supplier, as the canonical query does.
    """
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60)
    )
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    nation_sup = sup.join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "s_name")

    l1 = late.join(
        F.broadcast(nation_sup), F.col("l_suppkey") == F.col("s_suppkey")
    ).select(
        F.col("l_orderkey").alias("_ok"),
        F.col("l_suppkey").alias("_sk"),
        "s_name",
    )
    l2 = li.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    return (
        l1.join(
            l2,
            (F.col("_ok") == F.col("_ok2")) & (F.col("_sk") != F.col("_sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("_ok") == F.col("_ok3")) & (F.col("_sk") != F.col("_sk3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tpch_q2": q_tpch_q2,
    "tpch_q4": q_tpch_q4,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q17": q_tpch_q17,
    "tpch_q19": q_tpch_q19,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
}


ORACLES: dict[str, str] = {
    "tpch_q2": """
        WITH eligible_sup AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), supply AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), joined AS (
            SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_brand,
                   s.s_suppkey, sp.unit_cost
            FROM supply sp
            JOIN eligible_sup s ON sp.l_suppkey = s.s_suppkey
            JOIN part p ON sp.l_partkey = p.p_partkey
            WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
        )
        SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
               p_brand, s_suppkey, ROUND(unit_cost, 6) AS unit_cost
        FROM joined j
        WHERE unit_cost = (
            SELECT MIN(unit_cost) FROM joined j2
            WHERE j2.p_partkey = j.p_partkey
        )
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
        LIMIT 100
    """,
    "tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
          AND CAST(o_orderdate AS DATE) <  DATE '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND CAST(l_shipdate AS DATE)
                    > CAST(o_orderdate AS DATE) + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
    """,
    "tpch_q8": """
        SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
               ROUND(
                   CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_5'
                                 THEN l_extendedprice * (1.0 - l_discount)
                                 ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                                   AS DECIMAL(18,6))) AS DOUBLE),
                   6) AS mkt_share
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
        GROUP BY 1 ORDER BY 1
    """,
    "tpch_q9": """
        SELECT n_name AS nation,
               CAST(YEAR(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                             - 0.1 * p_retailprice * l_quantity
                             AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    "tpch_q11": """
        WITH per_part AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                       AS value
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_9'
            GROUP BY l_partkey
        )
        SELECT l_partkey AS p_partkey, value
        FROM per_part
        WHERE value > 0.001 * (
            SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
            FROM per_part
        )
        ORDER BY value DESC, p_partkey
    """,
    "tpch_q12": """
        SELECT CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
                                  CAST(l_shipdate AS DATE)) >= 30
                    THEN 'slow' ELSE 'fast' END AS ship_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
        GROUP BY 1 ORDER BY 1
    """,
    "tpch_q17": """
        WITH li AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#12'
        ), thresh AS (
            SELECT l_partkey AS _pk, 0.2 * AVG(l_quantity) AS _qty_thresh
            FROM li GROUP BY l_partkey
        )
        SELECT ROUND(
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   / 7.0, 6) AS avg_yearly,
               COUNT(*) AS n_lines
        FROM li JOIN thresh ON l_partkey = _pk
        WHERE l_quantity < _qty_thresh
    """,
    "tpch_q19": """
        SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q20": """
        SELECT s_name, s_suppkey
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_6'
          AND s_suppkey IN (
              SELECT l_suppkey
              FROM lineitem
              WHERE l_partkey IN (
                        SELECT p_partkey FROM part
                        WHERE p_name LIKE '%bolt%'
                    )
                AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
                AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
              GROUP BY l_partkey, l_suppkey
              HAVING SUM(l_quantity) > 100.0
          )
        ORDER BY s_name, s_suppkey
    """,
    "tpch_q21": """
        WITH f_orders AS (
            SELECT o_orderkey, o_orderdate FROM orders
            WHERE o_orderstatus = 'F'
        ), late AS (
            SELECT l_orderkey, l_suppkey
            FROM lineitem JOIN f_orders ON l_orderkey = o_orderkey
            WHERE CAST(l_shipdate AS DATE)
                  > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM late l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_9'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM late l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
}
