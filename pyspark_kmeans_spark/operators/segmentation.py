"""Customer-segmentation feature pipeline — the reference's core query.

Two faces of the same operator set (SURVEY.md §2.2-2.4):

1. The *compat* pipeline over the reference's five game-analytics CSV tables
   (users / buy-clicks / game-clicks / user-session / team), preserving every
   reference quirk behind explicit parameters:
     - P1 hard-coded reference date for age (utils/kmeans_utils.py:30)
     - A2 two-level aggregation: avg/min/max of per-SESSION revenue sums,
       not of raw prices (utils/kmeans_utils.py:36-38)
     - A4 dropDuplicates keeps one row per (userId, strength) pair — a user
       on multiple teams still multiplies rows through the left join
       (utils/kmeans_utils.py:48)
     - A5 na.fill(0) after the left join (utils/kmeans_utils.py:50)
     - P5 natural-log features, null for non-positive inputs
       (utils/kmeans_utils.py:63-64)
     - P6 positional feature slice columns[4:] (utils/kmeans_utils.py:68),
       exposed as an explicit default list.

2. The same pipeline shape over the driver's TPC-H-ish testdata
   (``customer_features``): per-customer revenue stats from lineitem/orders
   (two-level agg), event hit-rate, nation strength via left join + fill —
   the flagship query the driver smoke-checks and oracle-verifies.

Scale notes (100 TB design point):
 - All joins here are single-key equi-joins.  The fact-fact joins
   (lineitem⋈orders, features⋈events-agg) shuffle on the key; AQE picks
   sort-merge vs shuffled-hash and handles skew.  Dimension joins
   (nation-strength) are broadcast.
 - The two-level aggregation does a map-side partial agg at each level;
   level 2 reuses the level-1 shuffle partitioning when keys align
   (o_custkey agg after the l_orderkey agg requires one reshuffle — that is
   fundamental to the semantics, not an artifact).
 - No collect() anywhere; the result stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_kmeans_spark.functions.exact import decimal_sum, exact_avg

# Reference behavior: hard-coded "today" for age computation
# (utils/kmeans_utils.py:30).  Parameterized here.
COMPAT_REFERENCE_DATE = "2016-06-16"

# Reference behavior: features = _data.columns[4:] (utils/kmeans_utils.py:68)
# — includes raw max_buy, excludes raw avg_buy/min_buy.  Made explicit.
COMPAT_FEATURES = [
    "max_buy",
    "avg_isHit",
    "strength",
    "log_age",
    "log_avg_buy",
    "log_min_buy",
    "log_max_buy",
]

LOG_INPUT_COLS = ["age", "avg_buy", "min_buy", "max_buy"]


# --------------------------------------------------------------------------
# 1. Compat pipeline over the reference's five CSV tables
# --------------------------------------------------------------------------


def user_ages(users: DataFrame, reference_date: str = COMPAT_REFERENCE_DATE) -> DataFrame:
    """P1+P2: fractional age in years against a fixed reference date.

    Mirrors utils/kmeans_utils.py:30-32 (day-resolution datediff divided by
    365).  DELIBERATE SEMANTIC FIX vs the reference: its 'yyyy-mm-dd'
    pattern makes 'mm' minute-of-hour, so the month silently defaults to
    January and '2016-06-16' actually parsed as 2016-01-16 — the reference
    computed every age ~152 days smaller than intended.  This engine uses
    the correct 'yyyy-MM-dd', so ages differ from the reference's buggy
    output by that constant offset; pass reference_date='2016-01-16' to
    reproduce the reference's numeric behavior exactly.
    """
    age = F.datediff(F.to_date(F.lit(reference_date), "yyyy-MM-dd"), F.col("dob")) / 365
    return users.withColumn("age", age).select("userId", "age")


def session_revenue(buy_clicks: DataFrame) -> DataFrame:
    """A1: per (userId, userSessionId) revenue (utils/kmeans_utils.py:36)."""
    return buy_clicks.groupBy("userId", "userSessionId").agg(
        decimal_sum("price").alias("revenue")
    )


def user_revenue_stats(per_session: DataFrame) -> DataFrame:
    """A2: two-level agg — avg/min/max of per-session revenue sums
    (utils/kmeans_utils.py:37-38)."""
    return per_session.groupBy("userId").agg(
        exact_avg("revenue").alias("avg_buy"),
        F.min("revenue").alias("min_buy"),
        F.max("revenue").alias("max_buy"),
    )


def user_hit_rate(game_clicks: DataFrame) -> DataFrame:
    """A3: mean of a 0/1 column per user (utils/kmeans_utils.py:42)."""
    return game_clicks.groupBy("userId").agg(F.mean("isHit").alias("avg_isHit"))


def user_strengths(user_session: DataFrame, team: DataFrame) -> DataFrame:
    """J1+A4+P4: session⋈team on teamId, project (userId, strength),
    dropDuplicates (utils/kmeans_utils.py:48).

    A user on multiple teams keeps multiple rows — reference semantics,
    pinned by tests.  ``team`` is broadcast: team tables are dimension-sized.
    """
    return (
        user_session.join(F.broadcast(team), on="teamId", how="inner")
        .select("userId", "strength")
        .dropDuplicates()
    )


def load_features(
    users: DataFrame,
    buy_clicks: DataFrame,
    game_clicks: DataFrame,
    user_session: DataFrame,
    team: DataFrame,
    reference_date: str = COMPAT_REFERENCE_DATE,
) -> DataFrame:
    """J2-J4 + A5: the full reference feature table
    (utils/kmeans_utils.py:15-52).

    Inner joins drop users without purchases or game clicks; the strengths
    join is LEFT with null→0 fill (reference semantics, utils/kmeans_utils.py:50).
    """
    ages = user_ages(users, reference_date)
    revenues = user_revenue_stats(session_revenue(buy_clicks))
    hits = user_hit_rate(game_clicks)
    strengths = user_strengths(user_session, team)
    joined = (
        ages.join(revenues, on="userId", how="inner")
        .join(hits, on="userId", how="inner")
        .join(strengths, on="userId", how="left")
    )
    # Reference fills every numeric null; only `strength` can be null here.
    return joined.na.fill(0, subset=["strength"])


def add_log_features(df: DataFrame, cols: list[str] = None) -> DataFrame:
    """P5: natural-log feature columns; null for non-positive inputs
    (utils/kmeans_utils.py:63-64)."""
    for c in cols or LOG_INPUT_COLS:
        df = df.withColumn(f"log_{c}", F.log(F.col(c)))
    return df


def prepare_data(
    users: DataFrame,
    buy_clicks: DataFrame,
    game_clicks: DataFrame,
    user_session: DataFrame,
    team: DataFrame,
    reference_date: str = COMPAT_REFERENCE_DATE,
) -> tuple[DataFrame, list[str]]:
    """Full prepare_data equivalent (utils/kmeans_utils.py:55-68), up to and
    including the feature-name selection.  Vectorize/scale lives in
    pyspark_kmeans_spark.ml.features."""
    data = load_features(users, buy_clicks, game_clicks, user_session, team, reference_date)
    data = add_log_features(data)
    return data, list(COMPAT_FEATURES)


# --------------------------------------------------------------------------
# 2. Flagship analog over the driver testdata (customer / orders / lineitem /
#    events / supplier) — same operator shapes, oracle-checkable.
# --------------------------------------------------------------------------

# Fixed reference date for the "customer age" derived column: days since the
# customer's first order, as fractional years (P1 analog).
TESTDATA_REFERENCE_DATE = "2026-01-01"


def order_revenue(lineitem: DataFrame) -> DataFrame:
    """A1 analog: per-order revenue sum over lineitem."""
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return lineitem.groupBy("l_orderkey").agg(decimal_sum(rev).alias("order_revenue"))


def customer_revenue_stats(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """A2 analog: two-level agg — per-order revenue, re-aggregated per
    customer as avg/min/max.  lineitem⋈orders is the big shuffle join; at
    100 TB this is a sort-merge join on l_orderkey (AQE-managed)."""
    per_order = order_revenue(lineitem)
    joined = per_order.join(
        orders.select("o_orderkey", "o_custkey"),
        per_order.l_orderkey == orders.o_orderkey,
        "inner",
    )
    return joined.groupBy("o_custkey").agg(
        exact_avg("order_revenue").alias("avg_buy"),
        F.min("order_revenue").alias("min_buy"),
        F.max("order_revenue").alias("max_buy"),
    )


def customer_ages(orders: DataFrame, reference_date: str = TESTDATA_REFERENCE_DATE) -> DataFrame:
    """P1 analog: fractional years between a fixed date and the customer's
    first order date."""
    first_order = F.min(F.to_date("o_orderdate")).alias("first_order")
    per_cust = orders.groupBy("o_custkey").agg(first_order)
    age = F.datediff(F.to_date(F.lit(reference_date), "yyyy-MM-dd"), F.col("first_order")) / 365
    return per_cust.select(F.col("o_custkey"), age.alias("age"))


def customer_hit_rate(events: DataFrame, hit_type: str = "purchase") -> DataFrame:
    """A3 analog: per-user mean of a 0/1 indicator (event_type == hit_type).

    Spelled as exact-int SUM / COUNT so the double result is bit-identical
    to any oracle regardless of aggregation order."""
    is_hit = F.when(F.col("event_type") == hit_type, 1).otherwise(0)
    return events.groupBy("user_id").agg(
        (F.sum(is_hit).cast("double") / F.count(F.lit(1))).alias("hit_rate")
    )


def nation_strengths(supplier: DataFrame) -> DataFrame:
    """J1/A4 analog: per-nation 'strength' = max supplier account balance.
    Dimension-sized at any SF → broadcast into the left join."""
    return supplier.groupBy("s_nationkey").agg(F.max("s_acctbal").alias("strength"))


def customer_features(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    events: DataFrame,
    supplier: DataFrame,
    reference_date: str = TESTDATA_REFERENCE_DATE,
) -> DataFrame:
    """Flagship query: the reference pipeline shape on the driver testdata.

    Output: one row per customer that has orders AND events, with
    (age, avg_buy, min_buy, max_buy, hit_rate, strength) + log features
    (rounded to 6 decimals — ln differs in the last ulp across runtimes).
    Join plan at scale: ages/revenues/hits shuffle on the customer key;
    nation-strength is broadcast; final fill(0) for strength nulls.
    """
    ages = customer_ages(orders, reference_date)
    revenues = customer_revenue_stats(lineitem, orders)
    hits = customer_hit_rate(events)
    strengths = nation_strengths(supplier)
    joined = (
        customer.select("c_custkey", "c_nationkey")
        .join(ages, customer.c_custkey == ages.o_custkey, "inner")
        .drop("o_custkey")
        .join(revenues, F.col("c_custkey") == revenues.o_custkey, "inner")
        .drop("o_custkey")
        .join(hits, F.col("c_custkey") == hits.user_id, "inner")
        .drop("user_id")
        .join(F.broadcast(strengths), F.col("c_nationkey") == strengths.s_nationkey, "left")
        .drop("s_nationkey")
        .na.fill(0, subset=["strength"])
        .drop("c_nationkey")
    )
    out = add_log_features(joined)
    for c in LOG_INPUT_COLS:
        out = out.withColumn(f"log_{c}", F.round(F.col(f"log_{c}"), 6))
    return out
