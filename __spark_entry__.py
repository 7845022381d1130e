"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship customer-features query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions, each with a DuckDB oracle
where the semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark_kmeans_spark.operators.relational import q_customer_features

    return q_customer_features(spark, SF0001)


def _registries() -> list:
    from pyspark_kmeans_spark.operators import relational

    mods = [relational]
    for name in ("dedup", "similarity", "text", "multimodal", "analytics", "temporal"):
        try:
            mods.append(
                __import__(
                    f"pyspark_kmeans_spark.operators.{name}", fromlist=[name]
                )
            )
        except ImportError:
            pass
    for name in ("streaming.events", "ml.queries"):
        try:
            mods.append(
                __import__(
                    f"pyspark_kmeans_spark.{name}", fromlist=[name.split(".")[-1]]
                )
            )
        except ImportError:
            pass
    return mods


# Queries the driver has never recorded: the 11 the round-1 sweep cut off
# at 50 entries, plus everything added in round 2.  Listed first so that,
# whatever the sweep's cap is (time or row count), the never-validated
# queries get driver-checked this round; every query is cheap at the
# oracle SF (the full 73-query sweep runs in ~80 s at sf0.01).
_SWEEP_FIRST = [
    # unrecorded in CORRECTNESS_r01
    "standard_scaled",
    "asof_last_order",
    "range_join_recent_orders",
    "event_hourly_rollup",
    "event_user_sessions",
    "json_extract",
    "json_agg",
    "count_distinct",
    "approx_aggs",
    "kmeans_centers",
    "kmeans_embedding_clusters",
    # new in round 2
    "dedup_clusters_lsh",
    "dedup_incremental",
    "text_chunks",
    "text_tfidf",
    "training_pipeline",
    "event_dedup",
    "event_funnel",
    "event_retention",
    "stratified_sample",
    "window_suite",
    "nation_trade_volume",
    "promo_revenue_share",
]


def _prioritized(full: dict) -> dict:
    head = {k: full[k] for k in _SWEEP_FIRST if k in full}
    head.update({k: v for k, v in full.items() if k not in head})
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _registries():
        out.update(getattr(mod, "QUERIES", {}))
    return _prioritized(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _registries():
        out.update(getattr(mod, "ORACLES", {}))
    return _prioritized(out)
