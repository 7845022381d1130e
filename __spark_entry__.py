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
    for name in (
        "dedup",
        "ingest",
        "similarity",
        "text",
        "multimodal",
        "analytics",
        "temporal",
        "curation",
        "graph",
        "tpch",
        "checks",
        "bpe",
    ):
        try:
            mods.append(
                __import__(
                    f"pyspark_kmeans_spark.operators.{name}", fromlist=[name]
                )
            )
        except ImportError:
            pass
    for name in (
        "streaming.events",
        "ml.queries",
        "ml.quality",
        "sources.bucketed",
        "sources.partitioned",
        "sources.sorted_layout",
        "sources.zorder",
    ):
        try:
            mods.append(
                __import__(
                    f"pyspark_kmeans_spark.{name}", fromlist=[name.split(".")[-1]]
                )
            )
        except ImportError:
            pass
    return mods


# Sweep priority (the driver caps its sweep at 50 entries, so ordering
# decides what gets validated each round).  Rebuilt every round: lead with
# oracles the driver has NEVER hash-checked (new queries), then queries
# whose code changed this round, then the entries least-recently recorded.
# Round 9: the three new rows (incremental pair-table maintenance gate;
# the full-trio daily-ingest flagship and its interaction twin), then
# curation_token_budget (null-safe lang report join + the two-level
# boundary-class fold — code changed, re-record), then ALL 37 remaining
# round-5-stale rows (alphabetical from dedup_exact, exactly where the
# round-8 rotation note said round 9 resumes — this closes the second
# cycle: after round 9 every oracle row's latest record is round 6 or
# newer).  41 of the 50 slots; the remainder falls through to
# registration order.  dedup_exact is both stale AND changed this round
# (aggregate keeper rewrite).
_SWEEP_FIRST = [
    # 0. added in round 9 — never driver-recorded
    "pairs_update_check",
    "daily_ingest_semantic",
    "daily_ingest_semantic_check",
    "curation_token_budget_per_lang",
    # 1. changed in round 9
    "curation_token_budget",
    # 2. stale: last recorded in round 5 (all 37 remaining, alphabetical;
    #    dedup_exact also carries the round-9 min_by keeper rewrite)
    "dedup_exact",
    "dedup_lsh_recall",
    "dedup_simhash_recall",
    "derived_age",
    "distinct_pairs",
    "distinct_priorities",
    "epoch_plan",
    "event_funnel",
    "event_hit_rate",
    "event_retention",
    "forecast_revenue",
    "hybrid_search",
    "left_join_fill",
    "log_features",
    "mixture_weights",
    "nation_trade_volume",
    "order_revenue",
    "pricing_summary",
    "promo_revenue_share",
    "quality_check",
    "region_volume",
    "row_number",
    "running_sum",
    "scalar_functions",
    "scan_projection",
    "semdedup_check",
    "semi_anti_join",
    "set_ops",
    "supplier_nation",
    "text_chunks",
    "text_tfidf",
    "top_customers",
    "top_orders",
    "training_order",
    "training_pipeline",
    "unpivot",
    "window_suite",
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
