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
# Round 6: the 20 stale rows last green in rounds 1-2 (VERDICT r5 "What's
# missing" #3) all rotate in, plus the first 23 of the round-3 cohort;
# the remaining 23 r3 rows are the round-7 rotation.
_SWEEP_FIRST = [
    # 0. added in round 6 — never driver-recorded
    "lsh_twowave_check",
    "daily_ingest_check",
    # 1. changed in round 6 (persisted IVF codebook; seed-keyed signature
    #    table name; explicit _verify_losers frame; wave ordering)
    "ann_ivf_assign",
    "daily_ingest_lsh",
    "dedup_incremental_lsh",
    "incremental_lsh_check",
    "dedup_lsh_kept",
    # 2. stale: last recorded in round 1
    "cube_agg",
    "deterministic_sample",
    "multimodal_metadata",
    "order_gap_stats",
    "pivot_linestatus",
    "rollup_agg",
    "salted_agg",
    "stats_agg",
    "text_rolling_hash",
    "top_tokens_per_lang",
    # 3. stale: last recorded in round 2
    "asof_last_order",
    "count_distinct",
    "event_dedup",
    "event_hourly_rollup",
    "event_user_sessions",
    "json_agg",
    "json_extract",
    "range_join_recent_orders",
    "standard_scaled",
    "stratified_sample",
    # 4. round-3 cohort, first half (a-to-e; the rest rotate in round 7)
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_topk_cosine",
    "approx_aggs",
    "bucketed_order_revenue",
    "cdc_apply",
    "collection_functions",
    "curation_contamination",
    "curation_dup_ngrams",
    "curation_importance",
    "curation_pack_sequences",
    "curation_pii",
    "curation_repetition",
    "dedup_clusters",
    "dedup_clusters_lsh",
    "dedup_incremental",
    "dedup_jaccard_pairs",
    "dedup_kept_docs",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_semantic",
    "dedup_simhash",
    "embedding_lang_norms",
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
