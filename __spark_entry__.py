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
# ONLY oracle-backed rows occupy slots (VERDICT r9 "What's wrong" #2 —
# round 9 burned a slot on the rows-only `daily_ingest_semantic`, which
# can never be green; its hash twin carries its correctness and IS
# listed).  Round 10: the four NEW oracle rows (domain-level filtering
# pair, near-dup provenance, the PQ recall gate), then the three rows
# whose code changed this round (trio-check plan-string clamp + capped
# collect; pairs-check scratch memo invalidation; bucketed
# register-if-exists first-touch), then ALL 36 remaining round-6-stale
# rows (the union ledger's oldest tier, alphabetical), then the first 7
# round-7-stale rows alphabetically — 50 slots exactly (4 new +
# 3 changed + 36 + 7); round 11 resumes the round-7 tier at
# `embedding_matryoshka`.
_SWEEP_FIRST = [
    # 0. added in round 10 — never driver-recorded
    "curation_domain_stats",
    "curation_domain_filter",
    "graph_cross_source",
    "pq_recall_check",
    # 1. code changed in round 10 — re-record
    "daily_ingest_semantic_check",
    "pairs_update_check",
    "bucketed_order_revenue",
    # 2. stale: last recorded in round 6 (all 36 remaining, alphabetical)
    "ann_lsh_topk",
    "ann_topk_cosine",
    "asof_last_order",
    "collection_functions",
    "count_distinct",
    "cube_agg",
    "curation_contamination",
    "curation_dup_ngrams",
    "curation_importance",
    "curation_pack_sequences",
    "curation_pii",
    "curation_repetition",
    "dedup_clusters",
    "dedup_incremental",
    "dedup_jaccard_pairs",
    "dedup_kept_docs",
    "dedup_ngram_jaccard",
    "deterministic_sample",
    "embedding_lang_norms",
    "event_dedup",
    "event_hourly_rollup",
    "event_user_sessions",
    "incremental_lsh_check",
    "json_agg",
    "json_extract",
    "multimodal_metadata",
    "order_gap_stats",
    "pivot_linestatus",
    "range_join_recent_orders",
    "rollup_agg",
    "salted_agg",
    "standard_scaled",
    "stats_agg",
    "stratified_sample",
    "text_rolling_hash",
    "top_tokens_per_lang",
    # 3. stale: last recorded in round 7 (first 7, alphabetical;
    #    round 11 resumes here at embedding_matryoshka)
    "ann_recall_check",
    "approx_aggs_check",
    "char_ngram_profile",
    "curation_lm_score",
    "curation_tokenize",
    "daily_ingest_check",
    "distinct_rollup_check",
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
