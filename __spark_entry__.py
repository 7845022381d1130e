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
# Round 7: the 23 rows last recorded in round 3 (VERDICT r6 "What's
# missing" #2 — the promised rotation) plus the alphabetically-first 21 of
# the 44 rows last recorded in round 4 (two slots went to round-7-new
# queries instead); the remaining 23 r4 rows
# (part_supplier_counts..zorder_cust_window) are the round-8 rotation.
_SWEEP_FIRST = [
    # 0. added in round 7 — never driver-recorded
    "codebook_check",
    "streaming_ingest_check",
    "dedup_keep_best",
    "keep_best_lsh_check",
    # 1. changed in round 7 (lsh_twowave_check gained the
    #    n_over_cap_buckets scale-bound witness column; daily_ingest_check
    #    gained kept_exact's forcing count)
    "lsh_twowave_check",
    "daily_ingest_check",
    # 2. stale: last recorded in round 3
    "embedding_near_dups",
    "event_resample_ffill",
    "event_segment_rollup",
    "event_sliding_rollup",
    "event_view_click_join",
    "full_outer_fill",
    "grouping_sets",
    "kmeans_centers",
    "kmeans_embedding_clusters",
    "large_orders",
    "merge_upsert",
    "multimodal_features",
    "multimodal_frames",
    "order_count_histogram",
    "quality_classifier",
    "snapshot_diff",
    "source_quota_sample",
    "text_edit_distance",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_token_counts",
    "weighted_sample",
    # 3. stale: last recorded in round 4 (first 21 of 44, alphabetical)
    "ann_recall_check",
    "approx_aggs_check",
    "bpe_merges",
    "char_ngram_profile",
    "curation_lm_score",
    "curation_tokenize",
    "distinct_rollup_check",
    "embedding_matryoshka",
    "embedding_pca2_exact",
    "embedding_pca_variance",
    "embedding_quantize",
    "event_anomaly",
    "event_distinct_rollup",
    "event_trending",
    "graph_degrees",
    "graph_pagerank",
    "graph_triangles",
    "idle_rich_customers",
    "incremental_agg",
    "kmeans_check",
    "multimodal_dedup",
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
