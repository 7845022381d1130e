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
        "similarity",
        "text",
        "multimodal",
        "analytics",
        "temporal",
        "curation",
    ):
        try:
            mods.append(
                __import__(
                    f"pyspark_kmeans_spark.operators.{name}", fromlist=[name]
                )
            )
        except ImportError:
            pass
    for name in ("streaming.events", "ml.queries", "ml.quality", "sources.bucketed"):
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
# decides what gets validated each round).  Rebuilt every round — VERDICT
# r2 item 1: lead with oracles the driver has NEVER hash-checked, then
# queries whose code changed this round, then no_oracle rows, then entries
# last recorded in round 1; the previous round's green hash rows go last
# (they rotate through whatever cap headroom remains).
_SWEEP_FIRST = [
    # 1. oracles the driver has never hash-checked (r2 sweep-cap artifact
    #    + the round-3 LSH oracle: plane literals embedded in the SQL)
    "dedup_clusters",
    "multimodal_features",
    "grouping_sets",
    "ann_lsh_topk",
    # 2. changed or added in round 3 (bucket cap / block guard / new queries)
    "source_quota_sample",
    "weighted_sample",
    "training_order",
    "dedup_semantic",
    "curation_pii",
    "curation_pack_sequences",
    "curation_importance",
    "event_sliding_rollup",
    "order_count_histogram",
    "full_outer_fill",
    "event_resample_ffill",
    "merge_upsert",
    "cdc_apply",
    "snapshot_diff",
    "event_view_click_join",
    "embedding_lang_norms",
    "large_orders",
    "collection_functions",
    "multimodal_frames",
    "event_segment_rollup",
    "curation_dup_ngrams",
    "curation_repetition",
    "curation_contamination",
    "curation_vocab",
    "bucketed_order_revenue",
    "approx_aggs",
    "dedup_incremental_lsh",
    "dedup_minhash_lsh",
    "dedup_lsh_kept",
    "dedup_clusters_lsh",
    "dedup_jaccard_pairs",
    "dedup_kept_docs",
    "dedup_incremental",
    "embedding_near_dups",
    # 3. remaining no_oracle rows (re-pin row-count determinism)
    "quality_classifier",
    "kmeans_centers",
    "kmeans_embedding_clusters",
    "dedup_simhash",
    "ann_ivf_topk",
    # 4. green in round 1, never re-recorded since
    "dedup_ngram_jaccard",
    "ann_topk_cosine",
    "text_token_counts",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_edit_distance",
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
