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
# Round 8: the new codebook_update_check, the five rows whose code or
# columns changed this round, then the final 23 rows last recorded in
# round 4 (exactly the rotation VERDICT r7 item 1 demands — this closes
# the first full cycle: after round 8 every oracle row's latest record is
# round 5 or newer), then the alphabetically-first 8 of the 46 rows last
# recorded in round 5 plus graph_triangles_capped (also round-8-changed)
# to start the second cycle.  Round 9 resumes the round-5 block at
# dedup_exact (dedup_exact, dedup_lsh_recall, dedup_simhash_recall,
# derived_age, distinct_pairs, distinct_priorities, epoch_plan and
# everything after remain unrotated — fill slots went to the changed
# graph rows and the nine round-8 additions: the incremental-SemDeDup
# pair, split_leakage_safe, curation_token_budget,
# curation_length_batching, curation_fuzzy_contamination,
# curation_score_percentiles, curation_decontaminated,
# curation_top_boilerplate; dedup_keep_best is already in the changed
# band and covers the QUALITY_SCORE_SQL oracle refactor).
_SWEEP_FIRST = [
    # 0. added in round 8 — never driver-recorded
    "codebook_update_check",
    "dedup_semantic_incremental",
    "incremental_semdedup_check",
    "split_leakage_safe",
    "curation_token_budget",
    "curation_length_batching",
    "curation_fuzzy_contamination",
    "curation_score_percentiles",
    "curation_decontaminated",
    "curation_top_boilerplate",
    # 1. changed in round 8 (streaming_ingest_check gained the three
    #    compaction-contract columns; codebook_check gained the relative
    #    drift gate column; dedup_keep_best/keep_best_lsh_check run the
    #    max_by keeper rewrite; lsh_twowave_check's witness now derives
    #    from the shared LSH constants; the graph family now reads the
    #    persisted pair table — graph_triangles_capped is already in the
    #    round-5 block below)
    "streaming_ingest_check",
    "codebook_check",
    "dedup_keep_best",
    "keep_best_lsh_check",
    "lsh_twowave_check",
    "graph_pagerank",
    "graph_degrees",
    "graph_triangles",
    # 2. stale: last recorded in round 4 (the final 23)
    "part_supplier_counts",
    "partitioned_month_revenue",
    "returned_items",
    "revenue_deciles",
    "revenue_percentiles",
    "rolling_spend",
    "salted_join",
    "scd2_intervals",
    "sorted_shipdate_window",
    "token_positions",
    "top_supplier",
    "tpch_q2",
    "tpch_q4",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "training_split",
    "zorder_cust_window",
    # 3. stale: last recorded in round 5 (first 8 of 46, alphabetical —
    #    round 9 resumes at dedup_exact) plus
    #    graph_triangles_capped, which is also round-8-changed
    "bpe_check",
    "curation_funnel",
    "curation_segment_dedup",
    "curation_vocab",
    "customer_features",
    "customer_revenue_stats",
    "customer_rfm",
    "daily_ingest",
    "graph_triangles_capped",
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
