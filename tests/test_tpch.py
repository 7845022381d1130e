"""Plan-shape pins for the round-4 TPC-H completions (values are covered by
test_oracle_parity.py; these pin the physical plans the queries are designed
to keep at 100 TB)."""

from __future__ import annotations

from pyspark_kmeans_spark.operators.tpch import (
    q_tpch_q2,
    q_tpch_q17,
    q_tpch_q19,
    q_tpch_q21,
)
from pyspark_kmeans_spark.plans import physical_plan


def test_q19_or_envelopes_pushed_to_both_scans(spark, sf_dir):
    """The OR-of-ANDs predicate spans both join sides; Catalyst must still
    push each side's envelope into its parquet scan — quantity ranges into
    lineitem, brand/size disjunction into part.  Losing either pushdown
    means scanning the full fact table for a sub-percent selection."""
    plan = physical_plan(q_tpch_q19(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_partkey), Or(" in plan or (
        "GreaterThanOrEqual(l_quantity" in plan.split("lineitem.parquet")[0]
    )
    # lineitem scan carries the quantity OR-envelope
    li_scan = [
        seg for seg in plan.split("FileScan parquet") if "lineitem" in seg
    ][0]
    assert "Or(" in li_scan and "l_quantity" in li_scan
    # part scan carries the brand/size OR-envelope
    p_scan = [seg for seg in plan.split("FileScan parquet") if "part.parquet" in seg][0]
    assert "p_brand" in p_scan and "Or(" in p_scan
    # part is the broadcast side
    assert "BroadcastExchange" in plan


def test_q2_broadcasts_bounded_dims(spark, sf_dir):
    """supplier/nation/region and the per-part min-cost frame are all
    bounded — every join in Q2 must be a broadcast, leaving one shuffle
    (the (partkey,suppkey) aggregate) in the whole plan."""
    plan = physical_plan(q_tpch_q2(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q17_single_fact_scan_family(spark, sf_dir):
    """The correlated-AVG decorrelation must not re-scan lineitem for the
    threshold: the brand filter broadcast-prunes the fact once, and the
    aggregate + probe sides reuse that pruned join."""
    plan = physical_plan(q_tpch_q17(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q21_semi_and_anti_joins(spark, sf_dir):
    """The EXISTS / NOT-EXISTS pair must compile to LeftSemi + LeftAnti on
    the orderkey equi-key (shuffle joins co-partitioned on orderkey), never
    to a nested-loop shape."""
    plan = physical_plan(q_tpch_q21(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hybrid_search_pushes_keyword_and_broadcasts_probes(spark, sf_dir):
    """Pre-filtering contract: the keyword predicate must reach the
    documents scan (PushedFilters Contains), and the probe side must be
    the broadcast of the scoring join (corpus never shuffles)."""
    from pyspark_kmeans_spark.operators.similarity import q_hybrid_search

    plan = physical_plan(q_hybrid_search(spark, sf_dir))
    assert "StringContains(text," in plan  # pushed into the documents scan
    assert "BroadcastHashJoin" in plan


def test_lm_score_count_joins_are_shuffle_hash(spark, sf_dir):
    """The bigram/unigram count frames descend from explodes — they must
    join shuffle_hash (pinned), never statically broadcast."""
    from pyspark_kmeans_spark.operators.curation import q_lm_perplexity

    plan = physical_plan(q_lm_perplexity(spark, sf_dir))
    assert plan.count("ShuffledHashJoin") >= 2
