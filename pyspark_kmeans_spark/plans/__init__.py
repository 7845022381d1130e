from pyspark_kmeans_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_no_nested_loop_join,
    assert_partial_aggregation,
    assert_pushed_filters,
    assert_read_schema_pruned,
    assert_whole_stage_codegen,
    physical_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_no_nested_loop_join",
    "assert_partial_aggregation",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "assert_whole_stage_codegen",
    "physical_plan",
]
