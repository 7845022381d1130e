"""Physical-plan inspection helpers.

The scale contract of every operator in this engine is checked, not assumed:
tests assert that filters reach the parquet scan (predicate pushdown), scans
read only referenced columns (pruning), dimension joins broadcast, grouped
aggregations are partial+final, and hot paths stay inside whole-stage
codegen.  A plan regression (e.g. an accidental UDF breaking pushdown) fails
tests rather than silently costing 100× at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear inside a PushedFilters: [...] clause."""
    plan = physical_plan(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert pushed, f"no PushedFilters clause in plan:\n{plan}"
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed; pushed={pushed}"


def assert_read_schema_pruned(
    df: DataFrame, table_fragment: str, allowed_cols: set[str]
) -> None:
    """The scan whose ReadSchema line mentions `table_fragment` must read a
    subset of `allowed_cols`."""
    plan = physical_plan(df)
    for m in re.finditer(r"Location:[^\n]*" + re.escape(table_fragment) + r"[^\n]*", plan):
        pass
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"no ReadSchema in plan:\n{plan}"
    # Find the scan block for the table: scan blocks appear as
    # "Scan parquet ... <table>.parquet ... ReadSchema: struct<...>".
    blocks = plan.split("Scan parquet")
    hit = False
    for block in blocks[1:]:
        if table_fragment in block.split("ReadSchema:")[0]:
            m = re.search(r"ReadSchema: struct<([^>]*)>", block)
            if m:
                cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
                extra = cols - allowed_cols
                assert not extra, (
                    f"scan of {table_fragment} reads unpruned columns {extra}; "
                    f"allowed {allowed_cols}"
                )
                hit = True
    assert hit, f"no parquet scan of {table_fragment} found in plan:\n{plan}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected >= {min_count} broadcast joins:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def assert_no_nested_loop_join(df: DataFrame) -> None:
    """No BroadcastNestedLoopJoin anywhere in the plan — a BNLJ's broadcast
    side must be a true constant; any data-proportional broadcast is a
    scale-killer."""
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"nested-loop join in plan:\n{plan}"
    )


def assert_partial_aggregation(df: DataFrame) -> None:
    """Grouped agg must run partial (map-side) + final — HashAggregate
    appears for both phases, or ObjectHashAggregate/SortAggregate pairs."""
    plan = physical_plan(df)
    n = (
        plan.count("HashAggregate")
        + plan.count("ObjectHashAggregate")
        + plan.count("SortAggregate")
    )
    assert n >= 2, f"no partial+final aggregation pair:\n{plan}"


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """Execute first: under AQE the codegen spans only exist in the
    finalized plan.  Must run THIS DataFrame's queryExecution (count()
    would build a different one)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen stages appear as "*(N) Operator" in the simple tree string
    # (or as WholeStageCodegen nodes in older formats)
    assert "WholeStageCodegen" in plan or re.search(r"\*\(\d+\)", plan), (
        f"no whole-stage codegen span:\n{plan}"
    )


# Operator classes whose COUNT in a query's physical plan is the shape
# contract plan_signature pins: join strategies (a broadcast silently
# degrading to sort-merge is a 100 TB regression), exchange kinds (every
# extra shuffle is a full network pass of the data), and scan count
# (an accidental double read of a fact table).
_SIGNATURE_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BroadcastExchange",
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "Scan parquet",
    "Window",
)


def plan_signature(df: DataFrame) -> dict[str, int]:
    """Shape signature of the SIMPLE physical plan: occurrence count of
    each operator class in `_SIGNATURE_OPS` (zero-count keys omitted).
    Deterministic for fixed code + fixed input files; used by the
    plan-golden regression test."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )
    sig = {}
    for op in _SIGNATURE_OPS:
        n = plan.count(op)
        if n:
            sig[op] = n
    return sig
