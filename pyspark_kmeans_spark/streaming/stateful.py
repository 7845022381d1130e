"""Custom stateful streaming operator: per-user running totals via
applyInPandasWithState (SURVEY.md §7.5 — the shape watermark+window aggs
can't express: arbitrary per-key state carried across micro-batches).

State is one (count, sum) pair per user — O(distinct users) memory,
partitioned by user across executors.  Each micro-batch emits the updated
totals for the users it touched (update semantics), so downstream sees a
changelog of per-user lifetime counters.

The running sum is carried as INTEGER MICRO-UNITS (value × 1e6, the same
6-decimal grain as functions/exact.py's DECIMAL(18,6) convention): a float
accumulator would make the lifetime total depend on micro-batch boundaries
and arrival order, so a restarted or re-partitioned stream could emit
last-ulp-different totals than the batch aggregation this operator claims
equivalence with.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_micros", T.LongType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, micros = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        micros += int((pdf["value"] * 1_000_000).round().astype("int64").sum())
    state.update((n, micros))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [micros / 1_000_000],
        }
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming changelog of per-user lifetime (count, sum(value))."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
