"""Session-scoped memo for write-once warehouse artifact handles.

The ensure_* artifacts (signature/digest/lang-stats tables, the IVF
codebook) are write-once per parameter set, but through round 6 every
CALL re-ran `os.path.exists` plus a read — a parquet schema discovery for
the table handles, and for the codebook a real 16-row collect() job.
Measured per-call cost at sf0.1: 155 ms (codebook), 83 ms (signature
table) — pure overhead in multi-query sessions (the driver's 50-entry
sweep calls the ingestion family repeatedly), VERDICT r6 item 5.

The memo key includes the SparkSession's applicationId: a DataFrame is
bound to the session that created it, so a fresh session (driver run,
test run, bench run) never sees another session's handles.  Values are
never invalidated within a session — exactly the write-once contract the
artifacts already guarantee (no test or production path deletes a
warehouse artifact mid-session; parameter changes change the path and
therefore the key) — with ONE sanctioned exception: an explicit refresh
(`refresh_codebook_table`, the drift-remediation path `codebook_check`
gates) rebuilds an artifact in place and calls `memo_invalidate` so the
session sees the refitted values.
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import SparkSession

_MEMO: dict[tuple[str, str], Any] = {}
# All _MEMO mutations and iteration hold this lock (ADVICE r8 #2): the
# eviction sweep in memo_put iterates the dict, and a concurrent insert
# from another thread (a sweep harness running queries in parallel) would
# raise "dictionary changed size during iteration" mid-comprehension.
_MEMO_LOCK = threading.Lock()


def memo_get(spark: SparkSession, path: str) -> Any | None:
    with _MEMO_LOCK:
        return _MEMO.get((spark.sparkContext.applicationId, path))


def memo_put(spark: SparkSession, path: str, value: Any) -> Any:
    app = spark.sparkContext.applicationId
    # Evict dead sessions' entries: a long-lived process (pytest run,
    # notebook host) cycles SparkSessions, and a stopped session's
    # DataFrame handles would otherwise pin its JVM references forever
    # (ADVICE r7 #5).  One applicationId is live per process at a time
    # (getOrCreate semantics; newSession() shares the id), so keeping
    # only the current app's keys is exact, not heuristic.
    with _MEMO_LOCK:
        for key in [k for k in _MEMO if k[0] != app]:
            del _MEMO[key]
        _MEMO[(app, path)] = value
    return value


def memo_invalidate(spark: SparkSession, path: str) -> None:
    with _MEMO_LOCK:
        _MEMO.pop((spark.sparkContext.applicationId, path), None)
