"""Streaming ingestion dedup (streaming/dedup_ingest.py): stream == the
sequential batch fold, and replays overwrite instead of duplicating."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from pyspark_kmeans_spark.operators.dedup import (
    build_signature_table,
    incremental_kept_against,
)
from pyspark_kmeans_spark.streaming.dedup_ingest import (
    dedup_ingest_batch,
    dedup_ingest_stream,
    read_signature_state,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

T20 = " ".join(f"tok{i}" for i in range(20))  # a 20-token text
U20 = " ".join(f"unq{i}" for i in range(20))
V20 = " ".join(f"val{i}" for i in range(20))


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows], DOC_SCHEMA
    )


def _kept_ids(spark, kept_dir):
    return {
        r["doc_id"]
        for r in spark.read.parquet(f"{kept_dir}/batch_id=*").collect()
    }


# slow (19 s): multi-batch planted-duplicate replay fixture.
@pytest.mark.slow
def test_planted_batches_and_replay_idempotency(spark, tmp_path):
    """Batch 0 establishes the corpus; batch 1's corpus-dup and
    within-batch dup are dropped; replaying batch 1 (the crash-recovery
    path) leaves every output byte-for-byte equivalent — no duplicated
    kept ids, no duplicated signature rows."""
    state, kept = str(tmp_path / "state"), str(tmp_path / "kept")
    b0 = _docs(spark, [(1, T20), (2, U20)])
    # 3 dups corpus T20; 4/5 identical within batch (lower id wins); 6 new.
    b1 = _docs(spark, [(3, T20), (4, V20), (5, V20), (6, U20 + " extra")])
    dedup_ingest_batch(b0, 0, state_dir=state, kept_dir=kept)
    dedup_ingest_batch(b1, 1, state_dir=state, kept_dir=kept)

    def snapshot():
        ids = sorted(_kept_ids(spark, kept))
        sig_rows = sorted(
            (r["doc_id"], tuple(r["sig"]))
            for r in read_signature_state(spark, state).collect()
        )
        return ids, sig_rows

    first = snapshot()
    assert first[0] == [1, 2, 4]  # 3 dup-of-corpus, 5 dup-of-4, 6 kept?
    # 6 shares 20 of 21 tokens with U20 -> Jaccard 20/21 < 0.9? 20/21=0.952
    # >= 0.9 -> 6 is a near-dup of corpus doc 2 and must be dropped too.
    dedup_ingest_batch(b1, 1, state_dir=state, kept_dir=kept)  # replay
    assert snapshot() == first
    # State holds signatures for exactly the kept docs, once each.
    assert [d for d, _ in first[1]] == [1, 2, 4]


# slow (43 s): six real micro-batches; the same stream==batch equality
# is driver-gated every round (streaming_ingest_check).
@pytest.mark.slow
def test_stream_equals_sequential_batch_fold(spark, sf_dir, tmp_path):
    """End-to-end file stream over 3 disjoint document slices == folding
    incremental_kept_against over the same slices in the stream's own
    processing order."""
    input_dir = str(tmp_path / "in")
    state = str(tmp_path / "state")
    kept = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for i in range(3):
        tmp = str(tmp_path / f"stage{i}")
        docs.filter(docs.doc_id % 3 == i).coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{input_dir}/batch{i}.parquet")

    q = dedup_ingest_stream(
        spark, input_dir, state_dir=state, kept_dir=kept, checkpoint_dir=ckpt
    )
    q.awaitTermination(300)

    got = spark.read.parquet(f"{kept}/batch_id=*")
    batch_ids = sorted(
        int(os.path.basename(p).split("=")[1])
        for p in glob.glob(f"{kept}/batch_id=*")
    )
    assert len(batch_ids) == 3
    # Recover which input slice each micro-batch processed (slices are
    # disjoint residue classes, so any kept id identifies its slice).
    order = []
    for bid in batch_ids:
        ids = [
            r["doc_id"]
            for r in spark.read.parquet(f"{kept}/batch_id={bid}").collect()
        ]
        assert ids, f"batch {bid} kept nothing — cannot identify its slice"
        residues = {i % 3 for i in ids}
        assert len(residues) == 1, residues
        order.append(residues.pop())
    assert sorted(order) == [0, 1, 2]

    # Sequential batch-mode fold in that order.
    state_df = build_signature_table(docs.limit(0))
    expected: set[int] = set()
    for res in order:
        batch = docs.filter(docs.doc_id % 3 == res)
        kept_ids = incremental_kept_against(state_df, batch)
        kept_docs = batch.join(kept_ids, on="doc_id", how="left_semi")
        expected |= {r["doc_id"] for r in kept_ids.collect()}
        state_df = state_df.unionByName(
            build_signature_table(kept_docs)
        ).localCheckpoint()

    assert {r["doc_id"] for r in got.collect()} == expected


# slow (27 s): scale-shaped compaction fixture (multi-batch state).
@pytest.mark.slow
def test_compaction_preserves_state_ignores_overlap_and_is_idempotent(
    spark, tmp_path
):
    """compact_signature_state must (1) merge every batch dir below up_to
    into one committed snapshot with byte-equivalent state, (2) leave
    future-batch reads (before_batch=up_to) identical, (3) never
    double-count a leftover batch dir below the snapshot (the
    crash-between-commit-and-GC window), and (4) be an idempotent GC when
    re-run."""
    import shutil

    from pyspark_kmeans_spark.streaming.dedup_ingest import (
        compact_signature_state,
        read_signature_state,
    )

    state, kept = str(tmp_path / "state"), str(tmp_path / "kept")
    dedup_ingest_batch(_docs(spark, [(1, T20), (2, U20)]), 0,
                       state_dir=state, kept_dir=kept)
    dedup_ingest_batch(_docs(spark, [(3, V20)]), 1,
                       state_dir=state, kept_dir=kept)
    dedup_ingest_batch(_docs(spark, [(4, V20 + " tail")]), 2,
                       state_dir=state, kept_dir=kept)

    def rows(**kw):
        return sorted(
            (r["doc_id"], tuple(r["sig"]))
            for r in read_signature_state(spark, state, **kw).collect()
        )

    before_all = rows()
    before_replay3 = rows(before_batch=3)
    # Keep a copy of batch 0's dir to simulate the crash-overlap window.
    leftover_src = f"{state}/batch_id=0"
    leftover_copy = str(tmp_path / "leftover")
    shutil.copytree(leftover_src, leftover_copy)

    n = compact_signature_state(spark, state, up_to=3)
    assert n == 3
    assert os.path.exists(f"{state}/compacted=3/_SUCCESS")
    assert not os.path.exists(f"{state}/batch_id=0")
    assert rows() == before_all
    assert rows(before_batch=3) == before_replay3

    # Crash window: snapshot committed but one victim never GC'd — the
    # reader must ignore it (no double-counted signatures).
    shutil.copytree(leftover_copy, leftover_src)
    assert rows() == before_all
    # Re-running compaction is pure garbage collection.
    assert compact_signature_state(spark, state, up_to=3) == 1
    assert not os.path.exists(leftover_src)
    assert rows() == before_all

    # The stream keeps working on top of a compacted state: a dup of the
    # corpus must still be dropped, a new doc kept.
    dedup_ingest_batch(_docs(spark, [(5, T20), (6, "brand new words only")]),
                       3, state_dir=state, kept_dir=kept)
    assert 5 not in _kept_ids(spark, kept)
    assert 6 in _kept_ids(spark, kept)


def test_midrange_read_below_snapshot_raises_when_dirs_gone(spark, tmp_path):
    """A state read at a point BELOW a committed snapshot whose source
    dirs were garbage-collected must raise, not silently return the
    partial/empty survivors (ADVICE r7 #2): the mid-range state no longer
    exists, and such reads are contract-violating anyway (compaction only
    ever covers batches that can never replay)."""
    import pytest as _pytest

    from pyspark_kmeans_spark.streaming.dedup_ingest import (
        compact_signature_state,
    )

    state, kept = str(tmp_path / "state"), str(tmp_path / "kept")
    dedup_ingest_batch(_docs(spark, [(1, T20)]), 0,
                       state_dir=state, kept_dir=kept)
    dedup_ingest_batch(_docs(spark, [(2, U20)]), 1,
                       state_dir=state, kept_dir=kept)
    # Crash-overlap window (batch dirs still present): mid-range reads
    # below the snapshot keep working off the surviving dirs.
    snap = f"{state}/compacted=2"
    merged = read_signature_state(spark, state, before_batch=2)
    merged.write.mode("overwrite").parquet(snap)
    assert sorted(
        r["doc_id"]
        for r in read_signature_state(spark, state, before_batch=1).collect()
    ) == [1]
    # After GC the subsumed dirs are gone — the same read must now raise.
    compact_signature_state(spark, state, up_to=2)
    assert not os.path.exists(f"{state}/batch_id=0")
    with _pytest.raises(ValueError, match="no longer exists"):
        read_signature_state(spark, state, before_batch=1)
    # Reads at or above the snapshot point stay valid.
    assert sorted(
        r["doc_id"]
        for r in read_signature_state(spark, state, before_batch=2).collect()
    ) == [1, 2]


def test_warehouse_memo_evicts_stopped_sessions_entries(spark):
    """memo_put keeps only the LIVE applicationId's entries: a long-lived
    process cycling SparkSessions must not accumulate stopped sessions'
    DataFrame handles (ADVICE r7 #5)."""
    from pyspark_kmeans_spark.functions import warehouse_memo

    app = spark.sparkContext.applicationId
    warehouse_memo._MEMO[("app-dead-1", "/p1")] = object()
    warehouse_memo._MEMO[("app-dead-2", "/p2")] = object()
    try:
        warehouse_memo.memo_put(spark, "/p3", "live")
        owners = {k[0] for k in warehouse_memo._MEMO}
        assert owners == {app}
        assert warehouse_memo.memo_get(spark, "/p3") == "live"
    finally:
        warehouse_memo.memo_invalidate(spark, "/p3")


def test_compaction_is_monotone(spark, tmp_path):
    """A compaction point below an existing snapshot must raise: the batch
    dirs it would need are already garbage-collected, so the smaller
    snapshot would silently lose data for mid-range readers."""
    import pytest as _pytest

    from pyspark_kmeans_spark.streaming.dedup_ingest import (
        compact_signature_state,
    )

    state, kept = str(tmp_path / "state"), str(tmp_path / "kept")
    dedup_ingest_batch(_docs(spark, [(1, T20)]), 0,
                       state_dir=state, kept_dir=kept)
    dedup_ingest_batch(_docs(spark, [(2, U20)]), 1,
                       state_dir=state, kept_dir=kept)
    compact_signature_state(spark, state, up_to=2)
    with _pytest.raises(ValueError, match="monotone"):
        compact_signature_state(spark, state, up_to=1)


def test_compaction_rejects_point_beyond_committed_state(spark, tmp_path):
    """An up_to past the last committed batch+1 would write a snapshot
    claiming batches that never existed — later real batches fall below
    the snapshot point and vanish from full-state reads.  Refuse loudly."""
    import pytest as _pytest

    from pyspark_kmeans_spark.streaming.dedup_ingest import (
        compact_signature_state,
    )

    state, kept = str(tmp_path / "state"), str(tmp_path / "kept")
    dedup_ingest_batch(_docs(spark, [(1, T20)]), 0,
                       state_dir=state, kept_dir=kept)
    dedup_ingest_batch(_docs(spark, [(2, U20)]), 1,
                       state_dir=state, kept_dir=kept)
    with _pytest.raises(ValueError, match="exceeds the committed state"):
        compact_signature_state(spark, state, up_to=10)
    # The exact boundary (last batch + 1) is legal.
    assert compact_signature_state(spark, state, up_to=2) == 2
