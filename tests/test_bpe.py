"""BPE merge training: planted-corpus exactness, determinism, and
apply-consistency (the iterative trainer has no SQL oracle — these tests
are its correctness contract, like test_ml.py for k-means)."""

from __future__ import annotations

from pyspark_kmeans_spark.operators.bpe import apply_merges, bpe_merges


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_planted_merges_match_hand_computation(spark):
    """Sennrich's worked example shape: 'low' ×5, 'lowest' ×2.
    Pair counts round 1: (l,o)=7, (o,w)=7, (w,e)=2, (e,s)=2, (s,t)=2 →
    argmax ties (l,o)/(o,w) broken lexicographically → merge (l,o).
    Round 2: (lo,w)=7 wins.  Round 3: 'low' is a single symbol; the
    suffix pairs (low,e)=2,(e,s)=2,(s,t)=2 tie → (e,s) lexicographically.
    """
    docs = _corpus(spark, ["low low low low low", "lowest lowest"])
    merges = bpe_merges(docs, n_merges=3)
    assert [(m[1], m[2], m[3]) for m in merges] == [
        ("l", "o", 7),
        ("lo", "w", 7),
        ("e", "s", 2),
    ]


def test_greedy_left_to_right_overlap(spark):
    """Overlapping candidate ('aaa' with merge (a,a)) must fold greedily
    left-to-right: aaa → [aa, a], never [a, aa] or [aa, aa]."""
    docs = _corpus(spark, ["aaa aaa"])
    merges = bpe_merges(docs, n_merges=1)
    assert (merges[0][1], merges[0][2]) == ("a", "a")
    seg = apply_merges(docs, merges).collect()
    for r in seg:
        assert r.subwords == ["aa", "a"], r.subwords


def test_deterministic_across_runs(spark, sf_dir):
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = bpe_merges(docs, n_merges=6)
    b = bpe_merges(docs, n_merges=6)
    assert a == b
    assert len(a) == 6


def test_apply_consistency(spark, sf_dir):
    """Applying the trained merges must (a) preserve every word's
    character content and (b) actually merge something for the top pair."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = bpe_merges(docs, n_merges=4)
    seg = apply_merges(docs, merges)
    bad = seg.filter(
        F.concat_ws("", F.col("subwords")) != F.col("word")
    ).count()
    assert bad == 0
    top = merges[0][1] + merges[0][2]
    assert seg.filter(F.array_contains("subwords", top)).count() > 0
