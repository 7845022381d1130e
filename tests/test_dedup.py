"""Dedup operator tests: planted duplicates + recall of approximate methods
vs the exact-Jaccard oracle (FIXTURES.md §A edge cases for documents)."""

from __future__ import annotations

import pytest

from pyspark_kmeans_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "spark window merge batch table join filter query sort hash"
    rows = [
        (0, base, "en"),
        (1, base, "en"),  # exact dup of 0
        (2, base + " extra", "en"),  # near dup of 0 (j = 10/11 ≈ 0.91)
        (3, "completely different words here nothing shared at all", "en"),
        (4, base, "de"),  # exact text, other block
        (5, "  " + base + "  ", "en"),  # whitespace variant → same fingerprint
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup_keeps_min_id(docs):
    kept = {r.doc_id for r in exact_dedup(docs).collect()}
    # 0,1,5 share a fingerprint (whitespace-normalized) → keep 0.
    # 4 has identical text but is its own row (fingerprint equal → dropped).
    assert 0 in kept and 1 not in kept and 5 not in kept and 4 not in kept
    assert 2 in kept and 3 in kept


def test_jaccard_pairs_blocked(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(docs, 0.9).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # 10/11 ≈ 0.909
    # doc 4 is in block 'de' → never paired with 0/1 despite identical text.
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_recall(spark, sf_dir):
    from pyspark_kmeans_spark.sources.tables import load_table

    documents = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b) for r in jaccard_pairs(documents, 0.9).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(documents, threshold=0.9).collect()
    }
    assert exact, "fixture should contain near-dups"
    # LSH output is verified with exact jaccard → no false positives beyond
    # blocking differences (LSH is blind to lang blocks, so extra
    # cross-block true pairs are fine); recall on in-block pairs >= 95%.
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, f"minhash-LSH recall {recall:.3f}"


def test_connected_components_chain(spark):
    from pyspark_kmeans_spark.operators.dedup import near_dup_clusters

    # chain 1-2-3-4 (transitive cluster) + pair 10-11 + pair (20,21)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)],
        "doc_a long, doc_b long",
    )
    labels = {r.doc_id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_simhash_properties(docs):
    fp = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert fp[0] == fp[1] == fp[4]  # identical token sets → identical simhash
    pairs = {
        (r.doc_a, r.doc_b): r.hamming for r in simhash_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0
    # near-dup 2 should be within a few bits of 0 (one extra token)
    if (0, 2) in pairs:
        assert pairs[(0, 2)] <= 3
