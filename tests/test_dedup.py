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


def test_exact_dedup_plan_is_aggregate_not_window(docs):
    """VERDICT r8 "What's wrong" #2: the keeper must be a partial+final
    min_by aggregate (map-side combine shrinks a viral fingerprint group
    to one candidate per partition before the shuffle), never a window
    (which sorts the whole hot group in a single task)."""
    plan = exact_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "min_by" in plan
    assert "Window" not in plan
    assert "partial_min_by" in plan, "map-side combine must run pre-shuffle"


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


# slow: quadratic brute-force blocked all-pairs join (the VERDICT r12
# item-1 example).  The same exactness is pinned fast by
# test_properties.test_prefix_filter_jaccard_matches_bruteforce and by
# the driver's dedup_jaccard_pairs oracle hash.
@pytest.mark.slow
def test_jaccard_pairs_equals_bruteforce_sf0001(spark, sf_dir):
    """Round-12 pin for the PPJoin positional filter: the prefix-filter
    path (size prune + positional prune + prefix equi-join) must return
    EXACTLY the brute-force blocked all-pairs result — the positional
    bound may only drop provably non-qualifying candidates."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.operators.dedup import tokens_col
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs(docs, 0.9).collect()
    }
    base = docs.select(
        F.col("doc_id"), F.col("lang"), tokens_col("text").alias("_t")
    ).persist()
    a = base.select(
        F.col("doc_id").alias("doc_a"), "lang", F.col("_t").alias("_ta")
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"), "lang", F.col("_t").alias("_tb")
    )
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.size("_ta") + F.size("_tb") - inter
    jac = inter.cast("double") / union
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in a.join(b, on="lang")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.9)
        .collect()
    }
    base.unpersist()
    assert want, "fixture should contain near-dups"
    assert got == want


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


def test_connected_components_long_chain_converges(spark):
    """Pointer doubling must close a diameter-24 path graph well within the
    default iteration cap (plain propagation would need 24 rounds)."""
    from pyspark_kmeans_spark.operators.dedup import near_dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 124)], "doc_a long, doc_b long"
    )
    labels = {r.doc_id: r.cluster_id for r in near_dup_clusters(chain).collect()}
    assert labels == {i: 100 for i in range(100, 125)}


def test_connected_components_raises_on_iteration_exhaustion(spark):
    """VERDICT r1 item 5: exhausting the cap must raise, never silently
    return split clusters."""
    from pyspark_kmeans_spark.operators.dedup import near_dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(50, 60)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(chain, max_iterations=1)


def test_lsh_clusters_match_exact_clusters(spark):
    """The LSH pair graph yields the SAME non-trivial clusters as the exact
    blocked graph on the sf0.01 corpus (LSH can only miss edges; at 8x8
    bands / j>=0.9 it misses none here and adds cross-lang true pairs that
    merge no extra in-block clusters)."""
    from pyspark_kmeans_spark.operators.dedup import (
        jaccard_pairs,
        lsh_near_dup_clusters,
        near_dup_clusters,
    )
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    exact_labels = near_dup_clusters(jaccard_pairs(docs, 0.9))
    exact = {
        frozenset(
            r.doc_id for r in grp
        )
        for _, grp in __import__("itertools").groupby(
            sorted(exact_labels.collect(), key=lambda r: r.cluster_id),
            key=lambda r: r.cluster_id,
        )
    }
    lsh_rows = lsh_near_dup_clusters(docs, threshold=0.9).collect()
    lsh = {
        frozenset(r.doc_id for r in grp)
        for _, grp in __import__("itertools").groupby(
            sorted(lsh_rows, key=lambda r: r.cluster_id),
            key=lambda r: r.cluster_id,
        )
    }
    # Every exact in-block cluster must be contained in one LSH cluster
    # (LSH may merge clusters via legitimate cross-lang duplicate edges).
    for cluster in exact:
        assert any(cluster <= l for l in lsh), f"split cluster: {cluster}"


def test_minhash_lsh_cross_block_recall_sf001(spark):
    """VERDICT r1 item 9: every lang-blocked exact pair at j>=0.9 must be
    found by LSH (recall >= 0.98 at sf0.01).  LSH finds MORE pairs than the
    blocked exact path because it is blind to lang blocks — cross-lang
    duplicates are true j>=0.9 pairs the blocked path cannot see."""
    from pyspark_kmeans_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    exact = {(r.doc_a, r.doc_b) for r in jaccard_pairs(docs, 0.9).collect()}
    approx = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, threshold=0.9).collect()
    }
    assert len(exact) > 100, "fixture should contain many near-dups"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.98, f"cross-block LSH recall {recall:.4f}"


def test_dedup_sweep_releases_persisted_blocks(spark):
    """VERDICT r1 item 6: a multi-query dedup/similarity sweep must not
    accumulate persisted blocks — each query releases its predecessor's."""
    from pyspark_kmeans_spark.operators import dedup

    sc = spark.sparkContext
    def n_persisted():
        return sc._jsc.sc().getPersistentRDDs().size()

    sf = "/root/testdata/sf0.001"
    dedup.q_dedup_jaccard_pairs(spark, sf).count()
    after_first = n_persisted()
    dedup.q_dedup_minhash_lsh(spark, sf).count()
    dedup.q_dedup_lsh_kept(spark, sf).count()
    dedup.q_dedup_kept_docs(spark, sf).count()
    assert n_persisted() <= max(after_first, 2), (
        f"persisted RDDs grew across sweep: {n_persisted()}"
    )
    dedup.release_persisted()


def test_lsh_bucket_cap_bounds_degenerate_buckets(spark, caplog):
    """VERDICT r2 item 2: a planted boilerplate mega-bucket must be dropped
    (with a logged count) instead of emitting B² candidates, while honest
    near-dup pairs in small buckets are still found."""
    import logging

    from pyspark_kmeans_spark.operators import dedup

    flood = "common boilerplate license header identical in every document"
    rows = [(i, flood, "en") for i in range(60)]
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
        (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda", "en"),
    ]  # j = 10/11 ≈ 0.909
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    with caplog.at_level(
        logging.WARNING, logger="pyspark_kmeans_spark.operators.dedup"
    ):
        capped = {
            (r.doc_a, r.doc_b)
            for r in minhash_lsh_pairs(df, threshold=0.9, max_bucket=20).collect()
        }
    assert (100, 101) in capped
    assert not any(a < 100 for a, _ in capped), "mega-bucket pairs not dropped"
    assert any("degenerate buckets" in r.message for r in caplog.records)
    # Uncapped finds the full flood: C(60,2) identical pairs + the near-dup.
    uncapped = minhash_lsh_pairs(df, threshold=0.9, max_bucket=None).count()
    assert uncapped == 60 * 59 // 2 + 1
    dedup.release_persisted()


def test_jaccard_block_bound_raises_loudly(spark):
    """VERDICT r2 item 3: the O(block²) exact family must refuse oversized
    blocks at call time, not launch a silent quadratic job."""
    from pyspark_kmeans_spark.operators import dedup
    from pyspark_kmeans_spark.operators.dedup import incremental_kept

    rows = [(i, f"doc number {i} words {i % 7}", "en") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="max_block_rows"):
        jaccard_pairs(df, 0.9, max_block_rows=10)
    new = df.filter("doc_id % 5 = 0")
    corpus = df.filter("doc_id % 5 != 0")
    with pytest.raises(ValueError, match="max_block_rows"):
        incremental_kept(new, corpus, max_block_rows=10)
    # The sf0.001 lang blocks are far below the default bound → no raise.
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    assert jaccard_pairs(docs, 0.9).count() >= 0
    dedup.release_persisted()


def test_incremental_kept_against_matches_self_contained(spark, tmp_path):
    """VERDICT r2 item 4: the persisted-signature production form (sign only
    the batch against a stored corpus signature table — parquet round-trip
    included) must return exactly the kept set of the self-contained LSH
    spelling."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.operators import dedup
    from pyspark_kmeans_spark.operators.dedup import (
        build_signature_table,
        incremental_kept_against,
        lsh_incremental_kept,
    )
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    expected = {r.doc_id for r in lsh_incremental_kept(new, corpus).collect()}
    sig_path = str(tmp_path / "corpus_signatures")
    build_signature_table(corpus).write.parquet(sig_path)
    signatures = spark.read.parquet(sig_path)
    got = {r.doc_id for r in incremental_kept_against(signatures, new).collect()}
    assert got == expected
    assert got, "kept set should be non-empty"
    dedup.release_persisted()


def test_registered_incremental_lsh_reads_persisted_table(spark):
    """The REGISTERED query must consume the write-once signature table
    (VERDICT r4 item 3: the pre-round-5 form re-signed the whole corpus on
    every run) and still return exactly the self-contained kept set: the
    table exists on disk after the first run, and a second run — which only
    reads it — returns the identical set."""
    import os

    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.operators import dedup
    from pyspark_kmeans_spark.operators.dedup import (
        INCREMENTAL_BATCH_MOD,
        lsh_incremental_kept,
        q_dedup_incremental_lsh,
    )
    from pyspark_kmeans_spark.sources.bucketed import _WAREHOUSE, bucketed_name
    from pyspark_kmeans_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {r.doc_id for r in q_dedup_incremental_lsh(spark, sf).collect()}
    table_dir = os.path.join(
        _WAREHOUSE,
        # seed is part of the cache name since round 6 (default seed=7);
        # the old unseeded spelling only passed while a stale pre-r6
        # directory lingered in the warehouse.
        bucketed_name(f"doc_sigs_m{INCREMENTAL_BATCH_MOD}_s7", sf, n_buckets=64),
    )
    assert os.path.exists(os.path.join(table_dir, "_SUCCESS"))
    docs = load_table(spark, sf, "documents")
    new = docs.filter(F.col("doc_id") % INCREMENTAL_BATCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % INCREMENTAL_BATCH_MOD != 0)
    expected = {r.doc_id for r in lsh_incremental_kept(new, corpus).collect()}
    assert got == expected
    rerun = {r.doc_id for r in q_dedup_incremental_lsh(spark, sf).collect()}
    assert rerun == got
    dedup.release_persisted()


def test_incremental_lsh_kept_is_subset_of_exact(spark):
    """lsh_incremental_kept kills strictly more than the blocked exact path
    (it also sees cross-lang duplicates), so its kept set must be a subset;
    and both must keep at least one doc on the sf0.01 split."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.operators.dedup import (
        incremental_kept,
        lsh_incremental_kept,
    )
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    exact = {r.doc_id for r in incremental_kept(new, corpus).collect()}
    lsh = {r.doc_id for r in lsh_incremental_kept(new, corpus).collect()}
    assert exact and lsh
    assert lsh <= exact, sorted(lsh - exact)[:10]


def test_shingles_survive_short_docs(spark):
    """Docs shorter than the shingle width must yield their under-length
    gram, not crash — Spark 4's default ANSI mode makes element_at THROW
    on out-of-bounds, so this pins the try_element_at spelling."""
    from pyspark_kmeans_spark.operators.dedup import shingles_col

    df = spark.createDataFrame(
        [(0, "one two"), (1, "a"), (2, "x y z w")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.s
        for r in df.select("doc_id", shingles_col(n=3).alias("s")).collect()
    }
    assert got == {0: ["one two"], 1: ["a"], 2: ["x y z", "y z w"]}


def test_incremental_kept_against_rejects_mismatched_signature_table(spark):
    """A stored signature table built with different MinHash width must be
    rejected loudly — a silent mismatch would keep every duplicate doc."""
    import pytest

    from pyspark_kmeans_spark.operators.dedup import (
        build_signature_table,
        incremental_kept_against,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "f g h i j")], "doc_id long, text string"
    )
    sigs = build_signature_table(docs, num_hashes=32)
    with pytest.raises(ValueError, match="signature width"):
        incremental_kept_against(sigs, docs, num_hashes=64)
    with pytest.raises(ValueError, match="not"):
        incremental_kept_against(sigs, docs, num_hashes=32, bands=7)


def test_two_wave_kept_equals_pair_spelling_sf001(spark, sf_dir):
    """The two-wave kept path (wave-1 bucket-min verify, wave-2 capped
    expansion over unresolved docs) must return EXACTLY the docs the
    pair-set spelling keeps — the claim lsh_near_dedup_kept's docstring
    makes for corpora where no bucket exceeds the cap."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.operators import dedup
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = {r.doc_id for r in dedup.lsh_near_dedup_kept(docs, threshold=0.9).collect()}
    losers = {
        r.doc_b
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.9).collect()
    }
    expected = {r.doc_id for r in docs.select("doc_id").collect()} - losers
    assert kept == expected
    dedup.release_persisted()


def test_two_wave_kept_dedups_flood_past_bucket_cap(spark):
    """The decisive two-wave property: a boilerplate flood LARGER than
    max_bucket is still deduped to one survivor, because wave 1 is
    array-free and uncapped (the pair-set spelling drops the capped
    bucket and keeps the whole flood — the silent-recall-loss mode this
    path eliminates).  Measured at sf0.1+flood: H=32000 identical docs,
    pair spelling keeps all 32000, two-wave keeps 1 at ~3x less cost."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.operators import dedup

    flood = "common boilerplate license header identical in every document"
    rows = [(i, flood, "en") for i in range(30)]
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
        (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda", "en"),
        (102, "totally unrelated content words appear exactly once here", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # Flood of 30 > max_bucket=10: the pair spelling skips the bucket …
    losers = {
        r.doc_b
        for r in dedup.minhash_lsh_pairs(df, threshold=0.9, max_bucket=10).collect()
    }
    assert not any(b < 100 for b in losers), "capped pair path reports no flood pairs"
    # … but the two-wave kept path still collapses it to doc 0.
    kept = {
        r.doc_id
        for r in dedup.lsh_near_dedup_kept(df, threshold=0.9, max_bucket=10).collect()
    }
    assert kept == {0, 100, 102}
    dedup.release_persisted()


def test_incremental_two_wave_dedups_flood_past_bucket_cap(spark):
    """Bipartite two-wave: a batch doc that duplicates a CORPUS boilerplate
    flood larger than max_bucket must still be dropped (wave 1 pairs it
    with the bucket-min corpus member, uncapped), and a batch-side
    duplicate pair must still resolve by min id — while the capped
    expansion alone would skip the bucket and keep everything."""
    from pyspark_kmeans_spark.operators.dedup import (
        build_signature_table,
        incremental_kept_against,
        release_persisted,
    )

    flood = "common boilerplate license header identical in every document"
    corpus = spark.createDataFrame(
        [(i, flood) for i in range(30)]
        + [(50, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, flood),  # dup of the capped corpus flood -> dropped (wave 1)
            (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
            (102, flood),  # also dropped (corpus flood, and batch 100)
            (103, "totally unrelated content words appear exactly once here"),
        ],
        "doc_id long, text string",
    )
    sigs = build_signature_table(corpus)
    kept = {
        r.doc_id
        for r in incremental_kept_against(sigs, batch, max_bucket=10).collect()
    }
    # 100/102 die against the flood despite the capped bucket; 101 dies
    # against corpus doc 50 (j = 10/11 >= 0.9); 103 survives.
    assert kept == {103}
    release_persisted()


def test_incremental_wave2_skip_on_full_reingest(spark):
    """Round-6 wave-2 skip: when wave 1 drops the ENTIRE batch (re-ingest
    of already-seen documents — the common degenerate input), the kept set
    is empty and identical to the unskipped semantics; partial overlap
    must still take the wave-2 path and keep the genuinely new docs."""
    from pyspark_kmeans_spark.operators.dedup import (
        build_signature_table,
        incremental_kept_against,
        release_persisted,
    )

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, "one two three four five six seven eight nine ten"),
            (2, "red orange yellow green blue indigo violet pink brown black"),
        ],
        "doc_id long, text string",
    )
    sigs = build_signature_table(corpus)
    # Full re-ingest: every batch doc already in the corpus -> skip fires.
    replay = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (101, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in incremental_kept_against(sigs, replay).collect()}
    assert kept == set()
    # Partial overlap: the new doc survives (wave 2 still runs).
    mixed = spark.createDataFrame(
        [
            (200, "one two three four five six seven eight nine ten"),
            (201, "fresh unseen words compose this entirely novel document"),
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in incremental_kept_against(sigs, mixed).collect()}
    assert kept == {201}
    release_persisted()


def test_keep_best_keeps_highest_quality_not_lowest_id(spark):
    """Quality-aware keeper selection must differ from min-id-wins where
    it matters: a 3-doc near-dup cluster (pairwise Jaccard 38/42 ≈ 0.905)
    whose CLEANEST member has the HIGHEST id.  Docs 1/2 carry
    punctuation-heavy unique tokens (punct_ratio penalty); doc 3's unique
    tokens are clean stopwords — keep_best_kept keeps 3, min-id would
    keep 1.  Doc 10 shares nothing and must survive as a singleton."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.operators.dedup import (
        jaccard_pairs,
        keep_best_kept,
        near_dup_clusters,
    )

    shared = " ".join(f"alpha{i}" for i in range(38))
    rows = [
        (1, shared + " @@@@! $$$$%", "en"),
        (2, shared + " %%%%% #####", "en"),
        (3, shared + " the is", "en"),
        (10, "totally unrelated content nothing shared whatsoever", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    labels = near_dup_clusters(jaccard_pairs(docs, 0.9))
    assert {r["doc_id"] for r in labels.collect()} == {1, 2, 3}
    kept = {r["doc_id"] for r in keep_best_kept(docs, labels).collect()}
    assert kept == {3, 10}
    # 100 TB shape (VERDICT r7 "What's wrong" #1): keeper selection is a
    # partial-aggregatable argmax, never a per-cluster window sort — a
    # window would serialize a boilerplate-flood mega-component into one
    # task.  partial_max_by before the exchange proves map-side combine;
    # no Window node allowed anywhere in the lineage.
    from pyspark_kmeans_spark.plans.inspect import physical_plan

    plan = physical_plan(keep_best_kept(docs, labels))
    assert "Window" not in plan, plan
    assert "partial_max_by" in plan, plan
