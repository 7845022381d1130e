"""Invariant tests for sketch-based aggregates (no oracle possible) and
multi-dimensional agg structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_kmeans_spark.operators.analytics import (
    q_approx_aggs,
    q_count_distinct,
    q_cube,
)


def test_approx_close_to_exact(spark, sf_dir):
    approx = {r.l_returnflag: r for r in q_approx_aggs(spark, sf_dir).collect()}
    exact = {r.l_returnflag: r for r in q_count_distinct(spark, sf_dir).collect()}
    for flag, e in exact.items():
        a = approx[flag]
        # HLL standard error at default rsd=5%; allow 15%.
        assert abs(a.approx_parts - e.n_parts) / e.n_parts < 0.15
        assert a.approx_median_price > 0
        # The query's own driver-visible invariant columns must agree.
        assert a.exact_parts == e.n_parts
        assert a.parts_in_bounds and a.median_in_bounds
        assert a.rel_err_parts >= 0.0 and a.rel_err_median >= 0.0


def test_cube_has_grand_total(spark, sf_dir):
    rows = q_cube(spark, sf_dir).collect()
    grand = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1
    total = sum(r.n_rows for r in rows if r.l_returnflag is not None and r.l_linestatus is not None)
    assert grand[0].n_rows == total


def test_resample_ffill_planted(spark):
    """Hours 10:00 and 12:00 have data, 11:00 is a gap: the spine must
    contain 11:00 with gap_filled=true carrying 10:00's sum forward."""
    from pyspark_kmeans_spark.operators.analytics import q_event_resample_ffill
    from pyspark_kmeans_spark.operators import analytics as mod

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:15:00", 5, "view", 2.0, "{}"),
            (2, "2024-01-01 10:45:00", 6, "view", 3.0, "{}"),
            (3, "2024-01-01 12:30:00", 7, "view", 7.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))

    orig = mod._t
    mod._t = lambda spark, sf_dir, name: df
    try:
        out = {
            r["hour_us"]: (r["gap_filled"], r["sum_value_ffill"])
            for r in q_event_resample_ffill(spark, "unused").collect()
        }
    finally:
        mod._t = orig
    hours = sorted(out)
    assert len(hours) == 3  # dense spine 10:00..12:00
    assert out[hours[0]] == (False, 5.0)
    assert out[hours[1]] == (True, 5.0)   # the gap, carried forward
    assert out[hours[2]] == (False, 7.0)


def test_stats_agg_single_row_group_yields_null_not_crash(spark):
    """A segment with one customer (n-1 = 0) must produce NULL sample
    moments, not an ANSI DIVIDE_BY_ZERO abort (review fix)."""
    from pyspark_kmeans_spark.operators import analytics as mod

    df = spark.createDataFrame(
        [(1, "X", 10.0, 3), (2, "Y", 5.0, 1), (3, "Y", 7.0, 2)],
        "c_custkey long, c_mktsegment string, c_acctbal double, c_nationkey int",
    )
    orig = mod._t
    mod._t = lambda spark, sf_dir, name: df
    try:
        got = {r.c_mktsegment: r for r in mod.q_stats_agg(spark, "unused").collect()}
    finally:
        mod._t = orig
    assert got["X"]["var_acctbal"] is None   # n=1 -> NULL, no crash
    assert got["Y"]["var_acctbal"] is not None


def test_source_quota_prefilter_path_equals_plain(spark, sf_dir):
    """The hash-threshold prefilter (the 100 TB form) must select the exact
    same rows as the plain window, and the quota must hold per source."""
    from pyspark_kmeans_spark.operators.analytics import source_quota_sample
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plain = sorted(
        r.doc_id for r in source_quota_sample(docs, 25).select("doc_id").collect()
    )
    pre = sorted(
        r.doc_id
        for r in source_quota_sample(docs, 25, prefilter_factor=4)
        .select("doc_id")
        .collect()
    )
    assert plain == pre
    counts = (
        source_quota_sample(docs, 25)
        .groupBy("source")
        .count()
        .collect()
    )
    assert all(r["count"] <= 25 for r in counts)


def test_training_order_is_gap_free_permutation_of_global_sort(spark, sf_dir):
    import hashlib

    from pyspark_kmeans_spark.operators.analytics import training_order
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    rows = training_order(docs).collect()
    assert sorted(r.position for r in rows) == list(range(1, len(rows) + 1))
    got = [r.doc_id for r in sorted(rows, key=lambda r: r.position)]
    want = sorted(
        (r.doc_id for r in rows),
        key=lambda i: (hashlib.md5(f"0:{i}".encode()).hexdigest(), i),
    )
    assert got == want


def test_training_order_epochs_differ(spark, sf_dir):
    from pyspark_kmeans_spark.operators.analytics import training_order
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    e0 = [r.doc_id for r in sorted(training_order(docs, epoch=0).collect(), key=lambda r: r.position)]
    e1 = [r.doc_id for r in sorted(training_order(docs, epoch=1).collect(), key=lambda r: r.position)]
    assert sorted(e0) == sorted(e1)
    assert e0 != e1


def test_training_order_bucket_depths_agree(spark, sf_dir):
    """n_buckets=16 and n_buckets=256 must produce the identical order
    (the bucket is only a parallelism knob, never a semantics knob)."""
    import pytest as _pytest

    from pyspark_kmeans_spark.operators.analytics import training_order
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    b16 = sorted(map(tuple, training_order(docs, n_buckets=16).collect()))
    b256 = sorted(map(tuple, training_order(docs, n_buckets=256).collect()))
    assert b16 == b256
    with _pytest.raises(ValueError, match="power of 16"):
        training_order(docs, n_buckets=100).count()


def test_source_quota_prefilter_keeps_null_sources(spark):
    """NULL source is its own window partition in the plain path; the
    prefilter path must keep it too (eqNullSafe join, review fix)."""
    from pyspark_kmeans_spark.operators.analytics import source_quota_sample

    rows = [(i, None if i % 2 else "s") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plain = sorted(r.doc_id for r in source_quota_sample(df, 5).collect())
    pre = sorted(
        r.doc_id
        for r in source_quota_sample(df, 5, prefilter_factor=8).collect()
    )
    assert plain == pre
    assert sum(1 for i in plain if i % 2) == 5  # 5 NULL-source keepers


def test_source_quota_prefilter_guard_catches_wiped_source(spark):
    """A source whose survivors drop to ZERO must trip the loud guard, not
    silently vanish (review fix: guard joins from the counts side)."""
    import hashlib

    from pyspark_kmeans_spark.operators.analytics import source_quota_sample

    # Ids whose 12-hex md5 prefix is in the TOP 40% of hash space: with
    # quota=1, factor=2 and 5 docs the cut is 2/5 of the space, so every
    # row of this source is prefiltered away -> 0 survivors < quota.
    high = [
        i
        for i in range(10_000)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        > int(0.6 * (1 << 48))
    ][:5]
    df = spark.createDataFrame(
        [(i, "wiped") for i in high], "doc_id long, source string"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="under-selected"):
        source_quota_sample(df, 1, prefilter_factor=2)


def test_weighted_sample_matches_python_reference(spark, sf_dir):
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark_kmeans_spark.operators.analytics import weighted_sample
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    got = [
        r.doc_id for r in weighted_sample(docs, 50, "n_chars").collect()
    ]
    rows = {r.doc_id: r.n_chars for r in docs.collect()}

    def key(i):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) + 1.0) / (
            1 << 48
        )
        if rows[i] <= 0:
            return 0.0
        # F.round is HALF_UP; Python round() is banker's — they disagree on
        # exact halves at the 12th decimal (~1 in 20k keys), so the
        # reference must round the same way Spark does (review fix).
        return float(
            Decimal(repr(u ** (1.0 / rows[i]))).quantize(
                Decimal("1e-12"), ROUND_HALF_UP
            )
        )

    want = sorted(rows, key=lambda i: (-key(i), i))[:50]
    assert sorted(got) == sorted(want)
    # Weighting sanity: the length-weighted sample skews long — its mean
    # doc length must exceed the corpus mean.
    corpus_mean = sum(rows.values()) / len(rows)
    sample_mean = sum(rows[i] for i in got) / len(got)
    assert sample_mean > corpus_mean


def test_event_distinct_rollup_accuracy(spark, sf_dir):
    """Mergeable-HLL weekly rollup: at test cardinalities the sketch is
    near-exact — every week must be in-bounds, and merging can never
    produce an estimate below any single day's true distinct count."""
    from pyspark_kmeans_spark.operators.analytics import (
        q_event_distinct_rollup,
    )

    rows = q_event_distinct_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["in_bounds"], r
        assert r["approx_users"] > 0
        assert r["n_days_merged"] >= 1


def test_salted_join_rejects_outer_semantics(spark):
    """Right/full/semi/anti would multiply unmatched small rows by the
    salt count — the helper must refuse instead of silently duplicating."""
    import pytest

    from pyspark_kmeans_spark.functions.skew import salted_join

    a = spark.range(4).withColumnRenamed("id", "k")
    b = spark.range(4).withColumnRenamed("id", "k")
    for how in ("full", "right", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(a, b, "k", how=how)


def test_leakage_safe_split_planted(spark):
    """Planted near-dup graph whose components straddle the NAIVE md5
    split: the cluster-aware split must move every member onto the
    representative's side, and the report must equal an independent
    python replay of the rule (components by union, md5 rule per rep)."""
    import hashlib

    from pyspark_kmeans_spark.operators.analytics import leakage_safe_split

    def naive(key: int) -> str:
        d = hashlib.md5(str(key).encode()).hexdigest()[0]
        return {"0": "test", "1": "val"}.get(d, "train")

    # Find two ids with DIFFERENT naive splits to guarantee at least one
    # moved doc, plus a second component entirely inside one split.
    ids = list(range(1, 61))
    a = next(i for i in ids if naive(i) != "train")
    b = next(i for i in ids if naive(i) == "train" and i != a)
    c, d_ = (
        [i for i in ids if naive(i) == "train" and i not in (a, b)][:2]
    )
    pair_list = [(min(a, b), max(a, b)), (min(c, d_), max(c, d_))]

    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    pairs = spark.createDataFrame(pair_list, "doc_a long, doc_b long")
    got = {
        r["split"]: (r["n_docs"], r["n_groups"], r["n_docs_moved"])
        for r in leakage_safe_split(docs, pairs).collect()
    }

    rep = {i: i for i in ids}
    for x, y in pair_list:
        lo = min(rep[x], rep[y])
        for k, v in list(rep.items()):
            if v in (rep[x], rep[y]):
                rep[k] = lo
    want: dict[str, list[int]] = {}
    for i in ids:
        s = naive(rep[i])
        n_docs, groups, moved = want.setdefault(s, [0, set(), 0])
        want[s][0] += 1
        want[s][1].add(rep[i])
        want[s][2] += int(naive(i) != s)
    assert got == {
        s: (n, len(g), m) for s, (n, g, m) in want.items()
    }
    # The construction planted a genuine repair: component {a,b} members
    # had different naive splits, so at least one doc moved.
    assert sum(m for _, _, m in got.values()) >= 1
