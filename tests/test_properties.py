"""Property-based tests (hypothesis): algebraic identities of the engine's
operators on arbitrary small inputs (SURVEY.md §5).

Spark round-trips are expensive, so examples are few but adversarial:
hypothesis shrinks failures to minimal counterexamples.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SMALL = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=rows_strategy)
@settings(**SMALL)
def test_salted_agg_equals_plain_groupby(spark, rows):
    from pyspark_kmeans_spark.functions.skew import salted_agg

    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]))
    salted = {
        (r.k): (r.v_sum, r.n_rows)
        for r in salted_agg(df, ["k"], {"v_sum": "v"}, salt=4).collect()
    }
    plain = {
        (r.k): (r.v_sum, r.n)
        for r in df.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("v_sum"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(salted) == set(plain)
    for k, (s, n) in plain.items():
        assert salted[k][1] == n
        assert math.isclose(salted[k][0], s, rel_tol=0, abs_tol=0)  # exact


@given(rows=rows_strategy)
@settings(**SMALL)
def test_exact_dedup_keeps_one_per_fingerprint(spark, rows):
    from pyspark_kmeans_spark.operators.dedup import exact_dedup

    pdf = pd.DataFrame(
        [(i, f"text {k}") for i, (k, _) in enumerate(rows)],
        columns=["doc_id", "text"],
    )
    df = spark.createDataFrame(pdf)
    kept = exact_dedup(df).collect()
    # one survivor per distinct text, and it is the min doc_id
    by_text = {}
    for r in pdf.itertuples():
        by_text.setdefault(r.text, []).append(r.doc_id)
    assert len(kept) == len(by_text)
    for r in kept:
        assert r.doc_id == min(by_text[r.text])


@given(rows=rows_strategy)
@settings(**SMALL)
def test_decimal_sum_partition_invariant(spark, rows):
    """The DECIMAL-routed sum must be identical under any repartitioning —
    the property float sums lack and the whole engine relies on."""
    from pyspark_kmeans_spark.functions.exact import decimal_sum

    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]))
    a = df.coalesce(1).agg(decimal_sum("v").alias("s")).collect()[0].s
    b = df.repartition(7).agg(decimal_sum("v").alias("s")).collect()[0].s
    assert a == b  # bit-identical, not approx


@given(
    left_times=st.lists(st.integers(0, 100), min_size=1, max_size=15),
    right_times=st.lists(st.integers(0, 100), min_size=0, max_size=15),
)
@settings(**SMALL)
def test_asof_join_picks_latest_at_or_before(spark, left_times, right_times):
    from pyspark_kmeans_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate(left_times)], "key int, lid int, lt int"
    ).withColumn("lt", F.timestamp_seconds("lt"))
    right = spark.createDataFrame(
        [(1, i + 1000, t) for i, t in enumerate(right_times)],
        "rkey int, rid int, rt int",
    ).withColumn("rt", F.timestamp_seconds("rt"))
    out = asof_join(
        left,
        right,
        left_key="key",
        right_key="rkey",
        left_time="lt",
        right_time="rt",
        right_values=["rid"],
    ).collect()
    assert len(out) == len(left_times)
    by_lid = {r.lid: r.last_rid for r in out}
    for i, lt in enumerate(left_times):
        eligible = [
            (rt, i2 + 1000) for i2, rt in enumerate(right_times) if rt <= lt
        ]
        expected = max(eligible)[1] if eligible else None
        assert by_lid[i] == expected, (lt, eligible)


docs_strategy = st.lists(
    st.lists(
        st.sampled_from("abcdefgh"), min_size=1, max_size=12
    ).map(lambda toks: " ".join(toks)),
    min_size=2,
    max_size=14,
)


@given(texts=docs_strategy, threshold=st.sampled_from([0.5, 0.7, 0.9, 1.0]))
@settings(**SMALL)
def test_prefix_filter_jaccard_matches_bruteforce(spark, texts, threshold):
    """The prefix-filter candidate join is EXACT: its output must equal the
    all-pairs brute force for any corpus and threshold — this is the prefix
    lemma (and the ceil-jitter guard) under adversarial shrinking.

    Tokens drawn from a tiny alphabet maximize collisions: duplicate
    tokens within a doc (distinctness handling), identical docs (j=1.0
    pairs), and ties in the global-frequency ordering."""
    from pyspark_kmeans_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [(i, "en", t) for i, t in enumerate(texts)],
        "doc_id long, lang string, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(df, threshold=threshold).collect()
    }
    sets = {i: set(t.split(" ")) for i, t in enumerate(texts)}
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if j >= threshold:
                    want[(a, b)] = j
    assert set(got) == set(want)
    for pair, j in want.items():
        assert math.isclose(got[pair], j, rel_tol=0, abs_tol=0)


entries_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # doc id
        st.integers(min_value=0, max_value=2),  # band
        st.integers(min_value=0, max_value=3),  # bucket
    ),
    min_size=1,
    max_size=25,
).map(lambda rows: list(set(rows)))  # one entry per (doc, band) pair at most


@given(rows=entries_strategy)
@settings(**SMALL)
def test_grouped_bucket_candidates_match_self_join(spark, rows):
    """The posexplode + tail-slice pair expansion must produce EXACTLY the
    pairs the old band-entries self-join produced: {(a, b) : a < b, a and b
    share ≥1 (band, bucket)} — pinning the 1-based slice arithmetic,
    array_sort canonicalization, and cross-band distinct."""
    from pyspark_kmeans_spark.operators.dedup import _bucket_candidates

    df = spark.createDataFrame(rows, "doc_id long, band int, bucket int")
    got = {
        (r.doc_a, r.doc_b)
        for r in _bucket_candidates(df, None, "prop-test", "doc_id").collect()
    }
    buckets = {}
    for d, band, bucket in rows:
        buckets.setdefault((band, bucket), set()).add(d)
    want = {
        (a, b)
        for members in buckets.values()
        for a in members
        for b in members
        if a < b
    }
    assert got == want


pack_docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["en", "fr"]),
        st.integers(min_value=1, max_value=9),  # token count per doc
    ),
    min_size=1,
    max_size=25,
)


@given(docs=pack_docs_strategy, budget=st.sampled_from([3, 5, 16]))
@settings(**SMALL)
def test_pack_sequences_invariants(spark, docs, budget):
    """Packing conservation: offsets stay inside the budget, seq_ids are
    the contiguous concat-and-chunk layout (floor of the running token
    total), and per-shard token totals are preserved."""
    from pyspark_kmeans_spark.operators.curation import pack_sequences

    rows = [
        (i, lang, " ".join(["w"] * n)) for i, (lang, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = pack_sequences(df, budget=budget).collect()
    assert len(out) == len(rows)
    running: dict[str, int] = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        start = running.get(r["lang"], 0)
        assert 0 <= r["seq_offset"] < budget
        assert r["seq_id"] == start // budget
        assert r["seq_offset"] == start % budget
        running[r["lang"]] = start + r["n_tokens"]


merge_rows_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=15,
             unique=True),
    st.lists(st.integers(min_value=0, max_value=25), min_size=0, max_size=10,
             unique=True),
)


@given(keys=merge_rows_strategy)
@settings(**SMALL)
def test_merge_upsert_algebra(spark, keys):
    """Updates win on collision, untouched base rows pass through, and the
    output key set is exactly base ∪ updates with no duplicates."""
    from pyspark_kmeans_spark.operators.relational import merge_upsert

    base_keys, upd_keys = keys
    base = spark.createDataFrame(
        [(k, f"base_{k}") for k in base_keys], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(k, f"upd_{k}") for k in upd_keys], "k long, v string"
    ) if upd_keys else spark.createDataFrame([], "k long, v string")
    got = {r["k"]: r["v"] for r in merge_upsert(base, updates, ["k"]).collect()}
    want = {k: f"base_{k}" for k in base_keys}
    want.update({k: f"upd_{k}" for k in upd_keys})
    assert got == want


def test_merge_upsert_rejects_duplicate_update_keys(spark):
    """A CDC batch with two rows per key must be rejected loudly (SQL
    MERGE semantics) instead of silently emitting a corrupt snapshot."""
    import pytest

    from pyspark_kmeans_spark.operators.relational import merge_upsert

    base = spark.createDataFrame([(1, "b")], "k long, v string")
    updates = spark.createDataFrame(
        [(1, "u1"), (1, "u2")], "k long, v string"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_upsert(base, updates, ["k"])


def test_asof_join_contracts(spark):
    """Row-atomic attachment (no tearing), SQL NULL-key semantics, and the
    tolerance bound (review fixes)."""
    from pyspark_kmeans_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [
            (1, "2024-01-10"),
            (None, "2024-01-10"),   # NULL key: must attach nothing
            (2, "2024-06-01"),      # only an old right row: tolerance test
        ],
        "k long, lt string",
    ).selectExpr("k", "CAST(lt AS TIMESTAMP) AS lt")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0, 111),
            (1, "2024-01-05", None, 222),  # latest: a=NULL, b=222
            (None, "2024-01-01", 99.0, 999),  # NULL key: must match nothing
            (2, "2024-01-01", 5.0, 555),
        ],
        "k long, rt string, a double, b long",
    ).selectExpr("k", "CAST(rt AS TIMESTAMP) AS rt", "a", "b")

    out = {
        (r["k"], str(r["lt"])): (r["last_a"], r["last_b"])
        for r in asof_join(
            left, right, left_key="k", right_key="k",
            left_time="lt", right_time="rt", right_values=["a", "b"],
        ).collect()
    }
    # Whole latest row (a=NULL, b=222) — NOT the torn (10.0, 222).
    assert out[(1, "2024-01-10 00:00:00")] == (None, 222)
    assert out[(None, "2024-01-10 00:00:00")] == (None, None)
    assert out[(2, "2024-06-01 00:00:00")] == (5.0, 555)

    bounded = {
        r["k"]: (r["last_a"], r["last_b"])
        for r in asof_join(
            left, right, left_key="k", right_key="k",
            left_time="lt", right_time="rt", right_values=["a", "b"],
            tolerance="30 days",
        ).collect()
        if r["k"] == 2
    }
    # The only match is 5 months old -> outside tolerance -> NULL.
    assert bounded[2] == (None, None)


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 3), st.integers(1, 40)),
        min_size=0,
        max_size=40,
    )
)
@settings(**SMALL)
def test_bucket_candidates_early_size_prune_equals_post_filter(spark, rows):
    """n_col/threshold pruning during expansion must equal pruning the
    unpruned candidate set afterwards."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.operators.dedup import _bucket_candidates

    df = spark.createDataFrame(
        [(i, b, bkt, n) for i, (b, bkt, n) in enumerate(rows)],
        "doc_id long, band int, bucket int, _n long",
    )
    t = 0.8
    pruned = {
        (r.doc_a, r.doc_b)
        for r in _bucket_candidates(
            df, None, "prop", "doc_id", n_col="_n", threshold=t
        ).collect()
    }
    plain = _bucket_candidates(df, None, "prop", "doc_id")
    sizes = {i: n for i, (_, _, n) in enumerate(rows)}
    want = {
        (r.doc_a, r.doc_b)
        for r in plain.collect()
        if sizes[r.doc_a] >= t * sizes[r.doc_b]
        and sizes[r.doc_b] >= t * sizes[r.doc_a]
    }
    assert pruned == want


@given(
    base=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 100)),
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    feed=st.lists(
        st.tuples(
            st.integers(0, 8),            # key
            st.integers(1, 5),            # seq
            st.sampled_from(["I", "U", "D"]),
            st.integers(0, 100),          # value
        ),
        max_size=15,
        unique_by=lambda t: (t[0], t[1]),  # (key, seq) unique, as documented
    ),
)
@settings(**SMALL)
def test_cdc_apply_matches_python_reference(spark, base, feed):
    """Latest change per key wins; D deletes; untouched keys pass through."""
    from pyspark_kmeans_spark.operators.relational import cdc_apply

    bdf = spark.createDataFrame(base or [(99, 0)], "k long, v long")
    if not base:
        bdf = bdf.filter("k < 0")
    fdf = spark.createDataFrame(
        feed or [(99, 1, "D", 0)], "k long, seq long, op string, v long"
    )
    if not feed:
        fdf = fdf.filter("k < 0")
    got = {
        (r.k, r.v)
        for r in cdc_apply(
            bdf, fdf.select("k", "v", "op", "seq"), ["k"]
        ).collect()
    }
    snap = dict(base)
    latest = {}
    for k, seq, op, v in feed:
        if k not in latest or seq > latest[k][0]:
            latest[k] = (seq, op, v)
    for k, (_, op, v) in latest.items():
        if op == "D":
            snap.pop(k, None)
        else:
            snap[k] = v
    assert got == {(k, v) for k, v in snap.items()}


@given(
    old=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 10)), st.integers(0, 3)),
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    new=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 10)), st.integers(0, 3)),
        max_size=12,
        unique_by=lambda t: t[0],
    ),
)
@settings(**SMALL)
def test_snapshot_diff_roundtrips_through_cdc_apply(spark, old, new):
    """cdc_apply(old, snapshot_diff(old, new)) must reproduce `new` exactly
    — the two operators are inverses by contract."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.operators.relational import cdc_apply, snapshot_diff

    odf = spark.createDataFrame(old or [(99, 0)], "k long, v long")
    ndf = spark.createDataFrame(new or [(99, 0)], "k long, v long")
    if not old:
        odf = odf.filter("k < 0")
    if not new:
        ndf = ndf.filter("k < 0")
    feed = snapshot_diff(odf, ndf, ["k"]).withColumn("seq", F.lit(1))
    got = {(r.k, r.v) for r in cdc_apply(odf, feed, ["k"]).collect()}
    assert got == set(new)


@given(
    obs=st.lists(
        st.tuples(
            st.integers(0, 2),   # key
            st.integers(0, 8),   # day offset
            st.integers(0, 2),   # value id
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SMALL)
def test_scd2_intervals_reconstruct_history(spark, obs):
    """SCD-2 invariants on arbitrary observation streams: per key the
    intervals are disjoint, ordered, gap-free day-wise, only the last is
    open, consecutive values differ, and point-in-time lookup of every
    observed day returns the winning observation for that day."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.operators.temporal import scd2_intervals

    rows = [
        (k, f"2020-01-{d + 1:02d}", i, f"v{v}")
        for i, (k, d, v) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "k long, obs string, seq long, val string"
    ).withColumn("obs", F.to_date("obs"))
    got = scd2_intervals(
        df, key_col="k", time_col="obs", value_col="val", tiebreak_col="seq"
    ).collect()

    import datetime as dt

    # Expected: per (key, day) the max-seq value wins; runs collapse.
    winner: dict = {}
    for k, d, i, v in ((r[0], r[1], r[2], r[3]) for r in rows):
        if (k, d) not in winner or i > winner[(k, d)][0]:
            winner[(k, d)] = (i, v)
    by_key: dict = {}
    for r in sorted(got, key=lambda r: (r[0], r[2])):
        by_key.setdefault(r[0], []).append(r)
    for k, ivals in by_key.items():
        days = sorted(d for (kk, d) in winner if kk == k)
        # first interval starts at the first observation
        assert ivals[0][2] == days[0]
        assert ivals[-1][3] is None  # last interval open
        for a, b in zip(ivals, ivals[1:]):
            assert a[1] != b[1], "consecutive values must differ"
            # closed at the day before the next effective_from
            prev_end = dt.date.fromisoformat(a[3])
            nxt = dt.date.fromisoformat(b[2])
            assert prev_end == nxt - dt.timedelta(days=1)
        # point-in-time lookup reproduces every day's winning observation
        for d in days:
            val = next(
                iv[1]
                for iv in reversed(ivals)
                if iv[2] <= d and (iv[3] is None or d <= iv[3])
            )
            assert val == winner[(k, d)][1]


def test_scd2_intervals_null_transitions(spark):
    """A→NULL and NULL→A are real changes (null-safe detection), and a
    key whose FIRST observation is NULL still opens an interval."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.operators.temporal import scd2_intervals

    rows = [
        (1, "2020-01-01", 0, "A"),
        (1, "2020-01-02", 1, None),
        (1, "2020-01-03", 2, "A"),
        (2, "2020-01-01", 3, None),
        (2, "2020-01-02", 4, "B"),
    ]
    df = spark.createDataFrame(
        rows, "k long, obs string, seq long, val string"
    ).withColumn("obs", F.to_date("obs"))
    got = sorted(
        (
            (r[0], r[1], r[2], r[3])
            for r in scd2_intervals(
                df, key_col="k", time_col="obs", value_col="val", tiebreak_col="seq"
            ).collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert got == [
        (1, "A", "2020-01-01", "2020-01-01"),
        (1, None, "2020-01-02", "2020-01-02"),
        (1, "A", "2020-01-03", None),
        (2, None, "2020-01-01", "2020-01-01"),
        (2, "B", "2020-01-02", None),
    ]
