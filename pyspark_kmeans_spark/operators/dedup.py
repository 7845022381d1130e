"""Deduplication operators over the `documents` table (north-star §7.5).

Five dedup families, each picked for a different scale/accuracy point:

 - **exact** (hash-groupBy): md5 fingerprint → keep min doc_id.  One
   shuffle on the fingerprint; linear at any scale.
 - **token-set Jaccard** (prefix-filter join): exact Jaccard over distinct
   token sets within language blocks, with AllPairs/SSJoin-style prefix
   filtering (Bayardo et al. WWW'07, Chaudhuri et al. ICDE'06) so candidate
   generation is an equi-join on rare prefix tokens instead of an O(block²)
   self-join.  Exact — the correctness oracle for the approximate methods —
   and no longer quadratic in block size.
 - **MinHash + LSH** (shingle → minhash → band → bucket join): the 100 TB
   path.  Signatures are built with JVM-side array expressions (universal
   hashing over xxhash64 — no Python in the loop), bands hashed and
   exploded, candidates joined per (band, bucket) — no O(n²) anywhere.
 - **SimHash**: 64-bit fingerprint; banded exact-match on 16-bit quarters
   guarantees recall for Hamming distance ≤ 3 (pigeonhole), verified with
   bit_count(a XOR b).
 - **embedding cosine**: near-dup pairs by cosine over the embeddings table
   (see similarity.py for the top-k search variants).

MinHash/SimHash use xxhash64, which DuckDB lacks → those queries get the
driver's rows-only check; their recall vs the exact-Jaccard oracle is pinned
in tests/test_dedup.py instead.
"""

from __future__ import annotations

import logging
import random
from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from pyspark_kmeans_spark.functions.persist import registered_persist, release_persisted
from pyspark_kmeans_spark.operators.text import (
    QUALITY_SCORE_SQL,
    WS_RE,
    with_fingerprint,
)
from pyspark_kmeans_spark.sources.tables import load_table

# Mersenne prime 2^31-1: universal-hash modulus.  The modulus must be of the
# same magnitude as the hashed domain — with a 2^61-scale modulus and 2^31
# inputs, a*h+b wraps at most once and the "permutations" stay order-
# correlated with h (bands then miss true near-dups; recall measured at 0.92
# instead of the theoretical 0.9998).  With p=2^31-1 the products wrap ~2^31
# times and the family behaves like independent permutations.
_MERSENNE31 = (1 << 31) - 1

# Default MinHash-LSH banding parameters.  Single source of truth shared
# by every signing/banding call site in this module AND by the over-cap
# witnesses in operators/checks.py (ADVICE r7 #3: the witnesses previously
# hard-coded 64/8/7/5000, so a default change here would have silently
# made them measure a different banding than the pair stage uses).
LSH_NUM_HASHES = 64
LSH_BANDS = 8
LSH_SEED = 7
LSH_BUCKET_CAP = 5000

_LOG = logging.getLogger(__name__)


def tokens_col(text_col: str = "text") -> F.Column:
    """Distinct whitespace tokens (the unit for Jaccard and MinHash)."""
    return F.array_distinct(F.split(F.trim(F.col(text_col)), WS_RE))


def hashed_tokens_col(text_col: str = "text") -> F.Column:
    """Distinct xxhash64 token ids — the verify unit for the LSH path.

    Jaccard over hashed-token sets equals Jaccard over the token sets up to
    xxhash64 collisions (~n²/2^64 per document pair — negligible), and
    array_intersect over bigint arrays is roughly an order of magnitude
    cheaper than over string arrays (no per-element string hashing/equality
    in the join's hot loop).  Used only by the no-oracle LSH path; the
    exact-oracle path (jaccard_pairs) keeps string tokens bit-for-bit.
    """
    return F.transform(tokens_col(text_col), lambda t: F.xxhash64(t))


# Shared session-scoped persist registry (functions/persist.py): each new
# query releases the previous query's cached blocks.
_persist = registered_persist


def shingles_col(text_col: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles — order-sensitive dedup unit (token
    sets are order-blind; shingles catch reshuffled near-dups).  Pure JVM
    array expressions.

    try_element_at, not element_at: a doc with fewer than n words makes the
    guarded sequence still emit i=1, and under Spark 4's default ANSI mode
    element_at THROWS on the out-of-bounds tail indices instead of
    returning NULL — a 2-word doc would abort the whole job.  try_element_at
    yields NULL and concat_ws skips NULLs, producing the short doc's
    under-length gram exactly like the DuckDB oracle's slice does."""
    words = F.split(F.trim(F.col(text_col)), WS_RE)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(words, i + j) for j in range(n)]
        ),
    )
    return F.array_distinct(grams)


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id row per fingerprint, as an AGGREGATE argmin —
    min_by(struct(all columns), id) per fingerprint — not a row_number
    window (VERDICT r8 "What's wrong" #2, the same rewrite keep_best_kept
    got in round 8): fingerprint group sizes are unbounded — a viral exact
    duplicate (the empty-page/boilerplate flood, precisely what exact
    dedup exists to remove) makes ONE fingerprint millions of rows, and a
    window sorts that group inside a single task, while min_by runs as a
    partial+final aggregate: map-side combine shrinks every partition to
    one candidate row per fingerprint BEFORE the shuffle, so the hot key
    costs one comparison per row instead of a single-task sort.  Ids are
    unique, so the kept set is identical to the window spelling
    (tests/test_dedup.py + the hypothesis property pin it)."""
    fp = with_fingerprint(df, text_col)
    cols = df.columns
    return (
        fp.groupBy("fingerprint")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_row"))
        .select(*[F.col("_row").getField(c).alias(c) for c in cols])
    )


def duplicate_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-fingerprint keeper + copy count (the dedup report)."""
    return (
        with_fingerprint(df, text_col)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# Exact token-set Jaccard (blocked) — the oracle for approximate methods
# --------------------------------------------------------------------------


def _check_block_bound(
    cached: DataFrame, block_col: str, max_block_rows: int | None, caller: str
) -> None:
    """Raise when any block exceeds `max_block_rows`.

    Runs one cheap agg over an already-persisted frame.  Since the round-3
    prefix-filter rework nothing in this family is O(block²) anymore, so the
    bound is an OPTIONAL caller-declared contract (default None) rather than
    a required safety guard; when set, an oversized block still fails loudly
    (VERDICT r2 item 3)."""
    if max_block_rows is None:
        return
    row = (
        cached.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .agg(F.max("_cnt").alias("_max"))
        .first()
    )
    biggest = row["_max"] if row else None
    if biggest is not None and biggest > max_block_rows:
        raise ValueError(
            f"{caller}: largest block holds {biggest} rows > max_block_rows="
            f"{max_block_rows}, the caller-declared block-size contract — "
            "raise max_block_rows (or leave it None: candidate generation "
            "is prefix-filtered, not O(block²)), or use the MinHash-LSH "
            "path (minhash_lsh_pairs / lsh_near_dedup_kept) for capped "
            "candidate volume"
        )


def _prefix_docs(
    base: DataFrame, threshold: float, id_col: str
) -> DataFrame:
    """Persisted (id, _block, _ts, _n, _prefix [, passthrough cols]) frame
    for prefix-filter set-similarity joins.

    `base` must carry (id_col, _block, _toks) plus any extra columns to
    thread through.  Tokens are re-ordered by GLOBAL document frequency
    ascending (ties by token) — the shared total order the prefix lemma
    requires; rare-first ordering makes prefix buckets small.  `_ts` is the
    full reordered token array (set-equal to _toks, so array_intersect
    verification is unaffected); `_prefix` is its first
    n − ⌈t·n⌉ + 1 elements.

    Prefix lemma (Chaudhuri et al. ICDE'06; Bayardo et al. WWW'07): under a
    common total order, J(A,B) ≥ t implies |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, and two
    sets with overlap ≥ α must share an element within their first
    |X| − α + 1 elements — so candidates sharing NO prefix token can be
    skipped without affecting exactness.  The ⌈·⌉ is computed as
    ceil(t·n − 1e-9): float jitter may only LENGTHEN the prefix (safe),
    never shorten it.

    Cost: one groupBy(token) for frequencies, one token-keyed join, one
    groupBy(id) to re-assemble — all linear in corpus token volume; nothing
    quadratic in block or corpus size.
    """
    extra = [
        c for c in base.columns if c not in (id_col, "_block", "_toks")
    ]
    ex = base.select(
        F.col(id_col), "_block", *extra, F.explode("_toks").alias("_tok")
    )
    freq = ex.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    ordered = (
        ex.join(freq, on="_tok")
        .groupBy(id_col, "_block", *extra)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_df"), F.col("_tok")))
            ).alias("_ord")
        )
    )
    n = F.size("_ord")
    prefix_len = n - F.ceil(F.lit(threshold) * n - F.lit(1e-9)) + 1
    docs = _persist(
        ordered.select(
            F.col(id_col),
            "_block",
            *extra,
            F.transform("_ord", lambda s: s["_tok"]).alias("_ts"),
            n.alias("_n"),
            F.slice(
                F.transform("_ord", lambda s: s["_tok"]), F.lit(1), prefix_len
            ).alias("_prefix"),
        )
    )
    # Eager materialization: the frame feeds both sides of the candidate
    # join; a lazy persist lets the two sides race and tokenize twice.
    docs.count()
    return docs


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    *,
    block_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_block_rows: int | None = None,
) -> DataFrame:
    """All pairs within a block with token-set Jaccard >= threshold — EXACT,
    via a prefix-filter set-similarity join (AllPairs/SSJoin family).

    Jaccard = |A∩B| / |A∪B| — two ints, so the double is exact (no rounding
    needed for oracle equality).  Candidate generation is an equi-join on
    (prefix token, block): each doc contributes only its n − ⌈t·n⌉ + 1
    globally-rarest tokens (~10% at t=0.9), and the prefix lemma guarantees
    every qualifying pair shares one (see _prefix_docs) — the round-2
    O(block²) self-join is gone, so the exact path now scales with candidate
    volume (≈ output size on real corpora), not block².  Verification keeps
    the exact size prune + single array_intersect per candidate.

    `max_block_rows` remains as an optional caller-declared contract (raise
    when any block exceeds it); the default is None because the algorithm no
    longer degrades quadratically with block size.  Worst-case candidate
    volume is inherently output-bound: N identical docs genuinely have N²/2
    qualifying pairs — use lsh_near_dedup_kept / max_bucket for capped
    behavior.
    """
    base = df.select(
        F.col(id_col),
        F.col(block_col).alias("_block"),
        tokens_col(text_col).alias("_toks"),
    )
    docs = _prefix_docs(base, threshold, id_col)
    _check_block_bound(docs, "_block", max_block_rows, "jaccard_pairs")
    # Candidate join carries ONLY scalars (id, size, prefix token): a doc
    # with a p-token prefix would otherwise ship p copies of its FULL token
    # array through the exchange — O(n²·t'/…) bytes per doc.  The arrays
    # are attached AFTER the candidate dedup by id-joins against the
    # persisted docs frame (the same ship-arrays-last pattern as
    # minhash_lsh_pairs' verify stage).
    a = docs.select(
        F.col(id_col).alias("doc_a"),
        "_block",
        F.col("_n").alias("_na"),
        F.posexplode("_prefix").alias("_pia", "_ptok"),
    )
    b = docs.select(
        F.col(id_col).alias("doc_b"),
        "_block",
        F.col("_n").alias("_nb"),
        F.posexplode("_prefix").alias("_pib", "_ptok"),
    )
    # Exact size prune: j >= t implies min(|A|,|B|) >= t*max(|A|,|B|) — a
    # cheap int predicate evaluated before the candidate dedup.
    size_ok = (F.col("_na") >= F.lit(threshold) * F.col("_nb")) & (
        F.col("_nb") >= F.lit(threshold) * F.col("_na")
    )
    # PPJoin positional filter (Xiao et al., WWW'08 — round 12): under the
    # shared total order, J ≥ t requires overlap I ≥ α =
    # ⌈t·(na+nb)/(1+t)⌉, and a shared prefix token at (0-based) positions
    # (pa, pb) bounds I ≤ min(na − pa, nb − pb) — every shared element of
    # the pair lies at-or-after the FIRST shared token in both docs, and
    # the prefix lemma puts that first shared token inside both prefixes,
    # so each qualifying pair has at least one generating join row that
    # passes.  Rows failing the bound are provably non-qualifying: pruned
    # BEFORE the candidate dedup exchange and the array-attach joins, so
    # false candidates never ship token arrays.  ⌈·⌉ as ceil(x − 1e-9):
    # float jitter may only LOWER α (keep more candidates — safe).
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("_na") + F.col("_nb"))
        - F.lit(1e-9)
    )
    pos_ok = (
        F.least(
            F.col("_na") - F.col("_pia"), F.col("_nb") - F.col("_pib")
        )
        >= alpha
    )
    # shuffle_hash: both sides are explodes of the PERSISTED docs frame —
    # Generate keeps its child's size estimate, so the prefix fan-out is
    # invisible to the static planner and either side can be mis-chosen
    # for broadcast at scale (the cache→explode→join shape that killed the
    # LSH path at a 64x corpus before its hints).
    # Grouped two-level attach (round 13 — same rewrite as _verify_jaccard,
    # see there): ONE groupBy(doc_a) with map-side partial collect_set
    # replaces the per-pair dropDuplicates exchange AND the a-side attach
    # join's re-exchange; a pair sharing k prefix tokens still verifies
    # exactly once (collect_set dedups), `_ta` attaches once per distinct
    # doc_a, and only the exploded per-pair row crosses the doc_b exchange.
    grp = (
        a.join(b.hint("shuffle_hash"), on=["_ptok", "_block"])
        .filter((F.col("doc_a") < F.col("doc_b")) & size_ok & pos_ok)
        .groupBy("doc_a")
        .agg(F.collect_set("doc_b").alias("_bs"))
    )
    # shuffle_hash: same static-estimate hazard as minhash_lsh_pairs'
    # verify joins — the candidate frame is explode-derived (no usable
    # size estimate) and the docs side is corpus-scale; neither may be
    # broadcast at scale.
    with_a = grp.join(
        docs.select(
            F.col(id_col).alias("doc_a"), F.col("_ts").alias("_ta")
        ).hint("shuffle_hash"),
        on="doc_a",
    )
    pair_rows = with_a.select(
        "doc_a", "_ta", F.explode("_bs").alias("doc_b")
    )
    with_b = pair_rows.join(
        docs.select(
            F.col(id_col).alias("doc_b"), F.col("_ts").alias("_tb")
        ).hint("shuffle_hash"),
        on="doc_b",
    )
    inter = F.size(F.array_intersect("_ta", "_tb"))
    # |A∪B| = |A|+|B|-|A∩B| exactly (both arrays are distinct): one
    # array_intersect per pair instead of intersect + distinct-of-concat —
    # halves the per-pair cost with an identical double result.  |A| and
    # |B| as size(_ts) — identical ints to the `_n` the candidate rows
    # used to carry (_ts is the full reordered token array).
    union = F.size("_ta") + F.size("_tb") - inter
    jac = inter.cast("double") / union
    return (
        with_b.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def near_dedup_kept(
    df: DataFrame,
    threshold: float = 0.9,
    *,
    block_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_block_rows: int | None = None,
) -> DataFrame:
    """Greedy lowest-id-wins near-dedup: drop any doc that has a near-dup
    with a smaller id (single-link, one hop — matches the usual
    drop-later-duplicates pipeline semantics)."""
    pairs = jaccard_pairs(
        df,
        threshold,
        block_col=block_col,
        id_col=id_col,
        text_col=text_col,
        max_block_rows=max_block_rows,
    )
    # shuffle_hash: the loser set is pair-derived (explode lineage — no
    # usable static estimate) and at corpus scale can be billions of ids;
    # it must never be statically broadcast.
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return df.join(
        losers.hint("shuffle_hash"), on=id_col, how="left_anti"
    ).select(id_col)


# --------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    *,
    num_hashes: int = 32,
    seed: int = LSH_SEED,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig: array<bigint>) — minhash over distinct tokens.

    One xxhash64 per token, then `num_hashes` universal hashes
    (a*h+b mod 2^31-1, matching the 31-bit folded domain — see the module
    comment on why a wider modulus destroys recall) folded with array_min
    — all JVM expressions, zero
    Python per row, no shuffle.
    """
    base = hashed_tokens_col(text_col)
    return df.select(
        F.col(id_col), _sig_col(base, num_hashes=num_hashes, seed=seed).alias("sig")
    )


def _sig_col(hashed_tokens, *, num_hashes: int, seed: int) -> F.Column:
    """MinHash signature expression over a bigint token-hash array."""
    rng = random.Random(seed)
    coeffs = [
        (rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
        for _ in range(num_hashes)
    ]
    # Map xxhash64 into [0, 2^31-1) so a*h+b stays within long range.
    h31 = F.transform(hashed_tokens, lambda h: F.pmod(h, F.lit(_MERSENNE31)))
    return F.array(
        *[
            F.array_min(
                F.transform(
                    h31, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MERSENNE31)
                )
            )
            for a, b in coeffs
        ]
    )


def band_entries_from_sig(
    sig_df: DataFrame,
    *,
    bands: int,
    rows_per_band: int,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id [, extra…], band, bucket) — one row per (doc, band); bucket =
    hash of the band's signature slice.  Shared by the batch LSH path and
    the persisted-signature incremental path (banding a stored signature
    table is a cheap array-slice hash — no re-tokenization)."""
    return sig_df.select(
        F.col(id_col),
        *extra_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.hash(
                            F.slice(sig_col, i * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, *extra_cols, "bb.band", "bb.bucket")


def _grouped_buckets(
    entries: DataFrame,
    member_col: F.Column,
    max_bucket: int | None,
    caller: str,
) -> DataFrame:
    """(band, bucket, _ms: sorted member array) for every bucket with ≥2
    members, persisted + eagerly materialized; buckets larger than
    `max_bucket` dropped with a logged member count.

    This is the ONLY shuffle of the LSH candidate stage: ONE
    groupBy(band, bucket) with map-side partial collect_list.  Candidate
    pairs are then partition-local array expansions over `_ms` — the
    round-2 spelling (window count over raw entries + band-entries
    self-join) paid an extra full exchange+sort of the entry frame for the
    sizing AND a second exchange for the join's other side; both are gone
    (measured ~2× on dedup_minhash_lsh at sf0.1).

    The cap bounds the flood mode: a degenerate (band, bucket) group with B
    members yields B² candidates — at corpus scale one boilerplate
    mega-bucket (identical license headers, empty docs) floods a task.
    With grouped members the size test is a free `size(_ms)` predicate, and
    an uncapped bucket can no longer skew the JOIN either (there is no
    join) — the cap only bounds the per-row pair expansion.

    Eager materialization closes the lazy-persist race (ADVICE r2):
    downstream consumers would otherwise race to compute uncached
    partitions and the expensive signature expression could run twice.
    With a cap set, the flood-guard aggregate below IS the materializing
    action (a full scan of the persisted frame) — the separate count()
    would be a redundant extra job per capped LSH query (round 12).
    """
    grouped = _persist(
        entries.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(member_col)).alias("_ms"))
        .filter(F.size("_ms") >= 2)
    )
    if max_bucket is None:
        grouped.count()
        return grouped
    n_dropped = (
        grouped.filter(F.size("_ms") > max_bucket)
        .agg(F.coalesce(F.sum(F.size("_ms")), F.lit(0)).alias("n"))
        .first()["n"]
    )
    if n_dropped:
        _LOG.warning(
            "%s: dropped %d band-entries in degenerate buckets larger than "
            "max_bucket=%d (boilerplate flood guard); near-dup pairs inside "
            "those buckets are not reported",
            caller,
            n_dropped,
            max_bucket,
        )
        return grouped.filter(F.size("_ms") <= max_bucket)
    return grouped


def _bucket_candidates(
    entries: DataFrame,
    max_bucket: int | None,
    caller: str,
    id_col: str,
    *,
    n_col: str | None = None,
    threshold: float | None = None,
    deduped: bool = True,
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs (doc_a < doc_b) from banded bucket
    entries — no self-join: posexplode each sorted member list and pair
    every member with its tail slice, partition-local after the single
    groupBy shuffle.  Per-row memory is O(bucket size) (the tail slice),
    never O(bucket²).

    With `n_col`/`threshold` the member structs carry each doc's token
    count and the exact size prune (j ≥ t ⟹ min(n) ≥ t·max(n)) runs
    DURING pair expansion — failing pairs never reach the candidate
    distinct or the token-array verify joins, instead of being carried
    through both and filtered at the end.

    `deduped=False` (round 13) skips the cross-band `distinct` for callers
    whose downstream already deduplicates — _verify_jaccard's grouped
    collect_set attach absorbs the dedup into its own exchange, so paying
    a separate distinct exchange first would shuffle the candidate set
    twice for nothing."""
    if n_col is None:
        grouped = _grouped_buckets(entries, F.col(id_col), max_bucket, caller)
        out = (
            grouped.select("_ms", F.posexplode("_ms").alias("_i", "doc_a"))
            .select(
                "doc_a",
                F.explode(
                    F.slice("_ms", F.col("_i") + 2, F.size("_ms"))
                ).alias("doc_b"),
            )
        )
        return out.distinct() if deduped else out
    member = F.struct(F.col(id_col).alias("_id"), F.col(n_col).alias("_sz"))
    grouped = _grouped_buckets(entries, member, max_bucket, caller)
    expanded = grouped.select(
        "_ms", F.posexplode("_ms").alias("_i", "_a")
    ).select(
        "_a",
        F.explode(F.slice("_ms", F.col("_i") + 2, F.size("_ms"))).alias("_b"),
    )
    size_ok = (
        F.col("_a._sz") >= F.lit(threshold) * F.col("_b._sz")
    ) & (F.col("_b._sz") >= F.lit(threshold) * F.col("_a._sz"))
    out = expanded.filter(size_ok).select(
        F.col("_a._id").alias("doc_a"), F.col("_b._id").alias("doc_b")
    )
    return out.distinct() if deduped else out


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.9,
    num_hashes: int = LSH_NUM_HASHES,
    bands: int = LSH_BANDS,
    seed: int = LSH_SEED,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = LSH_BUCKET_CAP,
) -> DataFrame:
    """Candidate generation via banded LSH, then exact-Jaccard verification.

    bands=8 × rows=8 → candidate probability 1-(1-j⁸)⁸: j=0.9 → 98.9%
    recall; j=0.7 → 38%, j=0.6 → 13% — mid-similarity pairs mostly skip the
    expensive verification.  (rows=4 floods verification on corpora with
    large near-dup clusters: measured 8.5M candidates for 246k true pairs.)
    Candidates join per (band, bucket) — shuffle-friendly, no cross
    product; hot buckets are handled by AQE skew-join.  The exact size
    prune (jaccard_pairs' min(n) ≥ t·max(n)) runs INSIDE pair expansion
    via _bucket_candidates(n_col=...), so pruned pairs never reach the
    candidate distinct or the verify joins.

    Round-12 note (measured dead end, kept for the record): moving the
    exact verification INSIDE the bucket expansion — member structs
    carrying their token arrays — removes the per-candidate array attach
    exchanges but materializes the full `_ms` member-array column on
    every posexplode output row, i.e. B² × array-bytes PER BUCKET inside
    the expansion task (a 1,000-member bucket of 2.4 KB arrays builds
    ~2.4 GB of rows before the first filter).  On the clique-heavy sf0.1
    corpus that regressed dedup_minhash_lsh 11 s → 52-75 s.  The slim
    candidates → dropDuplicates → attach-arrays-by-id-join shape below
    moves each array once per surviving candidate instead — see
    OPTIMIZATION_r12.md.

    `max_bucket` bounds the worst case: a degenerate (band, bucket) group
    with B members would emit B² candidates; groups larger than the cap are
    dropped with a logged count (see _grouped_buckets).  The default is far
    above any honest near-dup cluster at the tested SFs — output is
    unchanged unless the corpus contains a boilerplate flood.

    LSH finds ~4× MORE pairs than the lang-blocked exact path on the
    testdata corpus: the blocked path can only see same-lang pairs, while
    LSH is blind to blocks and surfaces cross-lang duplicates (translated/
    copied docs with identical token sets), which are true j≥0.9 pairs.
    Conversely every lang-blocked exact pair must be recalled by LSH —
    pinned ≥0.98 at sf0.01 in
    tests/test_dedup.py::test_minhash_lsh_cross_block_recall_sf001.
    """
    rows_per_band = num_hashes // bands
    # ONE cached token-hash frame feeds signatures, banding, AND the exact
    # verify — tokenize+hash runs once.  NO eager count here (round 13):
    # the first downstream action is _grouped_buckets' flood-guard
    # aggregate, whose lineage references `toks` exactly ONCE (via the
    # banding expansion), so it materializes the cache with no
    # two-consumer race — the verify joins that reference `toks` twice
    # run strictly later and read the filled cache.  The separate count
    # was a full extra single-task tokenize pass (0.3-1.4 s at sf0.1).
    # Contrast lsh_near_dedup_kept, whose FIRST action references its
    # persisted frame three times and therefore keeps the eager count.
    toks = _persist(
        df.select(F.col(id_col), hashed_tokens_col(text_col).alias("_toks"))
        .withColumn("_n", F.size("_toks"))
    )
    # Banded bucket entries → grouped member lists (ONE shuffle; the
    # signature — num_hashes universal hashes per token — computes once
    # into the persisted grouped frame) → partition-local pair expansion.
    sig = _sig_col(F.col("_toks"), num_hashes=num_hashes, seed=seed)
    candidates = _bucket_candidates(
        band_entries_from_sig(
            toks.select(F.col(id_col), F.col("_n"), sig.alias("sig")),
            bands=bands,
            rows_per_band=rows_per_band,
            id_col=id_col,
            extra_cols=("_n",),
        ),
        max_bucket,
        "minhash_lsh_pairs",
        id_col,
        n_col="_n",
        threshold=threshold,
        # The grouped verify dedups via collect_set — a separate distinct
        # here would shuffle the candidate set twice (round 13).
        deduped=False,
    )

    return _verify_jaccard(candidates, toks, threshold, id_col)


def _verify_jaccard(
    candidates: DataFrame, toks: DataFrame, threshold: float, id_col: str
) -> DataFrame:
    """Exact-Jaccard verification of (doc_a, doc_b) candidates against the
    persisted (id, _toks, _n) token frame → (doc_a, doc_b, jaccard ≥ t).

    Grouped two-level attach (round 13 — VERDICT r12 item 2, guide
    §2.3/§2.4).  Candidates need NOT be pre-deduplicated: ONE
    groupBy(doc_a) with map-side partial collect_set replaces the callers'
    separate distinct exchange AND the a-side attach join's re-exchange
    (the groupBy output is already hash-partitioned on doc_a, so the join
    reuses its partitioning).  `_ta` is then attached once per DISTINCT
    doc_a instead of once per candidate, the partner set is exploded
    partition-locally, and only the exploded per-pair row crosses the
    doc_b exchange.  Net plan effect per LSH query: two full-candidate-set
    exchanges (dedup + join repartition) collapse into one, and the a-side
    join probes |distinct doc_a| rows instead of |candidates|.  The doc_b
    exchange still carries one `_ta` array per surviving candidate — the
    measured floor of this design (OPTIMIZATION_r12.md dead ends 1/3/4
    bracket the alternatives: bucket-local verify B²-blows, token-explode
    counting shuffles ~3× the bytes, the equal-set shortcut hits 1.4%).

    Per-group memory is bounded: a doc's candidate-partner count is capped
    by max_bucket × bands on the LSH paths and is output-bound on the
    exact prefix path, so a collect_set array stays far below task memory
    (≤ ~40k bigints at the default cap).

    shuffle_hash hints: BOTH attach sides are corpus-scale and the grouped
    candidate frame has explode lineage (garbage static size estimate — at
    a 64x corpus Catalyst once "estimated" it broadcastable and died
    collecting 12 GiB to the driver).  The hint pins a shuffled hash join:
    no broadcast of an unboundedly-large side, no sort, per-task hash
    tables bounded by the shuffle partitioning.
    """
    grp = candidates.groupBy("doc_a").agg(
        F.collect_set("doc_b").alias("_bs")
    )
    with_a = grp.join(
        toks.select(
            F.col(id_col).alias("doc_a"), F.col("_toks").alias("_ta"), F.col("_n").alias("_na")
        ).hint("shuffle_hash"),
        on="doc_a",
    )
    pairs = with_a.select(
        "doc_a", "_na", "_ta", F.explode("_bs").alias("doc_b")
    )
    with_b = pairs.join(
        toks.select(
            F.col(id_col).alias("doc_b"), F.col("_toks").alias("_tb"), F.col("_n").alias("_nb")
        ).hint("shuffle_hash"),
        on="doc_b",
    )
    inter = F.size(F.array_intersect("_ta", "_tb"))
    # |A∪B| = |A|+|B|-|A∩B| (distinct arrays): one bigint intersect per
    # candidate is the entire verify cost.  No size filter here — every
    # surviving candidate already passed the exact size prune during pair
    # expansion (property-pinned in test_properties.py); repeating the
    # predicate would be a second copy of the threshold to keep in sync.
    union = F.col("_na") + F.col("_nb") - inter
    jac = inter.cast("double") / union
    return (
        with_b.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash: bigint) — 64-bit SimHash over token xxhash64 values.

    explode → 64 conditional sums → bit reassembly; one shuffle on id.
    """
    exploded = df.select(
        F.col(id_col), F.explode(hashed_tokens_col(text_col)).alias("_h")
    )
    bit_sums = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_b{i}")
            for i in range(64)
        ]
    )
    def _bit_value(i: int) -> int:
        # bit 63 is the sign bit of a signed long: 1<<63 must be encoded as
        # Long.MIN_VALUE (adding it sets the bit via two's-complement wrap).
        return (1 << i) if i < 63 else -(1 << 63)

    fingerprint = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"_b{i}") > 0, F.lit(_bit_value(i))).otherwise(F.lit(0).cast("long")),
        range(1, 64),
        F.when(F.col("_b0") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
    )
    return bit_sums.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    *,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = LSH_BUCKET_CAP,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Banding: split the 64-bit fingerprint into 4 × 16-bit quarters; any pair
    with Hamming ≤ 3 must agree exactly on ≥1 quarter (pigeonhole), so
    quarter-bucket co-membership finds all of them — no O(n²).

    Same flood-mode shape as MinHash banding, so it uses the SAME
    grouped-bucket expansion: ONE groupBy(quarter, value) shuffle, buckets
    larger than `max_bucket` dropped with a logged count (a hot quarter
    value — e.g. the near-zero fingerprint of templated short docs — would
    otherwise expand B² pairs), and the Hamming filter applied
    row-locally BEFORE the pair `distinct`, so only near-dup volume — not
    every quarter collision — reaches the dedup exchange."""
    sh = simhash(df, id_col=id_col, text_col=text_col)
    entries = sh.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("band"),
                        F.shiftrightunsigned("simhash", q * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("bb"),
        F.struct(
            F.col(id_col).alias("id"), F.col("simhash").alias("sh")
        ).alias("m"),
    ).select("bb.band", "bb.bucket", "m")
    grouped = _grouped_buckets(entries, F.col("m"), max_bucket, "simhash_pairs")
    pairs = grouped.select(
        "_ms", F.posexplode("_ms").alias("_i", "ma")
    ).select(
        "ma",
        F.explode(F.slice("_ms", F.col("_i") + 2, F.size("_ms"))).alias("mb"),
    )
    hamming = F.bit_count(F.col("ma.sh").bitwiseXOR(F.col("mb.sh")))
    return (
        pairs.select(
            F.col("ma.id").alias("doc_a"),
            F.col("mb.id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------------------------------------
# Query registry
# --------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    release_persisted()
    return duplicate_groups(load_table(spark, sf_dir, "documents"))


def q_dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    release_persisted()
    return jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.9)


def q_dedup_kept_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    release_persisted()
    return near_dedup_kept(load_table(spark, sf_dir, "documents"), threshold=0.9)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    release_persisted()
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), threshold=0.9)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    release_persisted()
    return simhash_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3)


def lsh_near_dedup_kept(
    df: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = LSH_BUCKET_CAP,
) -> DataFrame:
    """The 100 TB dedup deliverable: the kept-document set via LSH.

    Same greedy lowest-id-wins semantics as near_dedup_kept (drop b iff
    ANY a < b has jaccard ≥ threshold), but candidates come from banded
    MinHash — nothing quadratic in corpus size.

    Unlike the pair-set queries, kept-set semantics only need ONE
    qualifying partner per dropped doc, so verification runs in TWO WAVES
    instead of over the full bucket pair expansion (round 5; measured
    2.6M → ~30k verified candidates on the sf0.1 corpus, where 961k true
    pairs resolve just 2.6k drops):

    - Wave 1 pairs every bucket member with its bucket's MINIMUM id only
      (Σ(B-1) candidates per bucket instead of B(B-1)/2), spelled
      ARRAY-FREE — a groupBy min + an equi-join back on (band, bucket) —
      so it carries NO bucket cap and NO per-row O(bucket) memory: a
      degenerate 10^6-member boilerplate bucket costs 10^6 verifies (not
      5·10^11) and, unlike the capped pair path, still gets DEDUPED
      instead of skipped-with-a-warning.  On clique-heavy corpora — the
      real-world near-dup shape — the cluster minimum shares a bucket
      with nearly every member, so wave 1 resolves almost all drops.
    - Wave 2 runs the capped grouped-bucket expansion with resolved docs
      FILTERED OUT of the b-side inside the member array (resolved docs
      stay on the a-side: a dropped doc still kills later ids — greedy is
      one-hop, not transitive).  Only pairs among still-unresolved docs —
      true uniques and stragglers whose bucket-min failed the size prune
      or the exact verify — reach the second verify, and those docs are
      precisely the ones with few true partners.

    Wave 1 is a subset of the full candidate set and wave 2 is complete
    for every doc wave 1 left unresolved, so the union of drops equals
    the full expansion's drop set whenever no bucket exceeds `max_bucket`
    (output equality with the pair-set spelling is pinned in
    tests/test_dedup.py); past the cap this path drops strictly MORE true
    duplicates than the pair-set spelling (planted-flood test).
    """
    num_hashes, bands, seed = 64, 8, 7
    rows_per_band = num_hashes // bands
    # ONE persisted frame carries (id, _toks, _n, sig) for wave-1 banding,
    # the wave-1 verify joins, AND wave-2 banding (round 12 — previously
    # two persisted frames with two eager counts; one materialization pass
    # fewer, same bytes cached).  Eager count: the lazy-persist race, see
    # minhash_lsh_pairs.
    sigf = _persist(
        df.select(F.col(id_col), hashed_tokens_col(text_col).alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .withColumn(
            "sig", _sig_col(F.col("_toks"), num_hashes=num_hashes, seed=seed)
        )
    )
    sigf.count()

    size_ok = (
        F.col("_a._sz") >= F.lit(threshold) * F.col("_b._sz")
    ) & (F.col("_b._sz") >= F.lit(threshold) * F.col("_a._sz"))

    # Wave 1: per-bucket minimum as a WINDOW min over (band, bucket)
    # (struct min = lexicographic = min id first) instead of the round-5
    # groupBy + join-back (round 13, guide §2.4): the join spelling
    # expanded the unpersisted banding expression TWICE (agg input + join
    # probe) and paid two exchanges; every entry row must reach its
    # bucket's reducer anyway to be paired with the minimum, so the
    # window's single exchange ships the same bytes once, and the
    # partition-local sort replaces the join probe.  Pair set is
    # bit-identical (same min struct, same filters; pinned by the
    # twowave-vs-pairs equality tests).  No member list materializes; a
    # degenerate bucket costs one sorted run, never B².
    entries = band_entries_from_sig(
        sigf, bands=bands, rows_per_band=rows_per_band,
        id_col=id_col, extra_cols=("_n",),
    )
    member = F.struct(F.col(id_col).alias("_id"), F.col("_n").alias("_sz"))
    w1 = (
        entries.select(
            member.alias("_b"),
            F.min(member).over(Window.partitionBy("band", "bucket")).alias("_a"),
        )
        .filter(F.col("_a._id") < F.col("_b._id"))
        .filter(size_ok)
        .select(F.col("_a._id").alias("doc_a"), F.col("_b._id").alias("doc_b"))
    )
    dropped1 = _persist(
        _verify_jaccard(w1, sigf, threshold, id_col)
        .select(F.col("doc_b").alias(id_col))
        .distinct()
    )
    dropped1.count()

    # Wave 2: capped grouped-bucket expansion with resolved docs pruned
    # from the b-side INSIDE the member arrays (JVM array filter — the
    # pruned pairs are never materialized).  shuffle_hash: dropped1 is
    # pair-derived (explode lineage, no usable static estimate;
    # corpus-scale at 100 TB).  Members stay SLIM (id, size, resolved
    # flag) — carrying token arrays into the member lists materializes
    # B² × array-bytes per bucket in the expansion (the round-12
    # bucket-local-verify dead end, see minhash_lsh_pairs).
    tagged = sigf.join(
        dropped1.withColumn("_res", F.lit(1)).hint("shuffle_hash"),
        on=id_col,
        how="left",
    ).na.fill({"_res": 0})
    entries2 = band_entries_from_sig(
        tagged, bands=bands, rows_per_band=rows_per_band,
        id_col=id_col, extra_cols=("_n", "_res"),
    )
    member2 = F.struct(
        F.col(id_col).alias("_id"), F.col("_n").alias("_sz"), F.col("_res")
    )
    grouped2 = _grouped_buckets(
        entries2, member2, max_bucket, "lsh_near_dedup_kept[wave2]"
    )
    unresolved_tail = F.filter(
        F.slice("_ms", F.col("_i") + 2, F.size("_ms")),
        lambda m: m["_res"] == 0,
    )
    # No distinct: the grouped verify's collect_set dedups (round 13).
    w2 = (
        grouped2.select("_ms", F.posexplode("_ms").alias("_i", "_a"))
        .select("_a", F.explode(unresolved_tail).alias("_b"))
        .filter(size_ok)
        .select(F.col("_a._id").alias("doc_a"), F.col("_b._id").alias("doc_b"))
    )
    dropped2 = (
        _verify_jaccard(w2, sigf, threshold, id_col)
        .select(F.col("doc_b").alias(id_col))
        .distinct()
    )

    # shuffle_hash: same rationale as near_dedup_kept — pair-derived loser
    # sets have explode lineage (no usable static estimate) and can be
    # billions of ids at corpus scale; never statically broadcast.
    losers = dropped1.unionByName(dropped2).distinct()
    return df.join(
        losers.hint("shuffle_hash"), on=id_col, how="left_anti"
    ).select(id_col)


def q_dedup_lsh_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    release_persisted()
    return lsh_near_dedup_kept(load_table(spark, sf_dir, "documents"), threshold=0.9)


def near_dup_clusters(
    pairs: DataFrame,
    *,
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair graph → (doc_id, cluster_id)
    with cluster_id = min doc_id in the component.

    Single-hop drop-the-later-doc dedup (near_dedup_kept) over-keeps on
    chains a-b-c where only adjacent pairs match; component-level dedup
    keeps exactly one doc per transitive cluster.  Algorithm: iterative
    min-label propagation with POINTER DOUBLING — each round every node
    adopts the smallest of {its label, its neighbors' labels, its label's
    label}.  The label-of-label hop halves the remaining distance to the
    component minimum each round, so convergence is O(log diameter) rounds
    (a chain of 10^6 docs converges in ~20 rounds), not O(diameter) as in
    plain propagation.  Each round is two shuffle joins; localCheckpoint
    truncates lineage so plans don't grow exponentially.

    Raises RuntimeError if the label assignment has not stabilized within
    `max_iterations` — silently returning partial labels would split
    transitive clusters with no warning (VERDICT r1 item 5).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # Pointer-doubling hop: label of my current label (labels is keyed
        # by doc_id; cluster_id values ARE doc ids, so self-join resolves
        # the parent's label).
        parent = labels.select(
            F.col("doc_id").alias("_pid"), F.col("cluster_id").alias("parent_min")
        )
        new_cid = F.least(
            F.col("cluster_id"),
            F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
            F.coalesce(F.col("parent_min"), F.col("cluster_id")),
        )
        # The convergence test rides along as a flag column computed
        # BEFORE the old label is projected away — the checkpoint
        # materializes it with the labels, so `changed` is one cheap
        # aggregate over the checkpointed frame instead of the round-11
        # shape's extra new⋈old shuffle join per iteration (round 12).
        # LAZY checkpoint (round 13): the convergence aggregate right
        # below is the checkpoint's materializing action — it computes
        # every row of the checkpointed RDD in the same job, so the
        # separate eager-checkpoint job per iteration is gone.  Safe from
        # the lazy-persist race: the agg references the frame exactly
        # once, and the next iteration (which references it three times)
        # runs strictly after the checkpoint is materialized.  The
        # INITIAL checkpoint before the loop stays eager — its first
        # consumer references it multiple times in one job.
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .join(parent, labels.cluster_id == parent._pid, "left")
            .select(
                "doc_id",
                new_cid.alias("_new_cid"),
                (new_cid != F.col("cluster_id")).cast("int").alias("_chg"),
            )
            .withColumnRenamed("_new_cid", "cluster_id")
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(F.sum("_chg")).first()[0]
        labels = new_labels.drop("_chg")
        if not changed:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"near_dup_clusters did not converge within {max_iterations} "
            "iterations; raise max_iterations (components of diameter "
            f"> 2^{max_iterations} are implausible — check the pair graph)"
        )
    return labels


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters from the exact blocked pair graph:
    (doc_id, cluster_id, cluster_size) for docs in non-trivial clusters."""
    release_persisted()
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, 0.9)
    labels = near_dup_clusters(pairs)
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, on="cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


def keep_best_kept(
    docs: DataFrame,
    labels: DataFrame,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware keeper selection over a component labelling: per
    near-dup cluster keep the HIGHEST-quality member (text.with_quality's
    composite score; ties break to the lowest id), plus every doc in no
    cluster.  The production alternative to min-id-wins dedup: when a
    boilerplate cluster mixes a clean original with mangled copies, min-id
    keeps whichever was crawled first — quality-aware selection keeps the
    best one, the choice an LLM-corpus pipeline actually wants.

    `labels` is any (doc_id, cluster_id) component frame — the exact
    blocked graph (near_dup_clusters ∘ jaccard_pairs, the oracle path) or
    the LSH pair graph (lsh_near_dup_clusters, the 100 TB path) plug in
    unchanged.  Plan: quality scoring is zero-shuffle per-row expressions;
    keeper selection is an AGGREGATE argmax — max_by(id, struct(quality,
    -id)) per cluster_id — not a row_number window (VERDICT r7 "What's
    wrong" #1): component sizes on a near-dup graph are unbounded (a
    boilerplate flood can chain millions of members into one component)
    and a window sorts each cluster inside a single task, while max_by
    runs as a partial+final aggregate (SortAggregate — the struct-typed
    ordering buffer keeps it off the hash path, but partial_max_by still
    runs BEFORE the exchange): map-side combine shrinks every partition
    to one candidate per cluster before the shuffle, so a mega-component
    costs one comparison per row plus a parallel per-partition sort by
    cluster_id instead of a single-task sort of the whole component.
    The struct ordering encodes the same tie-break
    (highest quality, then lowest id: max of -id == min id; ties
    impossible since ids are unique), so the kept set is identical —
    same ROW_NUMBER oracle, pinned by dedup_keep_best's driver hash."""
    from pyspark_kmeans_spark.operators.text import with_quality

    scored = with_quality(docs).select(id_col, "quality_score")
    keepers = (
        labels.join(scored, on=id_col)
        .groupBy("cluster_id")
        .agg(
            F.max_by(
                F.col(id_col),
                F.struct(
                    F.col("quality_score").alias("_q"),
                    (-F.col(id_col)).alias("_neg_id"),
                ),
            ).alias(id_col)
        )
        .select(id_col)
    )
    singletons = docs.select(id_col).join(labels, on=id_col, how="left_anti")
    return singletons.unionByName(keepers)


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup with quality-aware keeper selection on the
    exact blocked pair graph (oracle replays components via recursive CTE
    + the text_quality score + the same ROW_NUMBER argmax)."""
    release_persisted()
    docs = load_table(spark, sf_dir, "documents")
    labels = near_dup_clusters(jaccard_pairs(docs, 0.9))
    return keep_best_kept(docs, labels)


def lsh_near_dup_clusters(
    df: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = LSH_BUCKET_CAP,
) -> DataFrame:
    """The 100 TB clustering deliverable: connected components over the
    MinHash-LSH pair graph instead of the O(block²) exact graph — the whole
    pipeline (signatures → bucket join → verify → label propagation) is
    shuffle-bound with nothing quadratic in corpus size.

    This path keeps the FULL pair expansion (no two-wave shortcut):
    component labels depend on every edge, so the kept-set trick — stop
    verifying a doc once one killer is found — does not apply; the bucket
    cap remains the flood guard here.  Set-equality vs
    the exact-graph clusters is pinned in tests/test_dedup.py (the LSH graph
    can only miss edges, and at threshold 0.9 / 8×8 bands recall ≈ 0.989 per
    edge; identical clusters on the testdata corpus)."""
    pairs = minhash_lsh_pairs(
        df,
        threshold=threshold,
        id_col=id_col,
        text_col=text_col,
        max_bucket=max_bucket,
    )
    labels = near_dup_clusters(pairs)
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, on="cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


def q_dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive clusters over the MinHash-LSH pair graph (the scale
    path).  no_oracle: the LSH edge set is approximate (per-edge recall
    ≈ 0.989 at 8×8 bands / j≥0.9); set-equality vs the exact-graph
    clusters on the testdata corpus is pinned in tests/test_dedup.py."""
    release_persisted()
    return lsh_near_dup_clusters(
        load_table(spark, sf_dir, "documents"), threshold=0.9
    )


def incremental_kept(
    new_df: DataFrame,
    corpus_df: DataFrame,
    *,
    threshold: float = 0.9,
    block_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_block_rows: int | None = None,
) -> DataFrame:
    """Incremental ingestion dedup (exact, blocked): which NEW docs survive
    against an existing corpus plus earlier docs in their own batch?

    A new doc is dropped when it has a j≥threshold match to ANY corpus doc
    (corpus always wins — it is already ingested) or to a lower-id doc in
    the same batch (greedy min-id-wins, same rule as near_dedup_kept).
    Candidates come from the same exact prefix-filter join as jaccard_pairs
    (bipartite: any doc × batch doc sharing a rare prefix token within a
    block), so nothing here is quadratic in block size; `max_block_rows`
    remains as an optional caller-declared contract.  The LSH spelling
    (lsh_incremental_kept / incremental_kept_against) is the
    persisted-signature 100 TB path and is subset-tested against this one.
    """

    def _toks(df: DataFrame, tag: int) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.col(block_col).alias("_block"),
            tokens_col(text_col).alias("_toks"),
            F.lit(tag).alias("_is_corpus"),
        )

    base = _toks(corpus_df, 1).unionByName(_toks(new_df, 0))
    docs = _prefix_docs(base, threshold, id_col)
    _check_block_bound(docs, "_block", max_block_rows, "incremental_kept")
    # Scalars-only candidate join + attach-arrays-after-dedup — the same
    # shuffle-volume fix as jaccard_pairs (see there), including the
    # PPJoin positional filter (round 12; proof at jaccard_pairs).
    a = docs.select(
        F.col(id_col).alias("_doc_a"),
        "_block",
        "_is_corpus",
        F.col("_n").alias("_na"),
        F.posexplode("_prefix").alias("_pia", "_ptok"),
    )
    b = docs.filter(F.col("_is_corpus") == 0).select(
        F.col(id_col).alias("_doc_b"),
        "_block",
        F.col("_n").alias("_nb"),
        F.posexplode("_prefix").alias("_pib", "_ptok"),
    )
    size_ok = (F.col("_na") >= F.lit(threshold) * F.col("_nb")) & (
        F.col("_nb") >= F.lit(threshold) * F.col("_na")
    )
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("_na") + F.col("_nb"))
        - F.lit(1e-9)
    )
    pos_ok = (
        F.least(F.col("_na") - F.col("_pia"), F.col("_nb") - F.col("_pib"))
        >= alpha
    )
    precedence = (F.col("_is_corpus") == 1) | (F.col("_doc_a") < F.col("_doc_b"))
    # Grouped two-level attach (round 13 — same rewrite as _verify_jaccard,
    # see there): collect_set absorbs the pair dedup into the groupBy
    # exchange, `_ta` attaches once per distinct _doc_a, only the exploded
    # per-pair row crosses the _doc_b exchange.
    grp = (
        a.join(b, on=["_ptok", "_block"])
        .filter(
            precedence
            & (F.col("_doc_a") != F.col("_doc_b"))
            & size_ok
            & pos_ok
        )
        .groupBy("_doc_a")
        .agg(F.collect_set("_doc_b").alias("_bs"))
    )
    pair_rows = grp.join(
        docs.select(F.col(id_col).alias("_doc_a"), F.col("_ts").alias("_ta")),
        on="_doc_a",
    ).select("_doc_a", "_ta", F.explode("_bs").alias("_doc_b"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.size("_ta") + F.size("_tb") - inter
    jac = inter.cast("double") / union
    losers = (
        pair_rows.join(
            docs.select(F.col(id_col).alias("_doc_b"), F.col("_ts").alias("_tb")),
            on="_doc_b",
        )
        .filter(jac >= threshold)
        .select(F.col("_doc_b").alias(id_col))
        .distinct()
    )
    return new_df.join(losers, on=id_col, how="left_anti").select(id_col)


def lsh_incremental_kept(
    new_df: DataFrame,
    corpus_df: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = LSH_BUCKET_CAP,
) -> DataFrame:
    """Self-contained scale form of incremental ingestion dedup: MinHash-LSH
    pairs over corpus ∪ batch, keep a new doc unless it pairs with a corpus
    doc or a lower-id batch doc.  Kills strictly more than the blocked exact
    path (LSH also sees cross-block duplicates), so kept(LSH) ⊆ kept(exact)
    — asserted in tests/test_dedup.py.

    This spelling RE-SIGNS the whole corpus every run — fine for one-shot
    jobs, wrong for a daily 100 TB ingestion.  The production form is
    build_signature_table (written once, parquet) + incremental_kept_against
    (signs only the batch); output-equality between the two is pinned in
    tests/test_dedup.py."""
    new_ids = new_df.select(F.col(id_col)).withColumn("_new", F.lit(1))
    pairs = minhash_lsh_pairs(
        corpus_df.unionByName(new_df),
        threshold=threshold,
        id_col=id_col,
        text_col=text_col,
        max_bucket=max_bucket,
    )
    # Tag each side, then apply precedence: corpus always wins (a new doc
    # matching a corpus doc loses REGARDLESS of id order); between two new
    # docs the lower id wins (pair output guarantees doc_a < doc_b).
    tagged = (
        pairs.join(
            new_ids.select(F.col(id_col).alias("doc_a"), F.col("_new").alias("_na")),
            on="doc_a",
            how="left",
        ).join(
            new_ids.select(F.col(id_col).alias("doc_b"), F.col("_new").alias("_nb")),
            on="doc_b",
            how="left",
        )
    )
    lose_a = tagged.filter(
        (F.col("_na") == 1) & F.col("_nb").isNull()
    ).select(F.col("doc_a").alias(id_col))
    lose_b = tagged.filter(F.col("_nb") == 1).select(F.col("doc_b").alias(id_col))
    losers = lose_a.unionByName(lose_b).distinct()
    return new_df.join(losers, on=id_col, how="left_anti").select(id_col)


def build_signature_table(
    df: DataFrame,
    *,
    num_hashes: int = LSH_NUM_HASHES,
    seed: int = LSH_SEED,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, toks: array<bigint>, n: int, sig: array<bigint>) — the corpus
    signature table a production ingestion pipeline writes ONCE to parquet
    and appends each accepted batch to.

    Holds everything incremental dedup needs about a document: hashed token
    ids (for the exact-Jaccard verify) and the MinHash signature (band
    buckets are derived from `sig` by cheap array-slice hashing at query
    time — see band_entries_from_sig — so the band count can change without
    rebuilding the table).  Linear, shuffle-free, parquet-writable.
    """
    return df.select(
        F.col(id_col), hashed_tokens_col(text_col).alias("toks")
    ).select(
        id_col,
        "toks",
        F.size("toks").alias("n"),
        _sig_col(F.col("toks"), num_hashes=num_hashes, seed=seed).alias("sig"),
    )


def incremental_kept_against(
    signatures: DataFrame,
    new_df: DataFrame,
    *,
    threshold: float = 0.9,
    num_hashes: int = LSH_NUM_HASHES,
    bands: int = LSH_BANDS,
    seed: int = LSH_SEED,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = LSH_BUCKET_CAP,
) -> DataFrame:
    """Production incremental ingestion dedup: sign ONLY the batch, join its
    band buckets against a stored corpus signature table (VERDICT r2 item 4).

    `signatures` is a build_signature_table frame (typically a parquet
    read); the 100 TB corpus is never re-tokenized — its band entries come
    from cheap slice-hashes over the stored `sig` arrays, and only the
    batch pays tokenize+minhash.  Semantics are identical to
    lsh_incremental_kept (corpus always wins; between batch docs the lower
    id wins) whenever no bucket exceeds `max_bucket`: output equality is
    pinned in tests/test_dedup.py.  Verification runs in TWO WAVES (round
    5, the lsh_near_dedup_kept shape): wave 1 pairs each batch doc with
    only the bucket's min corpus member and min batch member — array-free
    and UNCAPPED, so batch docs landing in boilerplate buckets larger
    than the cap are still deduped (strictly more complete than the
    capped expansion alone; planted-flood test) — and wave 2 runs the
    capped grouped expansion for whatever wave 1 left unresolved.
    `num_hashes`/`seed` must match the
    values the signature table was built with — the stored signature WIDTH
    is validated loudly below (a silent mismatch would band past the stored
    arrays' end, buckets would never collide, and every duplicate batch doc
    would be kept); the seed cannot be validated from the data and remains
    the caller's contract.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"incremental_kept_against: num_hashes={num_hashes} is not "
            f"divisible by bands={bands} — trailing hashes would be "
            "silently discarded by the band slicing"
        )
    # Width validation memo (round 13): the check is one tiny job, but it
    # ran on EVERY batch run even though ensure_signature_table hands out
    # the SAME session-memoized DataFrame for a write-once table — so a
    # passed check is stamped on the DataFrame object and re-validated
    # only when the object (or the requested width) changes.  A caller
    # passing a fresh DataFrame per run keeps the per-run check.
    if getattr(signatures, "_sig_width_checked", None) != num_hashes:
        first = signatures.select(F.size("sig").alias("_w")).first()
        if first is not None and first["_w"] != num_hashes:
            raise ValueError(
                f"incremental_kept_against: stored signature width {first['_w']} "
                f"!= num_hashes={num_hashes}; the table was built with different "
                "MinHash parameters — rebuild it or pass the matching num_hashes"
            )
        try:
            signatures._sig_width_checked = num_hashes
        except Exception:
            pass  # frozen/slotted frame: fall back to per-run validation
    rows_per_band = num_hashes // bands
    bat = _persist(
        build_signature_table(
            new_df, num_hashes=num_hashes, seed=seed, id_col=id_col, text_col=text_col
        )
    )
    n_batch = bat.count()
    all_sig = signatures.select(
        F.col(id_col), "toks", "n", "sig", F.lit(1).alias("_is_corpus")
    ).unionByName(
        bat.select(F.col(id_col), "toks", "n", "sig", F.lit(0).alias("_is_corpus"))
    )
    def _verify_losers(candidates: DataFrame, sig_side: DataFrame) -> DataFrame:
        """(doc_a, doc_b) candidates → distinct losing batch ids: exact
        size prune + Jaccard verify + the precedence rule (corpus always
        beats a batch doc; between batch docs the lower id wins).

        `sig_side` is the frame the a-side token arrays come from — passed
        EXPLICITLY (not closed over) because the caller narrows `all_sig`
        to the batch-adjacent persisted slice after this helper is
        defined; a closure would silently verify against whichever frame
        the name happened to mean at call time.

        Grouped two-level attach (round 13 — same rewrite as
        _verify_jaccard, see there): candidates need not be pre-deduped —
        collect_set absorbs the dedup into the groupBy(doc_a) exchange,
        `_ta` attaches once per distinct doc_a, and only the exploded
        per-pair row meets the batch side.

        shuffle_hash on the a-side: the explode-derived candidate frame
        has no usable size estimate and the corpus∪batch token side is
        unboundedly large; never broadcast.  No hint on the batch side:
        `bat` is the bounded daily batch (the whole point of the
        incremental form) and its cached size estimate is real — AQE may
        broadcast it when it actually fits (and then the fat exploded
        side never crosses an exchange at all)."""
        grp = candidates.groupBy("doc_a").agg(
            F.collect_set("doc_b").alias("_bs")
        )
        with_a = grp.join(
            sig_side.select(
                F.col(id_col).alias("doc_a"),
                F.col("toks").alias("_ta"),
                F.col("n").alias("_na"),
                "_is_corpus",
            ).hint("shuffle_hash"),
            on="doc_a",
        )
        pair_rows = with_a.select(
            "doc_a", "_ta", "_na", "_is_corpus",
            F.explode("_bs").alias("doc_b"),
        )
        with_b = pair_rows.join(
            bat.select(
                F.col(id_col).alias("doc_b"),
                F.col("toks").alias("_tb"),
                F.col("n").alias("_nb"),
            ),
            on="doc_b",
        )
        size_ok = (F.col("_na") >= F.lit(threshold) * F.col("_nb")) & (
            F.col("_nb") >= F.lit(threshold) * F.col("_na")
        )
        inter = F.size(F.array_intersect("_ta", "_tb"))
        union = F.col("_na") + F.col("_nb") - inter
        jac = inter.cast("double") / union
        precedence = (F.col("_is_corpus") == 1) | (
            F.col("doc_a") < F.col("doc_b")
        )
        return (
            with_b.filter(precedence)
            .filter(size_ok)
            .filter(jac >= threshold)
            .select(F.col("doc_b").alias(id_col))
            .distinct()
        )

    # Batch-adjacency prune (round 5): a bucket with no batch member can
    # never produce a candidate, so the corpus's band entries are filtered
    # MAP-SIDE against the batch's (band, bucket) key set before any agg.
    # F.broadcast is justified here by construction: the key set is at
    # most |batch|×bands rows — the bounded-daily-batch contract this
    # whole function rests on (same argument as the unhinted verify-join
    # batch side below).  Without the prune both waves would groupBy the
    # ENTIRE corpus's band entries on every batch run — corpus-sized work
    # for batch-sized output.
    batch_buckets = band_entries_from_sig(
        bat.select(F.col(id_col), "sig"),
        bands=bands,
        rows_per_band=rows_per_band,
        id_col=id_col,
    ).select("band", "bucket").distinct()
    entries = _persist(
        band_entries_from_sig(
            all_sig,
            bands=bands,
            rows_per_band=rows_per_band,
            id_col=id_col,
            extra_cols=("_is_corpus",),
        ).join(
            F.broadcast(batch_buckets), on=["band", "bucket"], how="left_semi"
        )
    )

    # ONE corpus-scale pass materializes the batch-adjacent slice of the
    # signature table (the only docs any candidate can name); both verify
    # waves join against this persisted slice, so the corpus token arrays
    # are scanned and shuffled once per batch run — not once per wave.
    # The count below is ALSO the eager materializer for `entries` (round
    # 13 — it was a separate count() job before): near_ids scans the
    # just-persisted entries exactly once inside this single action, so
    # there is no two-consumer race, and one full-scan job disappears
    # from the per-batch chain.
    near_ids = entries.select(F.col(id_col)).distinct()
    all_sig_near = _persist(
        all_sig.join(near_ids.hint("shuffle_hash"), on=id_col, how="left_semi")
    )
    all_sig_near.count()

    # Wave 1 (round 5 — the two-wave shape of lsh_near_dedup_kept applied
    # to the bipartite form): pair every batch member with just TWO bucket
    # representatives — the minimum-id corpus member (ANY corpus match
    # kills a batch doc, so one representative suffices as a first try)
    # and the minimum-id batch member (killer of every later batch doc in
    # the bucket).  Array-free partial-agg groupBy + equi-join: NO bucket
    # cap and no per-row O(bucket) memory, so a 10^6-member boilerplate
    # corpus bucket costs ONE candidate per batch doc instead of 10^6 —
    # and batch docs landing in capped buckets still get deduped instead
    # of silently kept.
    # Round 13: the two bucket representatives come from WINDOW mins over
    # (band, bucket) instead of the round-5 groupBy + join-back — every
    # batch entry must reach its bucket's reducer anyway to meet the
    # representatives, so the window's single exchange ships the same
    # bytes with one exchange + one join + one cache scan fewer (and
    # one fewer job in the wave-1 action chain, the scaling-ratio-1.00
    # fix VERDICT r12 item 3 asked for).  Pair set bit-identical; the
    # grouped verify's collect_set dedups (no separate distinct).
    wband = Window.partitionBy("band", "bucket")
    w1 = (
        entries.select(
            F.col(id_col),
            "_is_corpus",
            F.min(F.when(F.col("_is_corpus") == 1, F.col(id_col)))
            .over(wband)
            .alias("_minc"),
            F.min(F.when(F.col("_is_corpus") == 0, F.col(id_col)))
            .over(wband)
            .alias("_minb"),
        )
        .filter(F.col("_is_corpus") == 0)
        .select(
            F.col(id_col).alias("doc_b"),
            F.explode(
                F.array_compact(
                    F.array(
                        F.col("_minc"),
                        F.when(
                            F.col("_minb") < F.col(id_col), F.col("_minb")
                        ),
                    )
                )
            ).alias("doc_a"),
        )
        .select("doc_a", "doc_b")
    )
    dropped1 = _persist(_verify_losers(w1, all_sig_near))
    n_dropped1 = dropped1.count()

    # Wave-2 skip (round 6, VERDICT r5 item 6): both counts above are
    # already forced eagerly, so this guard costs ZERO extra jobs.  If
    # wave 1 dropped the ENTIRE batch — the re-ingest-of-already-seen-data
    # case, the most common degenerate input an incremental pipeline sees
    # — wave 2 has no unresolved b-side doc by construction and the whole
    # grouped expansion (tag join + groupBy + explode + verify) is a
    # provable no-op.  The weaker condition (no unresolved batch doc IN
    # ENTRIES, though some batch docs survive outside any pruned bucket)
    # would also suffice but needs an extra batch-sized anti-join count
    # per run; measured A/B in PLANS.md — not worth paying on every
    # normal batch for the same skip.
    if n_dropped1 == n_batch:
        return new_df.join(
            dropped1.hint("shuffle_hash"), on=id_col, how="left_anti"
        ).select(id_col)

    # Wave 2: the capped grouped-bucket bipartite expansion over what wave
    # 1 left unresolved.  Members carry the corpus flag so pair generation
    # stays bipartite WITHOUT a join — the b-side is restricted to
    # UNRESOLVED batch docs inside the member array (corpus×corpus
    # cohabitation is irrelevant to which batch docs survive, so it is
    # never generated); resolved docs stay on the a-side (a dropped batch
    # doc still kills later batch ids — the rule is one-hop).  Both
    # explodes are partition-local; the groupBy inside _grouped_buckets is
    # the only shuffle of this candidate stage.  The resolved tag joins
    # onto the PERSISTED batch-adjacent entries (no second corpus scan;
    # only batch members ever read their _res flag on the b-side).
    # shuffle_hash: dropped1 is pair-derived (explode lineage, no usable
    # static estimate).
    entries2 = entries.join(
        dropped1.withColumn("_res", F.lit(1)).hint("shuffle_hash"),
        on=id_col,
        how="left",
    ).na.fill({"_res": 0})
    grouped = _grouped_buckets(
        entries2,
        F.struct(
            F.col(id_col).alias("_id"), F.col("_is_corpus"), F.col("_res")
        ),
        max_bucket,
        "incremental_kept_against",
    )
    b_rows = grouped.select(
        "_ms",
        F.explode(
            F.filter(
                F.col("_ms"),
                lambda m: (m["_is_corpus"] == 0) & (m["_res"] == 0),
            )
        ).alias("_b"),
    )
    # No distinct: the grouped verify's collect_set dedups (round 13).
    candidates = (
        b_rows.select(
            F.col("_b")["_id"].alias("doc_b"),
            F.explode(
                F.filter(
                    F.col("_ms"), lambda a: a["_id"] != F.col("_b")["_id"]
                )
            ).alias("_a"),
        )
        .select(F.col("_a")["_id"].alias("doc_a"), "doc_b")
    )
    losers = dropped1.unionByName(
        _verify_losers(candidates, all_sig_near)
    ).distinct()
    return new_df.join(losers, on=id_col, how="left_anti").select(id_col)


INCREMENTAL_BATCH_MOD = 5  # doc_id % 5 == 0 → 20% of docs are the new batch


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup over a 20% batch split of the documents table."""
    release_persisted()
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % INCREMENTAL_BATCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % INCREMENTAL_BATCH_MOD != 0)
    return incremental_kept(new, corpus, threshold=0.9)


def ensure_signature_table(
    spark: SparkSession,
    sf_dir: str,
    *,
    num_hashes: int = LSH_NUM_HASHES,
    seed: int = LSH_SEED,
) -> DataFrame:
    """Materialize ONCE per sf_dir the corpus signature table for the
    80% corpus split (doc_id % INCREMENTAL_BATCH_MOD != 0) and return the
    parquet read — the ingestion-job contract: a production pipeline
    writes/appends this table at accept time, and every later batch dedup
    only READS it (same write-once-read-thereafter convention as
    sources/sorted_layout.py's range-clustered copy).  BOTH num_hashes and
    seed are part of the cache name, so any parameter change rebuilds
    instead of silently reusing a mismatched table — a seed mismatch is
    the nastier case because the width check downstream still passes while
    buckets never collide and every duplicate batch doc is silently kept."""
    import os

    from pyspark_kmeans_spark.functions.warehouse_memo import memo_get, memo_put
    from pyspark_kmeans_spark.sources.bucketed import _WAREHOUSE, bucketed_name

    name = bucketed_name(
        f"doc_sigs_m{INCREMENTAL_BATCH_MOD}_s{seed}", sf_dir, n_buckets=num_hashes
    )
    path = os.path.join(_WAREHOUSE, name)
    # Session-scoped memo of the read handle: repeated calls were paying
    # parquet schema discovery every time (83 ms/call at sf0.1 — VERDICT
    # r6 item 5).  Deliberately NO content stamp here, unlike
    # ensure_codebook_table's memo: the signature table has no sanctioned
    # rewrite path (no refresh/update analogue — appends go to NEW batch
    # dirs, parameter changes change the path), so the write-once
    # contract makes an unstamped handle valid for the whole session.
    # Anyone adding an in-place update path later must add the stamp.
    cached = memo_get(spark, path)
    if cached is not None:
        return cached
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % INCREMENTAL_BATCH_MOD != 0
        )
        build_signature_table(
            corpus, num_hashes=num_hashes, seed=seed
        ).write.mode("overwrite").parquet(path)
    return memo_put(spark, path, spark.read.parquet(path))


def q_dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production incremental LSH dedup over the same 20% batch split: the
    corpus signatures come from the PERSISTED signature table
    (ensure_signature_table — written once per scale factor, read
    thereafter), so each run tokenizes+signs only the batch; pre-round-5
    this query rebuilt the corpus signatures inline every run and the
    rebuild was ~half its cost.  no_oracle: xxhash64-based; output equality
    vs the self-contained LSH spelling and kept ⊆ kept(exact) are pinned in
    tests/test_dedup.py."""
    release_persisted()
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % INCREMENTAL_BATCH_MOD == 0)
    sigs = ensure_signature_table(spark, sf_dir)
    return incremental_kept_against(sigs, new, threshold=0.9)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram shingle Jaccard between consecutive doc pairs — the
    order-sensitive dedup signal (linear pair probe; the blocked/LSH
    machinery above scales the same unit to all-pairs)."""
    release_persisted()
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("doc_a"), shingles_col(n=3).alias("_sa"))
    b = docs.select(F.col("doc_id").alias("doc_b"), shingles_col(n=3).alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size(F.array_distinct(F.concat("_sa", "_sb")))
    return (
        a.join(b, a.doc_a + 1 == b.doc_b)
        .select(
            "doc_a", "doc_b", (inter.cast("double") / union).alias("trigram_jaccard")
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_exact": q_dedup_exact,
    "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
    "dedup_kept_docs": q_dedup_kept_docs,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_lsh_kept": q_dedup_lsh_kept,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "dedup_clusters_lsh": q_dedup_clusters_lsh,
    "dedup_keep_best": q_dedup_keep_best,
    "dedup_incremental": q_dedup_incremental,
    "dedup_incremental_lsh": q_dedup_incremental_lsh,
}

def jaccard_pairs_sql(threshold: float) -> str:
    """The DuckDB replay of `jaccard_pairs` with the threshold
    INTERPOLATED — one source of truth for every consumer (the dedup
    oracles here at the dedup queries' own 0.9, the graph oracles at
    graph.GRAPH_PAIR_THRESHOLD), so a threshold change on either side
    cannot silently desync Spark results from the oracle (round-8 review
    finding)."""
    return f"""
    WITH toks AS (
        SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(trim(text), '[ \\t\\n]+')) AS t
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
               / len(list_distinct(list_concat(a.t, b.t))) AS jaccard
    FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
              / len(list_distinct(list_concat(a.t, b.t))) >= {threshold}
"""


_JACCARD_PAIRS_SQL = jaccard_pairs_sql(0.9)

ORACLES: dict[str, str] = {
    "dedup_exact": """
        SELECT md5(lower(regexp_replace(trim(text), '[ \\t\\n]+', ' ', 'g'))) AS fingerprint,
               MIN(doc_id) AS keeper_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "dedup_jaccard_pairs": _JACCARD_PAIRS_SQL,
    "dedup_incremental": """
        WITH toks AS (
            SELECT doc_id, lang,
                   list_distinct(regexp_split_to_array(trim(text), '[ \\t\\n]+')) AS t
            FROM documents
        ), newdocs AS (
            SELECT * FROM toks WHERE doc_id % 5 = 0
        ), losers AS (
            SELECT DISTINCT b.doc_id
            FROM toks a JOIN newdocs b
              ON a.lang = b.lang AND a.doc_id != b.doc_id
            WHERE (a.doc_id % 5 != 0 OR a.doc_id < b.doc_id)
              AND CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                  / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.9
        )
        SELECT doc_id FROM documents
        WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT doc_id FROM losers)
    """,
    # Connected components as a recursive transitive closure — O(n·e) in
    # DuckDB, fine at oracle SF; the Spark side is the O(log d)
    # pointer-doubling propagation.
    "dedup_clusters": f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
        e AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b AS a, doc_a AS b FROM pairs
        ),
        reach(doc_id, r) AS (
            SELECT DISTINCT a, a FROM e
            UNION
            SELECT e.a, reach.r FROM e JOIN reach ON reach.doc_id = e.b
        ),
        lab AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id)
        SELECT doc_id, cluster_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM lab
    """,
    "dedup_kept_docs": f"""
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT doc_b FROM ({_JACCARD_PAIRS_SQL}))
    """,
    # Components via the dedup_clusters recursive CTE; quality via the
    # text_quality oracle's scoring expression (same 6-dp rounding as
    # with_quality, so the ROW_NUMBER argmax orders identical values on
    # both engines); keeper = best quality, ties to lowest doc_id.
    "dedup_keep_best": f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
        e AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b AS a, doc_a AS b FROM pairs
        ),
        reach(doc_id, r) AS (
            SELECT DISTINCT a, a FROM e
            UNION
            SELECT e.a, reach.r FROM e JOIN reach ON reach.doc_id = e.b
        ),
        lab AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
        q AS (
            SELECT doc_id, {QUALITY_SCORE_SQL} AS quality_score
            FROM documents
        ),
        keepers AS (
            SELECT doc_id FROM (
                SELECT lab.doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY cluster_id
                           ORDER BY quality_score DESC, lab.doc_id ASC
                       ) AS rk
                FROM lab JOIN q USING (doc_id)
            ) WHERE rk = 1
        )
        SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM lab)
        UNION ALL
        SELECT doc_id FROM keepers
    """,
    # concat_ws on BOTH engines: it skips NULLs identically when a doc has
    # fewer words than the shingle width.
    "dedup_ngram_jaccard": """
        WITH words AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n]+') AS w
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 2, 1)),
                       i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
            FROM words
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.s, b.s))) AS trigram_jaccard
        FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id
    """,
    # dedup_minhash_lsh / dedup_simhash: xxhash64-based — rows-only; recall
    # vs the exact-Jaccard oracle is pinned in tests/test_dedup.py.
}
