"""Distributed BPE merge training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the tokenizer-training
stage of an LLM data pipeline, complementing curation.py's frequency vocab
(build_vocab) and tokenizer apply (tokenize_docs).

The classic algorithm is inherently iterative WITH a data-dependent
decision per round (merge the currently most-frequent adjacent symbol
pair), so like k-means it cannot be a single declarative plan.  The Spark
shape that makes it scale:

 - The corpus-sized work happens ONCE: a word-frequency groupBy (the
   word-count shape, map-side partials).  BPE statistics are weighted by
   word frequency, so every later round runs over the VOCABULARY-sized
   frame (distinct words), which is bounded (1e5-1e7 rows) at ANY corpus
   size — the rounds get cheaper as the corpus grows relative to them.
 - Each round: explode adjacent symbol pairs (zip_with of the array with
   its own tail), one weighted groupBy, and a deterministic argmax
   (max count, lexicographic pair tie-break) — a 1-row driver round-trip,
   exactly like a k-means iteration's centroid update.
 - The winning pair is merged into every word's symbol array by a greedy
   left-to-right fold (F.aggregate — JVM lambda, no Python UDF), the
   same scan order the reference BPE implementations use.
 - The evolving vocab frame is persisted per round (registry-managed), so
   round N+1 reads round N's arrays instead of replaying N folds.

Determinism: word counts are exact, the argmax tie-break is total
(count desc, left asc, right asc), and the fold is order-defined — the
merge table is a pure function of the corpus.  No SQL oracle (iterative,
data-dependent control flow — the same class as kmeans_centers); the
driver records rows-only, and tests/test_bpe.py pins a hand-computed merge
sequence on a planted corpus plus determinism and apply-consistency.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_kmeans_spark.functions.persist import release_persisted
from pyspark_kmeans_spark.sources.tables import load_table

N_MERGES = 12


def _merge_pair(symbols, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) → left+right
    inside a symbol array, as a JVM-side fold (no Python UDF).  The
    accumulator carries the emitted prefix plus one pending symbol."""
    merged = F.lit(left + right)
    init = F.struct(
        F.lit([]).cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), x.alias("pend")),
            )
            .when(
                (acc["pend"] == F.lit(left)) & (x == F.lit(right)),
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(symbols, init, step, finish)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the (symbols, n_words) frame."""
    pairs = F.arrays_zip(
        F.slice(F.col("symbols"), 1, F.size("symbols") - 1).alias("l"),
        F.slice(F.col("symbols"), 2, F.size("symbols") - 1).alias("r"),
    )
    return (
        vocab.filter(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("_p"), "n_words")
        .select(
            F.col("_p.l").alias("left"),
            F.col("_p.r").alias("right"),
            "n_words",
        )
        .groupBy("left", "right")
        .agg(F.sum("n_words").alias("pair_count"))
    )


def bpe_merges(
    df: DataFrame,
    *,
    n_merges: int = N_MERGES,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Train `n_merges` BPE merges; returns [(rank, left, right, count)].

    The returned list is driver-side by nature (it IS the model, O(n_merges)
    rows), exactly like k-means centers."""
    words = (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_words"))
    )
    # Per-round caches are managed LOCALLY (plain persist/unpersist, not
    # the session registry): the argmax collect() in round N materializes
    # vocab_N, after which vocab_{N-1}'s cache is dead weight — release it
    # immediately so at most two generations are ever cached, and NOTHING
    # stays cached after return (the model is the driver-side merge list).
    vocab = words.select(
        F.split(F.col("w"), "(?!^)(?=.)").alias("symbols"), "n_words"
    ).persist()
    prev: DataFrame | None = None
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            top = (
                _pair_counts(vocab)
                .orderBy(
                    F.desc("pair_count"), F.asc("left"), F.asc("right")
                )
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break
            left, right, cnt = top[0].left, top[0].right, top[0].pair_count
            merges.append((rank, left, right, int(cnt)))
            prev, vocab = vocab, vocab.select(
                _merge_pair(F.col("symbols"), left, right).alias("symbols"),
                "n_words",
            ).persist()
    finally:
        if prev is not None:
            prev.unpersist()
        vocab.unpersist()
    return merges


def apply_merges(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment every document's words with a trained merge list (ranks
    applied in order — the standard BPE inference rule).  Pure JVM folds,
    linear, zero shuffle."""
    words = df.select(
        id_col,
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "w"
        ),
    ).filter(F.col("w") != "")
    symbols = F.split(F.col("w"), "(?!^)(?=.)")
    for _, left, right, _ in merges:
        symbols = _merge_pair(symbols, left, right)
    return words.select(
        id_col, "pos", F.col("w").alias("word"), symbols.alias("subwords")
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained merge table as a DataFrame (rank, left, right,
    pair_count) — deterministic given the corpus; rows-only in the driver
    sweep (iterative, data-dependent control flow), pinned by planted-
    corpus/determinism/apply tests in tests/test_bpe.py."""
    release_persisted()
    docs = load_table(spark, sf_dir, "documents")
    rows = bpe_merges(docs, n_merges=N_MERGES)
    release_persisted()
    return spark.createDataFrame(
        rows, "merge_rank int, left string, right string, pair_count long"
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bpe_merges": q_bpe_merges,
}

ORACLES: dict[str, str] = {}
