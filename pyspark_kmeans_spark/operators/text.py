"""Text analysis over the `documents` table (north-star extension §7.5).

Operators a large-scale training-data pipeline needs, all expressed with
JVM-side built-in functions (no Python in the hot path — these run over
billions of documents at the 100 TB design point, where a row-at-a-time UDF
would dominate the job cost):

 - token counting: whitespace tokens + a BPE-ish regex token count
 - quality scoring: length / punctuation / casing / stopword ratios
 - language ID: stopword-hit scoring across 5 languages, deterministic
   argmax (alphabetical tie-break)
 - document fingerprinting: md5 over whitespace-normalized text

Every query here is a single scan + narrow projections — no shuffle at all —
so it scales linearly and partition-locally.  All outputs carry DuckDB
oracles (integer counts and exact IEEE ratios; no rounding needed except the
composite quality score).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_kmeans_spark.sources.tables import load_table

# ASCII classes spelled explicitly: Java regex and RE2 (DuckDB) agree on
# these, while \w/\b unicode behavior differs between engines.
WORD_RE = "[a-zA-Z0-9_]+"
BPE_ISH_RE = "[a-zA-Z0-9_]+|[^a-zA-Z0-9_ \\t\\n]"
WS_RE = "[ \\t\\n]+"

# Stopword hit patterns per language (zh matched without word boundaries —
# CJK has no spaces and \b is engine-dependent around CJK).
LANG_PATTERNS: dict[str, str] = {
    "de": "(^| )(der|die|und|das|ist|nicht|ein)( |$)",
    "en": "(^| )(the|and|of|to|a|in|is)( |$)",
    "es": "(^| )(el|la|y|los|que|en|un)( |$)",
    "fr": "(^| )(le|la|et|les|des|un|une)( |$)",
    "zh": "的|了|是|在|我|不|人",
}


def _count(pattern: str, col: str = "text") -> F.Column:
    return F.regexp_count(F.col(col), F.lit(pattern))


# DuckDB spelling of with_quality's composite score, as one expression over
# a `text` column — the SINGLE SOURCE every oracle that re-derives the
# quality score interpolates (dedup_keep_best, curation_token_budget), so a
# scoring change can never leave an oracle silently pinning the old formula.
# Must stay arithmetically identical to with_quality() above (pinned by the
# text_quality hash row, whose oracle spells the same formula through named
# intermediates).
QUALITY_SCORE_SQL = """ROUND(
    LEAST(CAST(len(regexp_split_to_array(trim(text), '[ \\t\\n]+')) AS DOUBLE) / 100, 1.0) * 0.4
    + (1.0 - LEAST(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9_ \\t\\n]')) AS DOUBLE) / length(text) * 4, 1.0)) * 0.3
    + LEAST(CAST(len(regexp_extract_all(text, '(^| )(the|and|of|to|a|in|is)( |$)')) AS DOUBLE)
          / len(regexp_split_to_array(trim(text), '[ \\t\\n]+')) * 5, 1.0) * 0.3,
6)"""


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return df.withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col(text_col)), WS_RE))
    ).withColumn("n_bpe_tokens", F.regexp_count(F.col(text_col), F.lit(BPE_ISH_RE)))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality signals + a composite score in [0, ~1].

    All ratios are exact int/int IEEE divisions; the composite is rounded to
    6 decimals so the oracle comparison is robust to expression reordering.

    try_divide, not `/`: under Spark 4's default ANSI mode a zero-length
    document would otherwise abort the whole job with DIVIDE_BY_ZERO;
    try_divide yields NULL, matching DuckDB's x/0 → NULL.
    """
    length = F.length(F.col(text_col))
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), WS_RE))
    n_word_chars = F.length(F.regexp_replace(F.col(text_col), WS_RE, ""))
    n_punct = _count("[^a-zA-Z0-9_ \\t\\n]", text_col)
    n_upper = _count("[A-Z]", text_col)
    n_stop = _count(LANG_PATTERNS["en"], text_col)
    avg_token_len = F.try_divide(n_word_chars.cast("double"), n_tokens)
    punct_ratio = F.try_divide(n_punct.cast("double"), length)
    upper_ratio = F.try_divide(n_upper.cast("double"), length)
    stop_ratio = F.try_divide(n_stop.cast("double"), n_tokens)
    score = (
        F.least(n_tokens.cast("double") / 100, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("avg_token_len", avg_token_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("upper_ratio", upper_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("quality_score", F.round(score, 6))
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language ID: hit count per language, deterministic
    argmax with alphabetical tie-break."""
    scores = {lang: _count(pat, text_col) for lang, pat in LANG_PATTERNS.items()}
    best = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    # Alphabetical scan: the FIRST language reaching the max wins.
    for lang in sorted(scores):  # de, en, es, fr, zh
        pred = F.when(pred.isNotNull(), pred).otherwise(
            F.when(scores[lang] == best, F.lit(lang))
        )
    out = df
    for lang in sorted(scores):
        out = out.withColumn(f"score_{lang}", scores[lang])
    # NULL text leaves every score NULL and no when-branch fires; fall
    # through to 'zh' exactly like the oracle CASE's ELSE arm.
    return out.withColumn("pred_lang", F.coalesce(pred, F.lit("zh")))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of lowercased, whitespace-normalized text."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), WS_RE, " "))
    return df.withColumn("fingerprint", F.md5(normalized))


# --------------------------------------------------------------------------
# Query registry
# --------------------------------------------------------------------------


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_token_counts(docs).select("doc_id", "n_tokens", "n_bpe_tokens")


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_quality(docs).select(
        "doc_id",
        "n_tokens",
        "avg_token_len",
        "punct_ratio",
        "upper_ratio",
        "stop_ratio",
        "quality_score",
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = with_lang_id(docs)
    agree = F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0)
    return out.select(
        "doc_id",
        "lang",
        "pred_lang",
        *[f"score_{lang}" for lang in sorted(LANG_PATTERNS)],
        agree.alias("agree"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_fingerprint(docs).select("doc_id", "fingerprint")


ROLLING_HASH_MOD = 2147483647  # 2^31-1; keeps acc*31+c within long range


def with_rolling_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Polynomial rolling-hash fingerprint (acc*31 + ascii(c) mod 2^31-1)
    folded over the characters — a cheap order-sensitive fingerprint
    (md5 is order-sensitive too but 4× the state; rolling hashes extend to
    windowed/chunked fingerprinting).  Pure JVM fold, no shuffle."""
    chars = F.split(F.col(text_col), "")
    rh = F.aggregate(
        F.transform(chars, lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(ROLLING_HASH_MOD),
    )
    return df.withColumn("rolling_hash", rh)


def q_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_rolling_hash(docs).select("doc_id", "rolling_hash")


def q_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance between consecutive documents' 80-char prefixes
    (bounded operand length keeps the DP cost O(80²) per pair; the
    consecutive-pair probe keeps the pair count linear)."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("doc_a"), F.substring("text", 1, 80).alias("_pa"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.substring("text", 1, 80).alias("_pb"))
    return (
        a.join(b, a.doc_a + 1 == b.doc_b)
        .select("doc_a", "doc_b", F.levenshtein("_pa", "_pb").alias("edit_distance"))
    )


CHUNK_WINDOW = 64  # tokens per chunk
CHUNK_STRIDE = 48  # tokens between chunk starts (16-token overlap)


def chunk_documents(
    df: DataFrame,
    *,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the unit a
    training pipeline feeds a tokenizer with bounded sequence length.

    Chunk starts are 0, stride, 2·stride, … while start < n_tokens; the
    final chunk may be shorter than `window`.  Everything is JVM array
    expressions (split → sequence → explode → slice): one scan, no
    shuffle, output rows ≈ n_tokens/stride per doc — linear at any corpus
    size and partition-local.

    `extra_cols` pass through to every chunk row — carrying a grouping key
    (e.g. lang) here is free, while recovering it downstream would take a
    doc_id join that re-runs the whole upstream pipeline.
    """
    toks = F.split(F.trim(F.col(text_col)), WS_RE)
    starts = F.sequence(
        F.lit(0), F.floor((F.col("_n") - 1) / F.lit(stride)).cast("int")
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, window)
    return (
        df.select(
            F.col(id_col), *extra_cols, toks.alias("_toks"), F.size(toks).alias("_n")
        )
        .withColumn("chunk_id", F.explode(starts))
        .select(
            id_col,
            *extra_cols,
            "chunk_id",
            F.size(chunk).alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs)


TFIDF_TOP_K = 3


def tfidf_top_terms(
    df: DataFrame,
    *,
    k: int = TFIDF_TOP_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k terms by tf-idf: (doc_id, term, tf, df, tfidf).

    idf = ln((N+1)/(df+1)); ranking by (rounded tfidf DESC, term ASC) so
    ties are stable across engines.  Scale shape: term extraction is
    partition-local; tf is a (doc, term) partial+final agg; document
    frequency is a term-level agg (vocabulary-sized, far smaller than the
    corpus) joined back on term — a shuffle equi-join that AQE can convert
    to broadcast when the vocabulary is small; the scalar N is a literal
    broadcast.  No step is quadratic and nothing collects to the driver.
    """
    terms = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)
            )
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("_n"))
    scored = (
        tf.join(doc_freq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("_n") + 1).cast("double") / (F.col("df") + 1)),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "rank", "tfidf")
    )


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs)


QUALITY_KEEP_THRESHOLD = 0.5


def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end LLM training-data preparation flow, composed from
    this engine's own operators: quality-filter → exact dedup (min-id
    keeper) → overlapping token-window chunking → per-lang corpus stats
    (docs kept, chunks produced, tokens emitted).

    Every stage is the scale path: the filter and chunker are
    partition-local projections, dedup is one window shuffle on the
    fingerprint, the final rollup is a partial+final agg on a 5-value
    key.  The whole pipeline carries one narrow (doc_id, lang, text)
    schema between stages — no payload ever widens.
    """
    from pyspark_kmeans_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    filtered = with_quality(docs).filter(
        F.col("quality_score") >= QUALITY_KEEP_THRESHOLD
    )
    kept = exact_dedup(filtered).select("doc_id", "lang", "text")
    # lang rides through the chunker, so the rollup groups directly —
    # the previous doc_id join back to `kept` re-ran the whole
    # filter+fingerprint+dedup subtree a second time (plan showed two full
    # scans and zero exchange reuse) just to recover this one column.
    chunks = chunk_documents(kept, extra_cols=("lang",))
    return chunks.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("n_tokens"),
    )


def q_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional token stream (doc_id, pos, token) — the exploded form a
    tokenizer-training or suffix-indexing stage consumes.  posexplode
    carries the within-document position out of the array, so no window
    function is needed: one scan, partition-local, output linear in corpus
    tokens, and the (doc_id, pos) pair is a deterministic primary key."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), WS_RE)
    return docs.select("doc_id", F.posexplode(toks).alias("_p", "token")).select(
        "doc_id", (F.col("_p") + 1).cast("int").alias("pos"), "token"
    )


CHAR_NGRAM_N = 3
CHAR_NGRAM_TOP_K = 10


def char_ngram_profile(
    df: DataFrame,
    *,
    n: int = CHAR_NGRAM_N,
    k: int = CHAR_NGRAM_TOP_K,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language top-k character n-gram profile — the classic
    language-ID feature table (Cavnar-Trenkle), built as pure JVM array
    expressions.

    The explode multiplies rows by characters-per-doc, but map-side
    partial aggregation collapses them immediately to (lang, gram) keys —
    a key space bounded by charset^n per language, NOT by corpus size —
    so the shuffle is tiny at any scale.  Top-k runs per-language
    (parallel bounded windows; count-desc with gram tie-break keeps the
    profile deterministic)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), WS_RE, " ")
    base = df.select(F.col(lang_col).alias("lang"), norm.alias("_t"))
    starts = F.when(
        F.length("_t") >= n,
        F.sequence(F.lit(1), F.length("_t") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = base.withColumn("_i", F.explode(starts)).select(
        "lang", F.col("_t").substr(F.col("_i"), F.lit(n)).alias("gram")
    )
    counts = grams.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("n_occurrences"), F.asc("gram")
    )
    return counts.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


def q_char_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return char_ngram_profile(load_table(spark, sf_dir, "documents"))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_token_counts": q_token_counts,
    "text_quality": q_quality,
    "text_lang_id": q_lang_id,
    "text_fingerprint": q_fingerprint,
    "text_edit_distance": q_edit_distance,
    "text_rolling_hash": q_rolling_hash,
    "text_chunks": q_text_chunks,
    "text_tfidf": q_text_tfidf,
    "training_pipeline": q_training_pipeline,
    "token_positions": q_token_positions,
    "char_ngram_profile": q_char_ngram_profile,
}

_SQL_SCORES = ", ".join(
    f"len(regexp_extract_all(text, '{pat}')) AS score_{lang}"
    for lang, pat in sorted(LANG_PATTERNS.items())
)

ORACLES: dict[str, str] = {
    "token_positions": """
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '[ \\t\\n]+') AS t
            FROM documents
        ), z AS (
            SELECT doc_id,
                   unnest(generate_series(1, len(t))) AS pos,
                   unnest(t) AS token
            FROM toks
        )
        SELECT doc_id, CAST(pos AS INT) AS pos, token FROM z
    """,
    "char_ngram_profile": """
        WITH norm AS (
            SELECT lang, regexp_replace(lower(text), '[ \\t\\n]+', ' ', 'g') AS t
            FROM documents
        ), idx AS (
            SELECT lang, t,
                   unnest(generate_series(1, greatest(length(t) - 2, 0))) AS i
            FROM norm
        ), counts AS (
            SELECT lang, substring(t, CAST(i AS INT), 3) AS gram,
                   COUNT(*) AS n_occurrences
            FROM idx GROUP BY lang, gram
        ), ranked AS (
            SELECT lang, gram, n_occurrences,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY n_occurrences DESC, gram ASC
                   ) AS INT) AS rank
            FROM counts
        )
        SELECT lang, gram, n_occurrences, rank FROM ranked WHERE rank <= 10
    """,
    "text_token_counts": """
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '[ \\t\\n]+')) AS INT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_ \\t\\n]')) AS INT)
                   AS n_bpe_tokens
        FROM documents
    """,
    "text_quality": """
        WITH raw AS (
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '[ \\t\\n]+')) AS INT) AS n_tokens,
                   length(regexp_replace(text, '[ \\t\\n]+', '', 'g')) AS n_word_chars,
                   len(regexp_extract_all(text, '[^a-zA-Z0-9_ \\t\\n]')) AS n_punct,
                   len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
                   len(regexp_extract_all(text, '(^| )(the|and|of|to|a|in|is)( |$)')) AS n_stop,
                   length(text) AS n_len
            FROM documents
        )
        SELECT doc_id, n_tokens,
               CAST(n_word_chars AS DOUBLE) / n_tokens AS avg_token_len,
               CAST(n_punct AS DOUBLE) / n_len AS punct_ratio,
               CAST(n_upper AS DOUBLE) / n_len AS upper_ratio,
               CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
               ROUND(
                   LEAST(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
                   + (1.0 - LEAST(CAST(n_punct AS DOUBLE) / n_len * 4, 1.0)) * 0.3
                   + LEAST(CAST(n_stop AS DOUBLE) / n_tokens * 5, 1.0) * 0.3, 6)
                   AS quality_score
        FROM raw
    """,
    "text_lang_id": f"""
        WITH scored AS (
            SELECT doc_id, lang, {_SQL_SCORES}
            FROM documents
        )
        SELECT doc_id, lang,
               CASE
                   WHEN score_de >= greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
                   WHEN score_en >= greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
                   WHEN score_es >= greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
                   WHEN score_fr >= greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
                   ELSE 'zh'
               END AS pred_lang,
               CAST(score_de AS INT) AS score_de, CAST(score_en AS INT) AS score_en,
               CAST(score_es AS INT) AS score_es, CAST(score_fr AS INT) AS score_fr,
               CAST(score_zh AS INT) AS score_zh,
               CASE WHEN (CASE
                   WHEN score_de >= greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
                   WHEN score_en >= greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
                   WHEN score_es >= greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
                   WHEN score_fr >= greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
                   ELSE 'zh'
               END) = lang THEN 1 ELSE 0 END AS agree
        FROM scored
    """,
    "text_fingerprint": """
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '[ \\t\\n]+', ' ', 'g'))) AS fingerprint
        FROM documents
    """,
    "text_edit_distance": """
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(levenshtein(substring(a.text, 1, 80), substring(b.text, 1, 80)) AS INT)
                   AS edit_distance
        FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id
    """,
    "text_rolling_hash": """
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(regexp_split_to_array(text, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 2147483647) AS rolling_hash
        FROM documents
    """,
    "text_chunks": f"""
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '[ \\t\\n]+') AS t
            FROM documents
        )
        , chunks AS (
            SELECT doc_id, t,
                   unnest(range(0, ((len(t) - 1) // {CHUNK_STRIDE}) + 1)) AS cid
            FROM toks
        )
        SELECT doc_id,
               CAST(cid AS INT) AS chunk_id,
               CAST(len(list_slice(t, cid * {CHUNK_STRIDE} + 1,
                                   cid * {CHUNK_STRIDE} + {CHUNK_WINDOW}))
                    AS INT) AS n_chunk_tokens,
               array_to_string(
                   list_slice(t, cid * {CHUNK_STRIDE} + 1,
                              cid * {CHUNK_STRIDE} + {CHUNK_WINDOW}),
                   ' ') AS chunk_text
        FROM chunks
    """,
    "training_pipeline": f"""
        WITH raw AS (
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '[ \\t\\n]+')) AS INT) AS n_tokens,
                   len(regexp_extract_all(text, '[^a-zA-Z0-9_ \\t\\n]')) AS n_punct,
                   len(regexp_extract_all(text, '(^| )(the|and|of|to|a|in|is)( |$)')) AS n_stop,
                   length(text) AS n_len
            FROM documents
        ), filtered AS (
            SELECT d.doc_id, d.lang, d.text
            FROM documents d JOIN raw USING (doc_id)
            WHERE ROUND(
                LEAST(CAST(raw.n_tokens AS DOUBLE) / 100, 1.0) * 0.4
                + (1.0 - LEAST(CAST(raw.n_punct AS DOUBLE) / raw.n_len * 4, 1.0)) * 0.3
                + LEAST(CAST(raw.n_stop AS DOUBLE) / raw.n_tokens * 5, 1.0) * 0.3, 6)
                >= {QUALITY_KEEP_THRESHOLD}
        ), kept AS (
            SELECT doc_id, lang, text FROM (
                SELECT f.*, ROW_NUMBER() OVER (
                    PARTITION BY md5(lower(regexp_replace(trim(text), '[ \\t\\n]+', ' ', 'g')))
                    ORDER BY doc_id
                ) AS rn
                FROM filtered f
            ) WHERE rn = 1
        ), toks AS (
            SELECT doc_id, lang,
                   regexp_split_to_array(trim(text), '[ \\t\\n]+') AS t
            FROM kept
        ), chunks AS (
            SELECT doc_id, lang, t,
                   unnest(range(0, ((len(t) - 1) // {CHUNK_STRIDE}) + 1)) AS cid
            FROM toks
        )
        SELECT lang,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_chunks,
               CAST(SUM(len(list_slice(t, cid * {CHUNK_STRIDE} + 1,
                                       cid * {CHUNK_STRIDE} + {CHUNK_WINDOW}))) AS BIGINT)
                   AS n_tokens
        FROM chunks
        GROUP BY lang
    """,
    "text_tfidf": f"""
        WITH terms AS (
            SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM terms GROUP BY doc_id, term
        ), docfreq AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
        ), n AS (
            SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, docfreq.df,
                   ROUND(tf.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (docfreq.df + 1)), 6)
                       AS tfidf
            FROM tf JOIN docfreq USING (term), n
        )
        SELECT doc_id, term, tf, df, rank, tfidf FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
            ) AS INT) AS rank
            FROM scored
        ) WHERE rank <= {TFIDF_TOP_K}
    """,
}
