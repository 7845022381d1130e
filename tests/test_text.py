"""Unit tests for the chunking and tf-idf text operators (oracle parity is
covered for every registered query in test_oracle_parity.py)."""

from __future__ import annotations

from pyspark_kmeans_spark.operators.text import chunk_documents, tfidf_top_terms


def test_chunk_windows_and_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(100))),  # 100 tokens
            (2, "a b c"),  # shorter than one window
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.chunk_id): r
        for r in chunk_documents(docs, window=64, stride=48).collect()
    }
    # doc 1: starts 0/48/96 -> sizes 64, 52, 4; stride overlap of 16 means
    # chunk 1 begins at token 48.
    assert [rows[(1, i)].n_chunk_tokens for i in range(3)] == [64, 52, 4]
    assert rows[(1, 1)].chunk_text.startswith("t48 ")
    assert rows[(1, 2)].chunk_text == "t96 t97 t98 t99"
    assert (1, 3) not in rows
    # doc 2: one short chunk carrying the whole text
    assert rows[(2, 0)].n_chunk_tokens == 3
    assert rows[(2, 0)].chunk_text == "a b c"


def test_tfidf_ranks_distinctive_terms_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "common zebra zebra zebra common"),
            (2, "common words only common"),
            (3, "common unique words"),
        ],
        "doc_id long, text string",
    )
    top = {
        r.doc_id: r.term
        for r in tfidf_top_terms(docs, k=1).collect()
    }
    # 'zebra' (df=1, tf=3) dominates doc 1; 'common' (df=3) has idf=0 and
    # can never outrank a rarer term.
    assert top[1] == "zebra"
    assert top[3] == "unique"


def test_quality_survives_empty_and_null_docs(spark):
    """Zero-length and NULL text must yield NULL ratios / fallthrough lang,
    not an ANSI DIVIDE_BY_ZERO job abort (review fix)."""
    from pyspark_kmeans_spark.operators.text import with_lang_id, with_quality

    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "real text here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in with_quality(df).collect()}
    assert got[0]["punct_ratio"] is None  # 0-length denominator -> NULL
    assert got[2]["punct_ratio"] is not None
    langs = {r.doc_id: r.pred_lang for r in with_lang_id(df).collect()}
    assert langs[1] == "zh"  # NULL text falls through like the oracle CASE
