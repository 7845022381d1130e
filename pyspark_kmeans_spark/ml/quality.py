"""fastText-style document-quality classifier (north-star extension).

The production recipe behind GPT-3/LLaMA-style corpus filtering (Brown et
al. 2020 §A; Touvron et al. 2023 §2): train a cheap linear classifier to
score "does this look like reference-quality text", then keep/sample by
score.  The reference repo's only ML surface is k-means
(`utils/kmeans_utils.py:80-109`); this broadens the engine's MLlib coverage
to the supervised path with the same design rules — explicit seeds, a
single persistable Pipeline, invariants tested rather than float-exact
outputs.

Spark-first shape: Tokenizer → HashingTF (hashing trick: fixed-width
sparse vectors, no vocabulary build, no driver state) → LogisticRegression.
Every stage is a distributed pass; scoring is one map-side transform with
no shuffle — linear over a 100 TB corpus.  HashingTF keeps the model
size O(2^18) regardless of corpus vocabulary, which is what makes the
classifier shippable to every executor as a broadcast.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, Tokenizer
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_kmeans_spark.sources.tables import load_table

N_HASH_FEATURES = 1 << 18


def quality_pipeline(
    *,
    text_col: str = "text",
    label_col: str = "label",
    max_iter: int = 10,
    reg_param: float = 0.01,
) -> Pipeline:
    """Tokenize → hash to a fixed 2^18-dim sparse vector → logistic
    regression.  One Pipeline object so fit/save/load mirror the k-means
    path (S4/S5 parity)."""
    tok = Tokenizer(inputCol=text_col, outputCol="_tokens")
    tf = HashingTF(
        inputCol="_tokens", outputCol="_tf", numFeatures=N_HASH_FEATURES
    )
    lr = LogisticRegression(
        featuresCol="_tf",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return Pipeline(stages=[tok, tf, lr])


def train_quality_classifier(
    docs: DataFrame,
    label: Column,
    *,
    text_col: str = "text",
) -> PipelineModel:
    """Fit the quality pipeline against a weak-label column expression
    (production: 'is this from the curated/reference subset'; here any
    boolean column expression over the docs frame)."""
    labeled = docs.withColumn("label", label.cast("double"))
    return quality_pipeline(text_col=text_col).fit(labeled)


def score_quality(
    model: PipelineModel, docs: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Score documents: P(label=1) extracted from the probability vector.
    Pure transform — no shuffle, broadcastable model, linear at any size."""
    from pyspark.ml.functions import vector_to_array

    return model.transform(docs).select(
        id_col,
        F.round(vector_to_array("probability")[1], 6).alias("quality_score"),
        F.col("prediction").cast("int").alias("predicted_label"),
    )


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on a deterministic text-derived weak label (doc contains the
    token 'spark' — linearly separable through the hashing trick, which
    the invariant test pins via train-set accuracy), then score the whole
    corpus.  The synthetic corpus's `lang` column is NOT text-correlated
    (TESTDATA.md: shared vocabulary), so a metadata label would train on
    noise — production pipelines label by source (curated vs crawl).
    Iterative LBFGS fit → no_oracle; the rows-only check pins shape +
    row-count determinism (one row per doc)."""
    docs = load_table(spark, sf_dir, "documents")
    # Label via the SAME tokenization Tokenizer applies (lowercase, split
    # on \s+): a case- or whitespace-divergent label would disagree with
    # the features on mixed-case corpora and break separability.
    label = F.array_contains(F.split(F.lower("text"), "\\s+"), "spark")
    model = train_quality_classifier(docs, label)
    return score_quality(model, docs)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "quality_classifier": q_quality_classifier,
}

ORACLES: dict[str, str] = {}
