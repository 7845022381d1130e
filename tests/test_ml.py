"""ML-stage invariant tests (SURVEY.md §5: seed-pinned determinism,
silhouette range, center count/dimension, scaler mean≈0/std≈1)."""

from __future__ import annotations

import math

import pytest
from pyspark.ml.functions import vector_to_array
from pyspark.sql import functions as F

from pyspark_kmeans_spark.ml.features import prepare_features
from pyspark_kmeans_spark.ml.kmeans import (
    kmeans_scan,
    load_kmeans_model,
    results_df,
)
from pyspark_kmeans_spark.ml.queries import FLAGSHIP_FEATURES, _flagship


@pytest.fixture(scope="module")
def scaled(spark, sf_dir):
    data = _flagship(spark, sf_dir)
    df, model = prepare_features(data, FLAGSHIP_FEATURES, handle_invalid="skip")
    return df.cache()


def test_scaler_invariants(scaled):
    # z-scored columns: mean ≈ 0, sample std ≈ 1 per dimension.
    arr = vector_to_array("features")
    dims = len(FLAGSHIP_FEATURES)
    stats = scaled.select(
        *[F.avg(arr[i]).alias(f"m{i}") for i in range(dims)],
        *[F.stddev_samp(arr[i]).alias(f"s{i}") for i in range(dims)],
    ).collect()[0]
    for i in range(dims):
        assert abs(stats[f"m{i}"]) < 1e-9
        assert abs(stats[f"s{i}"] - 1.0) < 1e-9


def test_kscan_invariants(scaled, spark, tmp_path):
    result = kmeans_scan(
        scaled, k_min=2, k_max=4, seed=1, models_dir=str(tmp_path / "models")
    )
    for k in (2, 3, 4):
        assert len(result.centers[k]) == k
        assert all(len(c) == len(FLAGSHIP_FEATURES) for c in result.centers[k])
        assert -1.0 <= result.silhouette[k] <= 1.0
        assert not math.isnan(result.silhouette[k])

    # S4/S5: model round-trip — identical centers after reload.
    m2 = load_kmeans_model(str(tmp_path / "models" / "model_w_k_2"))
    reloaded = [c.tolist() for c in m2.clusterCenters()]
    assert reloaded == result.centers[2]

    # S3 layout: header ['k','cluster','score',*features], one row per center.
    rdf = results_df(spark, result, FLAGSHIP_FEATURES)
    assert rdf.columns == ["k", "cluster", "score", *FLAGSHIP_FEATURES]
    assert rdf.count() == 2 + 3 + 4


def test_kscan_determinism(scaled):
    # Same seed → same centers (the reference pins seed=1 for this reason).
    a = kmeans_scan(scaled, k_min=3, k_max=3, seed=1)
    b = kmeans_scan(scaled, k_min=3, k_max=3, seed=1)
    assert a.centers[3] == b.centers[3]


def test_load_missing_model_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_kmeans_model(str(tmp_path / "nope"))


def test_feature_pipeline_model_round_trip(spark, scaled, sf_dir, tmp_path):
    # The fitted assembler+scaler PipelineModel persists and reloads with
    # identical transform output (deploy path: fit once, ship the model).
    from pyspark.ml import PipelineModel
    from pyspark.ml.functions import vector_to_array

    data = _flagship(spark, sf_dir)
    _, model = prepare_features(data, FLAGSHIP_FEATURES, handle_invalid="skip")
    path = str(tmp_path / "feature_model")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    a = (
        model.transform(data)
        .select("c_custkey", vector_to_array("features").alias("f"))
        .collect()
    )
    b = (
        reloaded.transform(data)
        .select("c_custkey", vector_to_array("features").alias("f"))
        .collect()
    )
    assert sorted((r.c_custkey, tuple(r.f)) for r in a) == sorted(
        (r.c_custkey, tuple(r.f)) for r in b
    )


def test_quality_classifier_learns_separable_label(spark, sf_dir):
    """The hashed-token LR must actually learn the planted weak label
    (train accuracy >= 0.95) and score every doc exactly once with a
    probability in [0, 1]."""
    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.ml.quality import (
        score_quality,
        train_quality_classifier,
    )
    from pyspark_kmeans_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    label = F.array_contains(F.split(F.lower("text"), "\\s+"), "spark")
    model = train_quality_classifier(docs, label)
    scored = score_quality(model, docs)
    joined = scored.join(
        docs.select("doc_id", label.cast("int").alias("truth")), on="doc_id"
    )
    n = joined.count()
    assert n == docs.count()
    acc = (
        joined.filter(F.col("predicted_label") == F.col("truth")).count() / n
    )
    assert acc >= 0.95, f"train accuracy {acc}"
    bad = joined.filter(
        (F.col("quality_score") < 0) | (F.col("quality_score") > 1)
    ).count()
    assert bad == 0


def test_save_results_both_forms_equivalent(spark, tmp_path):
    """The driver-local (reference-parity csv.writer) and distributed
    (df.write.csv) result sinks must produce identical tables."""
    import pandas as pd

    from pyspark_kmeans_spark.ml.kmeans import (
        KScanResult,
        save_clustering_results,
    )
    from pyspark_kmeans_spark.reporting import load_results_csv

    r = KScanResult()
    for k in (2, 3):
        r.centers[k] = [[float(i + k) for i in range(3)] for _ in range(k)]
        r.silhouette[k] = 0.5 + k / 10
    feats = ["f0", "f1", "f2"]
    local = str(tmp_path / "local.csv")
    dist = str(tmp_path / "dist_dir")
    save_clustering_results(spark, r, feats, local)
    save_clustering_results(spark, r, feats, dist, distributed=True)
    a = load_results_csv(local).sort_values(["k", "cluster"]).reset_index(drop=True)
    b = load_results_csv(dist).sort_values(["k", "cluster"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_kscan_rejects_invalid_k_range(scaled):
    from pyspark_kmeans_spark.ml.kmeans import kmeans_scan

    with pytest.raises(ValueError, match="invalid k range"):
        kmeans_scan(scaled, k_min=6, k_max=2)


def test_pca_variance_invariants_and_2d_closed_form(spark, sf_dir):
    """PCA spectrum contract: ratios positive, descending, cumulative <= 1;
    and on a 2-feature frame MLlib's eigenvalues must match the closed-form
    covariance eigenvalues (lambda = (v1+v2 +- sqrt((v1-v2)^2 + 4c^2))/2)
    computed from exact moments — pins the eigensolver's correctness
    without pretending float equality across engines."""
    import math

    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    from pyspark.sql import functions as F

    from pyspark_kmeans_spark.ml.queries import q_embedding_pca_variance
    from pyspark_kmeans_spark.sources.tables import load_table

    rows = q_embedding_pca_variance(spark, sf_dir).collect()
    ratios = [r["explained_variance"] for r in sorted(rows, key=lambda r: r["component"])]
    assert all(v > 0 for v in ratios)
    assert ratios == sorted(ratios, reverse=True)
    assert sum(ratios) <= 1.0 + 1e-9

    # 2-d closed form on embedding dims 0 and 1.
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    stats = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).collect()[0]
    n = stats["n"]
    v1 = (stats["sxx"] - stats["sx"] ** 2 / n) / (n - 1)
    v2 = (stats["syy"] - stats["sy"] ** 2 / n) / (n - 1)
    c = (stats["sxy"] - stats["sx"] * stats["sy"] / n) / (n - 1)
    disc = math.sqrt((v1 - v2) ** 2 + 4 * c * c)
    lam = sorted([(v1 + v2 + disc) / 2, (v1 + v2 - disc) / 2], reverse=True)

    model = PCA(k=2, inputCol="f", outputCol="pc").fit(
        emb.select(array_to_vector(F.array("x", "y")).alias("f"))
    )
    got = list(model.explainedVariance)
    total = lam[0] + lam[1]
    for g, expect in zip(got, [lam[0] / total, lam[1] / total]):
        assert abs(g - expect) < 1e-6, (got, lam)
