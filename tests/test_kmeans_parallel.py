"""Parallel-k scan: thread-scheduled concurrent fits must give identical
results to the sequential scan (Spark scheduler handles concurrent jobs)."""

from __future__ import annotations

from pyspark_kmeans_spark.ml.features import prepare_features
from pyspark_kmeans_spark.ml.kmeans import kmeans_scan
from pyspark_kmeans_spark.ml.queries import FLAGSHIP_FEATURES, _flagship


def test_parallel_equals_sequential(spark, sf_dir):
    data = _flagship(spark, sf_dir)
    scaled, _ = prepare_features(data, FLAGSHIP_FEATURES, handle_invalid="skip")
    scaled = scaled.coalesce(4).cache()
    seq = kmeans_scan(scaled, 2, 4, seed=1, cache=False)
    par = kmeans_scan(scaled, 2, 4, seed=1, cache=False, parallelism=3)
    assert seq.centers == par.centers
    assert seq.silhouette == par.silhouette
