"""Per-stage wall-clock baseline (BASELINE.md: self-measured baseline —
load/prepare, per-k fit, evaluate, save) at one or more scale factors.

Usage:
    python bench_stages.py [sf_dir ...]        # default: sf0.001 sf0.01 sf0.1

Prints one JSON line per scale factor.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_kmeans_spark.session import get_spark  # noqa: E402


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def run_sf(spark, sf_dir: str) -> dict:
    from pyspark.storagelevel import StorageLevel

    from pyspark_kmeans_spark.ml.features import prepare_features
    from pyspark_kmeans_spark.ml.kmeans import (
        fit_kmeans,
        save_clustering_results,
        silhouette_score,
        KScanResult,
    )
    from pyspark_kmeans_spark.ml.queries import FLAGSHIP_FEATURES, _flagship

    stages: dict[str, float] = {}

    data, stages["load_prepare"] = timed(
        lambda: _flagship(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    )
    _, t = timed(lambda: data.count())
    stages["load_prepare"] += t

    scaled_and_model, stages["scale_fit_transform"] = timed(
        lambda: prepare_features(data, FLAGSHIP_FEATURES, handle_invalid="skip")
    )
    scaled = scaled_and_model[0].coalesce(8).persist(StorageLevel.MEMORY_AND_DISK)
    scaled.count()

    result = KScanResult()
    for k in (2, 3, 4, 5, 6):
        model, stages[f"fit_k{k}"] = timed(lambda: fit_kmeans(scaled, k, seed=1))
        result.centers[k] = [c.tolist() for c in model.clusterCenters()]
        result.silhouette[k], stages[f"evaluate_k{k}"] = timed(
            lambda: silhouette_score(model, scaled)
        )

    with tempfile.TemporaryDirectory() as tmp:
        _, stages["save_results"] = timed(
            lambda: save_clustering_results(
                spark, result, FLAGSHIP_FEATURES, f"{tmp}/results"
            )
        )

    data.unpersist()
    scaled.unpersist()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "segmentation_pipeline_stages",
        "value": round(sum(stages.values()), 3),
        "unit": "sec",
        "stages": stages,
        "best_k": result.best_k(),
        "sf": float(sf),
    }


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark(app_name="bench_stages")
    for sf_dir in sf_dirs:
        print(json.dumps(run_sf(spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
