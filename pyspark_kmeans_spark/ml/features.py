"""Feature-engineering stage: vector assembly + standardization.

Reference parity (SURVEY.md §2.9 M1-M2, utils/kmeans_utils.py:70-75):
VectorAssembler → StandardScaler(withStd=True, withMean=True), composed as a
proper ``pyspark.ml.Pipeline`` so fit/transform is a single, persistable
object instead of the reference's two ad-hoc stages.

Scale notes: StandardScaler.fit is one distributed stats pass.  With
``withMean=True`` the transform densifies vectors — fine for this engine's
low-dimensional feature tables; for very wide sparse inputs pass
``with_mean=False``.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame

UNSCALED_COL = "features_unscaled"
FEATURES_COL = "features"


def feature_pipeline(
    feature_cols: list[str],
    *,
    with_mean: bool = True,
    with_std: bool = True,
    handle_invalid: str = "error",
) -> Pipeline:
    """M1+M2 as one Pipeline: assemble `feature_cols` → z-score scale.

    ``handle_invalid='skip'`` drops rows with nulls/NaNs in any feature
    (e.g. log of a non-positive input, P5) instead of erroring.
    """
    assembler = VectorAssembler(
        inputCols=list(feature_cols),
        outputCol=UNSCALED_COL,
        handleInvalid=handle_invalid,
    )
    scaler = StandardScaler(
        inputCol=UNSCALED_COL,
        outputCol=FEATURES_COL,
        withMean=with_mean,
        withStd=with_std,
    )
    return Pipeline(stages=[assembler, scaler])


def prepare_features(
    df: DataFrame,
    feature_cols: list[str],
    *,
    handle_invalid: str = "error",
) -> tuple[DataFrame, PipelineModel]:
    """Fit + transform in one call (utils/kmeans_utils.py:70-75 equivalent).

    Returns (scaled DataFrame with `features` column, fitted PipelineModel).
    """
    model = feature_pipeline(feature_cols, handle_invalid=handle_invalid).fit(df)
    return model.transform(df), model
