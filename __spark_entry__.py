"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship customer-features query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions, each with a DuckDB oracle
where the semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark_kmeans_spark.operators.relational import q_customer_features

    return q_customer_features(spark, SF0001)


def _registries() -> list:
    from pyspark_kmeans_spark.operators import relational

    mods = [relational]
    for name in ("dedup", "similarity", "text", "multimodal", "analytics", "temporal"):
        try:
            mods.append(
                __import__(
                    f"pyspark_kmeans_spark.operators.{name}", fromlist=[name]
                )
            )
        except ImportError:
            pass
    for name in ("streaming.events", "ml.queries"):
        try:
            mods.append(
                __import__(
                    f"pyspark_kmeans_spark.{name}", fromlist=[name.split(".")[-1]]
                )
            )
        except ImportError:
            pass
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _registries():
        out.update(getattr(mod, "QUERIES", {}))
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _registries():
        out.update(getattr(mod, "ORACLES", {}))
    return out
