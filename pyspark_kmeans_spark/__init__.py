"""pyspark_kmeans_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``gaetano-festa/pyspark-kmeans``
(see /root/reference, SURVEY.md), extended with the operators a large-scale
LLM training-data pipeline needs: deduplication, similarity search,
multimodal column plumbing, text analysis, and a streaming slice.

Design principles (SURVEY.md §7):
 - DataFrame/SQL first; Catalyst + Tungsten pick physical strategy.
 - Explicit schemas everywhere (no inferSchema passes over 100 TB inputs).
 - `.cache()` at reuse points (the reference recomputed its lineage per
   k-means fit — SURVEY.md §3 / utils/kmeans_utils.py:101-105).
 - Pandas UDFs only where built-in functions genuinely cannot express the
   semantics; never row-at-a-time Python UDFs in hot paths.
 - Broadcast small dimensions; let AQE handle skew and partition coalescing.
"""

from pyspark_kmeans_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
