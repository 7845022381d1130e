from pyspark_kmeans_spark.functions.exact import decimal_sum, exact_avg

__all__ = ["decimal_sum", "exact_avg"]
