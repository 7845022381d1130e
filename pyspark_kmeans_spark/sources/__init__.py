from pyspark_kmeans_spark.sources.tables import load_table, load_tables, read_csv

__all__ = ["load_table", "load_tables", "read_csv"]
