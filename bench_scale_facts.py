"""Fact-fact scaling harness: the TPC-H-shape counterpart to
bench_scale.py (which grows the documents corpus).

Blows up BOTH fact tables (lineitem, orders) k× with aligned keys —
replica r shifts every orderkey by r·SHIFT in both tables, so the join
graph is k disjoint copies of the original workload: join fan-outs and
group cardinalities grow exactly k×, never k².  Dimension tables
(customer/supplier/part/nation/region) stay fixed, which is the realistic
100 TB shape: facts grow, dimensions do not.

Prints one JSON line like bench_scale.py:
  {"metric": "scaling_facts", "sizes": {...}, "seconds": {...},
   "exponent": {query: slope of log(sec)/log(k)}}

Usage:
  python bench_scale_facts.py
  SPARK_GRAFT_SCALE_KS=1,4 SPARK_GRAFT_SCALE_QUERIES=tpch_q21,tpch_q12 \
      python bench_scale_facts.py
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from pyspark_kmeans_spark.session import get_spark
from pyspark_kmeans_spark.sources.tables import load_table

QUERIES = os.environ.get(
    "SPARK_GRAFT_SCALE_QUERIES",
    "tpch_q21,tpch_q12,tpch_q9,tpch_q8,salted_join,customer_features",
).split(",")

SHIFT = 100_000_000


def write_blowup(spark, sf_dir: str, k: int, out_dir: str) -> None:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    for table, df, keys in (
        ("lineitem", li, ["l_orderkey"]),
        ("orders", orders, ["o_orderkey"]),
    ):
        path = f"{out_dir}/{table}.parquet"
        for r in range(k):
            part = df
            for key in keys:
                part = part.withColumn(key, F.col(key) + F.lit(r * SHIFT))
            part.write.mode("overwrite" if r == 0 else "append").parquet(path)


def main() -> None:
    # abspath: symlink targets are resolved relative to /tmp, so a relative
    # SPARK_GRAFT_SF_DIR would produce broken dimension links (same fix as
    # sources/bucketed.py's cache key)
    sf_dir = os.path.abspath(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ks = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_KS", "1,4,16").split(",")
    ]
    spark = get_spark(app_name="bench_scale_facts")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    seconds: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    sizes: dict[int, int] = {}
    for k in ks:
        tmp_sf = f"/tmp/scale_facts_k{k}"
        if os.path.isdir(tmp_sf):
            shutil.rmtree(tmp_sf)
        os.makedirs(tmp_sf)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "events", "documents", "embeddings"):
            os.symlink(f"{sf_dir}/{t}.parquet", f"{tmp_sf}/{t}.parquet")
        write_blowup(spark, sf_dir, k, tmp_sf)
        sizes[k] = spark.read.parquet(f"{tmp_sf}/lineitem.parquet").count()
        for q in QUERIES:
            best = None
            for _ in range(int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))):
                t0 = time.time()
                registry[q](spark, tmp_sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            seconds[q][k] = round(best, 2)
            spark.catalog.clearCache()

    exponent = {}
    for q in QUERIES:
        xs = [math.log(k) for k in ks]
        ys = [math.log(max(seconds[q][k], 0.05)) for k in ks]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs) or 1.0
        exponent[q] = round(
            sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 2
        )

    print(json.dumps({
        "metric": "scaling_facts",
        "sf": sf_dir,
        "sizes": sizes,
        "seconds": seconds,
        "exponent": exponent,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
