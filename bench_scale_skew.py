"""Skew-stress scaling harness: the hot-key counterpart to
bench_scale_facts.py (which grows facts uniformly).

VERDICT r4 item 7: the repo's skew claims (AQE skew-split on shuffle
joins, `salted_join`/`salted_agg` for manual mitigation) were measured
only on uniformly-grown facts.  This harness grows lineitem/orders k×
like bench_scale_facts.py but funnels a fixed FRACTION of rows onto ONE
global hot key (Zipf head in the limit):

 - 1/HOT_MOD (5%) of lineitem rows get ``l_orderkey = 1`` — at k=16 one
   join/shuffle key holds ~480k rows at sf0.1 while every other key holds
   ≤7.  Referential integrity is preserved (orderkey 1 exists; each hot
   lineitem row still matches exactly one order), so join OUTPUT stays
   linear — only the key distribution is pathological, which isolates the
   engine's skew handling from genuine quadratic workloads (a self-join
   on a hot key is quadratic no matter the engine; that failure mode is
   dedup's bucket-cap territory, not this harness's).
 - 1/HOT_MOD of orders rows get ``o_custkey = 1`` — the same funnel on
   the customer-join/aggregation side.

Since every k applies the same transform, log-log slope (exponent) stays
comparable with the uniform harness: sub-linear-ish (≈1 at worst) means
the skew is absorbed; super-linear means a straggler reducer.

Prints one JSON line:
  {"metric": "scaling_skew", "sizes": {...}, "hot_rows": {...},
   "seconds": {...}, "exponent": {...}}
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
    "salted_join,salted_agg,tpch_q12,customer_features",
).split(",")

SHIFT = 100_000_000
HOT_MOD = 20  # 1/20 = 5% of rows funnel onto the hot key
HOT_KEY = 1


def write_blowup_skewed(spark, sf_dir: str, k: int, out_dir: str) -> None:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    for r in range(k):
        shifted = F.col("l_orderkey") + F.lit(r * SHIFT)
        part_li = li.withColumn(
            "l_orderkey",
            F.when(shifted % HOT_MOD == 0, F.lit(HOT_KEY)).otherwise(shifted),
        )
        part_li.write.mode("overwrite" if r == 0 else "append").parquet(
            f"{out_dir}/lineitem.parquet"
        )
        oshift = F.col("o_orderkey") + F.lit(r * SHIFT)
        part_o = orders.withColumn(
            "o_custkey",
            F.when(oshift % HOT_MOD == 0, F.lit(HOT_KEY)).otherwise(
                F.col("o_custkey")
            ),
        ).withColumn("o_orderkey", oshift)
        part_o.write.mode("overwrite" if r == 0 else "append").parquet(
            f"{out_dir}/orders.parquet"
        )


def main() -> None:
    sf_dir = os.path.abspath(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ks = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_KS", "1,4,16").split(",")
    ]
    spark = get_spark(app_name="bench_scale_skew")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    seconds: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    sizes: dict[int, int] = {}
    hot_rows: dict[int, int] = {}
    for k in ks:
        tmp_sf = f"/tmp/scale_skew_k{k}"
        if os.path.isdir(tmp_sf):
            shutil.rmtree(tmp_sf)
        os.makedirs(tmp_sf)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "events", "documents", "embeddings"):
            os.symlink(f"{sf_dir}/{t}.parquet", f"{tmp_sf}/{t}.parquet")
        write_blowup_skewed(spark, sf_dir, k, tmp_sf)
        li = spark.read.parquet(f"{tmp_sf}/lineitem.parquet")
        sizes[k] = li.count()
        hot_rows[k] = li.filter(F.col("l_orderkey") == HOT_KEY).count()
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
        "metric": "scaling_skew",
        "sf": sf_dir,
        "hot_mod": HOT_MOD,
        "sizes": sizes,
        "hot_rows": hot_rows,
        "seconds": seconds,
        "exponent": exponent,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
