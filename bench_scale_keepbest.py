"""A/B harness for the round-8 keeper-selection rewrite (VERDICT r7
"What's wrong" #1): per-cluster row_number WINDOW vs partial-aggregatable
max_by ARGMAX in `keep_best_kept`.

The shape that motivated the rewrite is the boilerplate-flood
mega-component: one near-dup cluster holding a large fraction of the
corpus.  A window sorts that whole cluster inside ONE task; the aggregate
reduces every partition to one candidate per cluster before the shuffle.
This harness times ONLY the keeper stage (labels supplied directly, no
pair mining) over k salted replicas of the sf documents table with all
docs labelled into a single cluster — the adversarial worst case — plus
the honest registered-query end-to-end at k=1 for the noise-band record.

Prints one JSON line:
  {"metric": "keepbest_ab", "sizes": {k: rows},
   "seconds": {"argmax": {k: s}, "window": {k: s}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_kmeans_spark.operators.dedup import keep_best_kept
from pyspark_kmeans_spark.operators.text import with_quality
from pyspark_kmeans_spark.session import get_spark
from pyspark_kmeans_spark.sources.tables import load_table


def window_keep_best(docs, labels, id_col="doc_id"):
    """The pre-round-8 spelling, kept verbatim for the A/B."""
    scored = with_quality(docs).select(id_col, "quality_score")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col(id_col).asc()
    )
    keepers = (
        labels.join(scored, on=id_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col)
    )
    singletons = docs.select(id_col).join(labels, on=id_col, how="left_anti")
    return singletons.unionByName(keepers)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ks = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALE_KS", "1,4,16"
    ).split(",")]
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
    spark = get_spark(app_name="bench_keepbest")
    spark.sparkContext.setLogLevel("ERROR")

    from bench_scale import write_blowup

    base = load_table(spark, sf_dir, "documents")
    sizes: dict[int, int] = {}
    seconds: dict[str, dict[int, float]] = {"argmax": {}, "window": {}}
    for k in ks:
        path = f"/tmp/keepbest_docs_k{k}.parquet"
        write_blowup(base, k, path)
        docs = spark.read.parquet(path)
        sizes[k] = docs.count()
        # Mega-component: EVERY doc in one cluster.
        labels = docs.select("doc_id", F.lit(0).alias("cluster_id"))
        for tag, fn in (("argmax", keep_best_kept), ("window", window_keep_best)):
            best = None
            for _ in range(repeats):
                t0 = time.time()
                fn(docs, labels).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            seconds[tag][k] = round(best, 2)

    with open("/proc/loadavg") as f:
        load = [round(float(x), 2) for x in f.read().split()[:3]]
    print(json.dumps({
        "metric": "keepbest_ab",
        "sf": sf_dir,
        "sizes": sizes,
        "seconds": seconds,
        "loadavg": load,
    }))


if __name__ == "__main__":
    main()
