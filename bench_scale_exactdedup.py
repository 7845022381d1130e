"""A/B harness for the round-9 exact-dedup keeper rewrite (VERDICT r8
"What's wrong" #2): per-fingerprint row_number WINDOW vs
partial-aggregatable min_by ARGMIN in `exact_dedup`.

The adversarial shape is the viral exact duplicate — the empty-page /
boilerplate flood that exact dedup exists to remove: ONE fingerprint
group holding most of the corpus.  A window sorts that whole group in a
single task; the aggregate's map-side combine reduces every partition to
one candidate row per fingerprint before the shuffle.  The planted corpus
makes 90% of rows share one text (one mega fingerprint) and keeps the
remaining 10% unique, at k disjoint id-shifted replicas of the sf0.1
documents row count.

Prints one JSON line:
  {"metric": "exactdedup_ab", "sizes": {k: rows},
   "seconds": {"argmin": {k: s}, "window": {k: s}}, "loadavg": [...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_kmeans_spark.operators.dedup import exact_dedup, with_fingerprint
from pyspark_kmeans_spark.session import get_spark
from pyspark_kmeans_spark.sources.tables import load_table

VIRAL = "cookies policy accept all rights reserved site navigation home"


def window_exact_dedup(df, id_col="doc_id", text_col="text"):
    """The pre-round-9 spelling, kept verbatim for the A/B."""
    fp = with_fingerprint(df, text_col)
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fingerprint")
    )


def semijoin_exact_dedup(df, id_col="doc_id", text_col="text"):
    """Third variant: scalar min per fingerprint (tiny shuffle — partial
    min over longs, no full-row struct shipping), then keep rows whose id
    is a keeper id (ids are unique, so the id-only semi-join is exact and
    needs no fingerprint re-derivation)."""
    fp = with_fingerprint(df, text_col)
    keepers = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return df.join(keepers.select(id_col), on=id_col, how="left_semi")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ks = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALE_KS", "16,64"
    ).split(",")]
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
    spark = get_spark(app_name="bench_exactdedup")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    shift = 10_000_000
    sizes: dict[int, int] = {}
    seconds: dict[str, dict[int, float]] = {
        "argmin": {},
        "window": {},
        "semijoin": {},
    }
    for k in ks:
        path = f"/tmp/exactdedup_docs_k{k}.parquet"
        for r in range(k):
            part = base.withColumn(
                "doc_id", F.col("doc_id") + F.lit(r * shift)
            ).withColumn(
                "text",
                # 90% viral (ONE fingerprint across ALL replicas), 10%
                # unique (id-salted) — the flood shape.
                F.when(
                    F.col("doc_id") % 10 != 0, F.lit(VIRAL)
                ).otherwise(
                    F.concat(F.col("text"), F.lit(" uid"), F.col("doc_id"))
                ),
            )
            part.write.mode("overwrite" if r == 0 else "append").parquet(path)
        docs = spark.read.parquet(path)
        sizes[k] = docs.count()
        for tag, fn in (
            ("argmin", exact_dedup),
            ("window", window_exact_dedup),
            ("semijoin", semijoin_exact_dedup),
        ):
            best = None
            for _ in range(repeats):
                t0 = time.time()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            seconds[tag][k] = round(best, 2)

    with open("/proc/loadavg") as f:
        load = [round(float(x), 2) for x in f.read().split()[:3]]
    print(json.dumps({
        "metric": "exactdedup_ab",
        "sf": sf_dir,
        "sizes": sizes,
        "seconds": seconds,
        "loadavg": load,
    }))


if __name__ == "__main__":
    main()
