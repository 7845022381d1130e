"""One-off quiet-host measurement for named queries at a given sf dir.

Usage: python quiet_bench.py <sf_dir> <query> [query ...]

Runs each query REPEATS times (default 3) after warm-up, prints one JSON
line per query with all run times + loadavg stamps so the number is
adjudicable (BASELINE.md quiet-host protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_kmeans_spark.session import get_spark  # noqa: E402


def loadavg() -> list[float]:
    with open("/proc/loadavg") as f:
        return [round(float(x), 2) for x in f.read().split()[:3]]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    repeats = int(os.environ.get("QUIET_REPEATS", "3"))
    spark = get_spark(app_name="quiet_bench")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    force(queries["scan_projection"](spark, sf_dir))
    from pyspark_kmeans_spark.operators.dedup import ensure_signature_table
    from pyspark_kmeans_spark.operators.ingest import (
        ensure_digest_table,
        ensure_lang_stats_table,
    )
    from pyspark_kmeans_spark.operators.similarity import ensure_codebook_table

    ensure_signature_table(spark, sf_dir)
    ensure_digest_table(spark, sf_dir)
    ensure_lang_stats_table(spark, sf_dir)
    ensure_codebook_table(spark, sf_dir)
    spark.catalog.clearCache()

    for name in names:
        runs = []
        load_stamps = []
        for _ in range(repeats):
            load_stamps.append(loadavg())
            t0 = time.perf_counter()
            force(queries[name](spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        srt = sorted(runs)
        print(
            json.dumps(
                {
                    "query": name,
                    "runs": runs,
                    "median": srt[len(srt) // 2],
                    "best": srt[0],
                    "loadavg_per_run": load_stamps,
                    "load_end": loadavg(),
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
