"""Genuine-scale harness for the round-9 additions without exponent rows
(VERDICT r9 Missing #3): the full-trio daily ingest flagship
(`daily_ingest_semantic`) and the mixture-constrained token budget
(`curation_token_budget_per_lang`).

The trio consumes BOTH tables, so both are blown up k× with the SAME id
shift (10,000,000 per replica — divisible by DAILY_BATCH_MOD=5, so every
replica keeps the 20/80 batch/corpus split):

  - documents via bench_scale.write_blowup (per-replica token salting —
    replicas share zero tokens, so digest/LSH true-dup volume grows ~k);
  - embeddings via bench_scale_ann.write_blowup_embeddings (per-replica
    diagonal sign flips — within-replica cosines exact, cross-replica
    cosines concentrate near 0, so semantic-dup volume grows ~k).

vec_id == doc_id correspondence survives because both blowups shift ids
identically, so stage 3 sees exactly the embeddings of its replica's
stage-2 survivors.

The per-lang budget query reads documents only; it rides the same tmp
sf_dir.  Artifact first-touch (digest/signature/codebook per blown
corpus) is the ingestion job's cost by contract and is excluded by the
best-of-n convention (rep 1 pays the builds, the min never records it).

Prints one JSON line mirroring bench_scale.py:
  {"metric": "scaling_trio", "sizes": {...},
   "seconds": {query: {k: sec}}, "exponent": {query: slope}}

Usage: python bench_scale_trio.py            (sf0.1, k = 1,4)
       SPARK_GRAFT_SCALE_KS=1,2,4 python bench_scale_trio.py
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_kmeans_spark.session import get_spark
from pyspark_kmeans_spark.sources.tables import load_table

from bench_scale import write_blowup
from bench_scale_ann import write_blowup_embeddings

QUERIES = os.environ.get(
    "SPARK_GRAFT_SCALE_QUERIES",
    "daily_ingest_semantic,curation_token_budget_per_lang",
).split(",")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ks = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_KS", "1,4").split(",")]
    spark = get_spark(app_name="bench_scale_trio")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    seconds: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    sizes: dict[int, int] = {}
    # The SOURCE sf tag is part of every scratch path (ADVICE r11 #1):
    # warehouse artifacts (signature/digest/codebook tables) are keyed by
    # the tmp_sf PATH, so a path reused across different
    # SPARK_GRAFT_SF_DIRs would silently serve artifacts built on the
    # previous scale's corpus — the staleness class the scaffold rebuild
    # below guards against for the static tables.
    src_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    for k in ks:
        doc_path = f"/tmp/scale_trio_docs_{src_tag}_k{k}.parquet"
        emb_path = f"/tmp/scale_trio_emb_{src_tag}_k{k}.parquet"
        write_blowup(docs, k, doc_path)
        write_blowup_embeddings(emb, k, emb_path)
        sizes[k] = spark.read.parquet(doc_path).count()
        tmp_sf = f"/tmp/scale_trio_sf_{src_tag}_k{k}"
        # Rebuild the scaffold from scratch every run (ADVICE r10 #3): a
        # leftover scaffold from a prior run with a different
        # SPARK_GRAFT_SF_DIR would silently mix the old scale's static
        # tables with the new blowup.
        shutil.rmtree(tmp_sf, ignore_errors=True)
        os.makedirs(tmp_sf)
        for t in TABLES:
            os.symlink(f"{sf_dir}/{t}.parquet", f"{tmp_sf}/{t}.parquet")
        for t, blown in (("documents", doc_path), ("embeddings", emb_path)):
            os.symlink(blown, f"{tmp_sf}/{t}.parquet")
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
        "metric": "scaling_trio",
        "sf": sf_dir,
        "sizes": sizes,
        "seconds": seconds,
        "exponent": exponent,
    }))


if __name__ == "__main__":
    main()
