"""Corpus-independence harness for the incremental-dedup batch path.

The production claim behind `incremental_kept_against` (the engine behind
`dedup_incremental_lsh` and the daily-ingest flagship) is that a DAILY
BATCH run costs batch-sized work, not corpus-sized work: the corpus is
read only as (a) stored signatures banded by slice-hash and (b) token
arrays joined for verify — and after the round-5 two-wave + batch-
adjacency rework, every aggregation is pruned map-side to buckets that
contain a batch member.

This harness fixes the batch (500 exact-dup docs + 500 fresh docs) and
grows ONLY the corpus k× (disjoint salted replicas, bench_scale.py's
trick, so true-dup structure per replica is unchanged), then times the
batch dedup at each k:

  - `two_wave`: the shipped path.
  - `pre_prune`: the pre-round-5 spelling (full grouped expansion over
    ALL corpus band entries, no adjacency prune, no waves) — kept here
    as the comparison baseline.

A corpus-independent batch path should be ~FLAT in k (exponent ≈ 0; the
only corpus-sized touches left are the parquet signature scan feeding
the map-side semi-join and the verify join's build side).  The
pre-prune spelling pays the corpus-entries groupBy every run and grows
with k.  Signature-table builds are the ingestion job's cost and are
excluded from the timings (write-once contract, BASELINE.md).

Prints one JSON line:
  {"metric": "incremental_scaling", "sizes": {...},
   "seconds": {variant: {k: sec}}, "exponent": {variant: slope}}
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F

from pyspark_kmeans_spark.operators.dedup import (
    _grouped_buckets,
    _persist,
    band_entries_from_sig,
    build_signature_table,
    incremental_kept_against,
    release_persisted,
)
from pyspark_kmeans_spark.session import get_spark
from pyspark_kmeans_spark.sources.tables import load_table

from bench_scale import write_blowup


def pre_prune_incremental(
    signatures: DataFrame, new_df: DataFrame, *, threshold: float = 0.9
) -> DataFrame:
    """The pre-round-5 spelling, verbatim shape: one capped grouped
    expansion over ALL corpus∪batch band entries, verify every candidate.
    Same output below the bucket cap; corpus-sized candidate stage."""
    bands, rows_per_band = 8, 8
    bat = _persist(build_signature_table(new_df))
    bat.count()
    all_sig = signatures.select(
        "doc_id", "toks", "n", "sig", F.lit(1).alias("_is_corpus")
    ).unionByName(
        bat.select("doc_id", "toks", "n", "sig", F.lit(0).alias("_is_corpus"))
    )
    grouped = _grouped_buckets(
        band_entries_from_sig(
            all_sig,
            bands=bands,
            rows_per_band=rows_per_band,
            extra_cols=("_is_corpus",),
        ),
        F.struct(F.col("doc_id").alias("_id"), F.col("_is_corpus")),
        5000,
        "pre_prune_incremental",
    )
    b_rows = grouped.select(
        "_ms",
        F.explode(
            F.filter(F.col("_ms"), lambda m: m["_is_corpus"] == 0)
        ).alias("_b"),
    )
    candidates = (
        b_rows.select(
            F.col("_b")["_id"].alias("doc_b"),
            F.explode(
                F.filter(F.col("_ms"), lambda a: a["_id"] != F.col("_b")["_id"])
            ).alias("_a"),
        )
        .select(F.col("_a")["_id"].alias("doc_a"), "doc_b")
        .distinct()
    )
    with_a = candidates.join(
        all_sig.select(
            F.col("doc_id").alias("doc_a"),
            F.col("toks").alias("_ta"),
            F.col("n").alias("_na"),
            "_is_corpus",
        ).hint("shuffle_hash"),
        on="doc_a",
    )
    with_b = with_a.join(
        bat.select(
            F.col("doc_id").alias("doc_b"),
            F.col("toks").alias("_tb"),
            F.col("n").alias("_nb"),
        ),
        on="doc_b",
    )
    size_ok = (F.col("_na") >= F.lit(threshold) * F.col("_nb")) & (
        F.col("_nb") >= F.lit(threshold) * F.col("_na")
    )
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.col("_na") + F.col("_nb") - inter
    jac = inter.cast("double") / union
    precedence = (F.col("_is_corpus") == 1) | (F.col("doc_a") < F.col("doc_b"))
    losers = (
        with_b.filter(precedence)
        .filter(size_ok)
        .filter(jac >= threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return new_df.join(losers, on="doc_id", how="left_anti").select("doc_id")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ks = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_KS", "1,4,16").split(",")
    ]
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))
    spark = get_spark(
        app_name="bench_scale_incremental",
        extra_conf={"spark.driver.maxResultSize": "4g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Fixed batch: 500 exact dups of replica-0 corpus docs (new ids) +
    # 500 fresh docs no corpus replica can match.
    salt_r0 = F.array_join(
        F.transform(
            F.split(F.trim(F.col("text")), "\\s+"),
            lambda t: F.concat(t, F.lit("_r0")),
        ),
        " ",
    )
    dups = (
        base.filter(F.col("doc_id") % 10 == 0)
        .limit(500)
        .select((F.col("doc_id") + 900_000_000).alias("doc_id"), salt_r0.alias("text"))
    )
    fresh_salt = F.array_join(
        F.transform(
            F.split(F.trim(F.col("text")), "\\s+"),
            lambda t: F.concat(t, F.lit("_fresh")),
        ),
        " ",
    )
    fresh = (
        base.filter(F.col("doc_id") % 10 == 1)
        .limit(500)
        .select((F.col("doc_id") + 950_000_000).alias("doc_id"), fresh_salt.alias("text"))
    )
    batch = dups.unionByName(fresh).persist()
    batch.count()

    variants = {
        "two_wave": lambda sigs: incremental_kept_against(sigs, batch),
        "pre_prune": lambda sigs: pre_prune_incremental(sigs, batch),
    }
    seconds: dict[str, dict[int, float]] = {v: {} for v in variants}
    kept: dict[str, dict[int, int]] = {v: {} for v in variants}
    sizes: dict[int, int] = {}
    for k in ks:
        docs_path = f"/tmp/inc_scale_docs_k{k}.parquet"
        sig_path = f"/tmp/inc_scale_sigs_k{k}.parquet"
        if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
            write_blowup(base, k, docs_path)
        corpus = spark.read.parquet(docs_path)
        sizes[k] = corpus.count()
        if not os.path.exists(os.path.join(sig_path, "_SUCCESS")):
            # Ingestion-job cost, excluded from timings (write-once).
            build_signature_table(corpus).write.mode("overwrite").parquet(sig_path)
        for name, fn in variants.items():
            best = None
            for _ in range(repeats):
                release_persisted()
                sigs = spark.read.parquet(sig_path)
                t0 = time.time()
                out = fn(sigs)
                n = out.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                kept[name][k] = n
            seconds[name][k] = round(best, 2)
            print(
                f"[k={k}] {name}: {seconds[name][k]}s kept={kept[name][k]}",
                file=sys.stderr,
                flush=True,
            )

    exponent = {}
    for name in variants:
        xs = [math.log(k) for k in ks]
        ys = [math.log(max(seconds[name][k], 0.05)) for k in ks]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        den = sum((x - mx) ** 2 for x in xs) or 1.0
        exponent[name] = round(num / den, 2)

    print(
        json.dumps(
            {
                "metric": "incremental_scaling",
                "sizes": sizes,
                "batch_rows": batch.count(),
                "seconds": seconds,
                "kept": kept,
                "exponent": exponent,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
