"""Diagnose dedup_minhash_lsh vs dedup_lsh_kept at sf0.1 (stage timings)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark_kmeans_spark.session import get_spark
from pyspark_kmeans_spark.sources.tables import load_table
from pyspark_kmeans_spark.operators import dedup

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="diag")
docs = load_table(spark, SF, "documents")
docs.count()

def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.2f}s -> {r}", flush=True)
    return r

which = sys.argv[1] if len(sys.argv) > 1 else "stages"

if which == "stages":
    # Stage-by-stage of minhash_lsh_pairs internals
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel
    sigs = dedup.minhash_signatures(docs, num_hashes=64, seed=7)
    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    t("sigs.count", sigs.count)
    rows_per_band = 8
    band_entries = sigs.select(
        F.col("doc_id"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.hash(F.slice("sig", i*8+1, 8)).alias("bucket"))
            for i in range(8)])).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    left = band_entries.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    right = band_entries.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    candidates = (left.join(right, on=["band", "bucket"])
                  .filter(F.col("doc_a") < F.col("doc_b"))
                  .select("doc_a", "doc_b").distinct())
    t("candidates.count", candidates.count)
    toks = (docs.select(F.col("doc_id"), dedup.tokens_col("text").alias("_toks"))
            .withColumn("_n", F.size("_toks")).persist(StorageLevel.MEMORY_AND_DISK))
    t("toks.count", toks.count)
    with_a = candidates.join(toks.select(F.col("doc_id").alias("doc_a"), F.col("_toks").alias("_ta"), F.col("_n").alias("_na")), on="doc_a")
    with_b = with_a.join(toks.select(F.col("doc_id").alias("doc_b"), F.col("_toks").alias("_tb"), F.col("_n").alias("_nb")), on="doc_b")
    thr = 0.9
    size_ok = (F.col("_na") >= F.lit(thr)*F.col("_nb")) & (F.col("_nb") >= F.lit(thr)*F.col("_na"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.size(F.array_distinct(F.concat("_ta", "_tb")))
    jac = inter.cast("double")/union
    pairs = (with_b.filter(size_ok)
             .select("doc_a", "doc_b", jac.alias("jaccard"))
             .filter(F.col("jaccard") >= thr))
    t("pairs.count", pairs.count)
    t("pairs noop write", lambda: pairs.write.format("noop").mode("overwrite").save())
elif which == "pairs":
    df = dedup.q_dedup_minhash_lsh(spark, SF)
    t("minhash_lsh noop", lambda: df.write.format("noop").mode("overwrite").save())
elif which == "kept":
    df = dedup.q_dedup_lsh_kept(spark, SF)
    t("lsh_kept noop", lambda: df.write.format("noop").mode("overwrite").save())
spark.stop()
