"""Multimodal column plumbing (north-star §7.5).

Images/audio/video are carried as opaque `binary` columns plus a typed
metadata struct.  The decode libraries are not in this container, so the
decode step is a clearly-marked stub (NotImplementedError) and a
deterministic fake extractor — but the Spark-side plumbing is real and
tested: schema, Arrow batch shape, mapInPandas signature, partitioning.

Design for 100 TB of binary payloads:
 - payloads never pass through Python except inside Arrow batches of the
   mapInPandas extractor (bounded by spark.sql.execution.arrow.maxRecordsPerBatch);
 - metadata-only queries (byte length, checksum, mime) stay fully JVM-side
   so filtering/routing by metadata never touches the payload in Python;
 - the extractor emits fixed-width feature vectors, not the raw payload, so
   downstream stages shed the heavy column as early as possible.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_kmeans_spark.sources.tables import load_table

N_FAKE_FEATURES = 8


def attach_payload(docs: DataFrame) -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + typed metadata.
    (Real pipelines read payloads from object storage; the schema and all
    downstream plumbing are identical.)"""
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.length(payload).alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
        F.lit("utf-8").alias("encoding"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def decode_image(payload_col):  # pragma: no cover - stub
    """STUB — image decode requires PIL/opencv, not present in this
    container.  The real implementation is a mapInPandas over Arrow binary
    batches, identical in shape to `extract_fake_features` below."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use extract_fake_features for plumbing tests"
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_fake_features(multimodal: DataFrame) -> DataFrame:
    """Deterministic fake 'decoder': per payload, an 8-dim feature vector
    (mean byte value of 8 equal chunks).  Stands in for decode/resize/
    frame-sample; exercises the real Arrow batch path end-to-end."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                n = max(len(b) // N_FAKE_FEATURES, 1)
                feats.append(
                    [
                        float(sum(chunk) / len(chunk)) if (chunk := b[i * n : (i + 1) * n]) else 0.0
                        for i in range(N_FAKE_FEATURES)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": feats,
                }
            )

    return multimodal.mapInPandas(batches, schema=_FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# Query registry
# --------------------------------------------------------------------------


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only path: JVM-side byte length + checksum, no Python."""
    mm = attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.md5("payload").alias("payload_md5"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake feature extraction; output flattened to scalars
    so the result is hashable (feature mean as the representative stat)."""
    mm = attach_payload(load_table(spark, sf_dir, "documents"))
    feats = extract_fake_features(mm)
    fmean = F.aggregate("features", F.lit(0.0), lambda a, x: a + x) / N_FAKE_FEATURES
    return feats.select("doc_id", "n_bytes", F.round(fmean, 6).alias("feature_mean"))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_metadata": q_multimodal_metadata,
    "multimodal_features": q_multimodal_features,
}

ORACLES: dict[str, str] = {
    # md5(VARCHAR) in DuckDB hashes the utf-8 bytes — same bytes Spark's
    # md5(encode(text,'UTF-8')) hashes.
    "multimodal_metadata": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               'text/plain' AS mime,
               md5(text) AS payload_md5
        FROM documents
    """,
    # The fake decoder's chunked byte means, re-expressed over DuckDB list
    # functions: byte values via hex-pair extraction, the same
    # n = max(nb//8, 1) chunking, empty chunks -> 0.0, mean-of-means
    # rounded to 6 decimals (chunk sums are exact integers in double, so
    # the divisions are bit-identical across engines).
    "multimodal_features": """
        WITH b AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS nb
            FROM documents
        ), chunked AS (
            SELECT doc_id, nb, greatest(nb // 8, 1) AS n,
                   list_transform(range(nb), i ->
                       CAST('0x' || substr(hx, CAST(i*2+1 AS INT), 2) AS INT)) AS bv
            FROM b
        )
        SELECT doc_id, CAST(nb AS INT) AS n_bytes,
               ROUND(list_aggregate(list_transform(range(8), i ->
                   coalesce(list_aggregate(
                       list_slice(bv, CAST(i*n+1 AS INT), CAST((i+1)*n AS INT)),
                       'avg'), 0.0)), 'sum') / 8, 6) AS feature_mean
        FROM chunked
    """,
}
