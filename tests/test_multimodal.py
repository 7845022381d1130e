"""Multimodal plumbing tests: Arrow batch path, schema, deterministic fake
extractor, stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_kmeans_spark.operators.multimodal import (
    N_FAKE_FEATURES,
    attach_payload,
    decode_image,
    extract_fake_features,
)
from pyspark_kmeans_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def mm(spark, sf_dir):
    return attach_payload(load_table(spark, sf_dir, "documents")).cache()


def test_payload_schema(mm):
    fields = {f.name: f.dataType.simpleString() for f in mm.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<n_bytes:int")


def test_metadata_matches_payload(mm):
    bad = mm.filter(F.col("meta.n_bytes") != F.length("payload")).count()
    assert bad == 0


def test_fake_features_shape(mm):
    feats = extract_fake_features(mm)
    rows = feats.limit(20).collect()
    assert rows
    for r in rows:
        assert len(r.features) == N_FAKE_FEATURES
        assert all(0.0 <= v <= 255.0 for v in r.features)  # byte means
        assert r.n_bytes > 0


def test_fake_features_deterministic(mm):
    a = sorted((r.doc_id, tuple(r.features)) for r in extract_fake_features(mm).collect())
    b = sorted((r.doc_id, tuple(r.features)) for r in extract_fake_features(mm).collect())
    assert a == b


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(None)


def test_sample_frames_planted(spark):
    import hashlib

    from pyspark_kmeans_spark.operators.multimodal import sample_frames

    # 10-byte payload, 4-byte frames, every 2nd: frames 0 ("abcd") and
    # 2 (the 2-byte tail "ij") — the 1->N fan-out and the short tail frame.
    df = spark.createDataFrame(
        [(7, bytearray(b"abcdefghij"))], "doc_id long, payload binary"
    )
    got = sorted(
        (r.doc_id, r.frame_idx, r.frame_len, r.frame_md5)
        for r in sample_frames(df, frame_bytes=4, every=2).collect()
    )
    assert got == [
        (7, 0, 4, hashlib.md5(b"abcd").hexdigest()),
        (7, 2, 2, hashlib.md5(b"ij").hexdigest()),
    ]


def test_audio_decode_is_stubbed():
    from pyspark_kmeans_spark.operators.multimodal import decode_audio

    with pytest.raises(NotImplementedError):
        decode_audio(None)
