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
