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
    """Environment-portable spelling: where Pillow is absent the probe
    gates decode_image to the guided stub; where it exists, the stub
    contract is covered by the monkeypatched test below instead."""
    from pyspark_kmeans_spark.operators.multimodal import imaging_available

    if imaging_available():
        pytest.skip("Pillow present — decode_image is live, not stubbed")
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


def _sine_wav_bytes(sr=8000, hz=440.0, seconds=0.25, amp=0.5) -> bytes:
    """A PCM16 mono WAV of a known sine, via stdlib only — RMS is
    amp/√2, giving the decode test an analytic expectation."""
    import io
    import math
    import struct
    import wave

    n = int(sr * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(
            b"".join(
                struct.pack(
                    "<h",
                    int(amp * 32767 * math.sin(2 * math.pi * hz * i / sr)),
                )
                for i in range(n)
            )
        )
    return buf.getvalue()


def test_audio_decode_real_wav(spark):
    """The round-12 LIVE audio path (stdlib-wave floor, so it runs green
    in THIS container — no capability skip): a generated 8 kHz sine WAV
    decodes to its true sample rate/length, per-25ms-frame RMS ≈ amp/√2,
    and a non-audio payload yields sample_rate=0 with NULL frame_rms
    instead of failing the task."""
    from pyspark_kmeans_spark.operators.multimodal import decode_audio

    sr, amp = 8000, 0.5
    df = spark.createDataFrame(
        [
            (1, bytearray(_sine_wav_bytes(sr=sr, amp=amp))),
            (2, bytearray(b"not audio at all")),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_audio(df).collect()}
    assert got[1].sample_rate == sr
    assert got[1].n_samples == sr // 4
    hop = sr * 25 // 1000  # 200 samples/frame
    assert len(got[1].frame_rms) == (got[1].n_samples + hop - 1) // hop
    expected = amp / 2**0.5
    for v in got[1].frame_rms:
        assert abs(v - expected) < 0.02, v
    assert got[2].sample_rate == 0
    assert got[2].frame_rms is None


def test_image_decode_raises_without_pillow(monkeypatch):
    """With the capability probe reporting False (this container's real
    state), decode_image must raise the guided NotImplementedError — the
    stub contract, now probe-gated instead of unconditional."""
    from pyspark_kmeans_spark.operators import multimodal

    monkeypatch.setattr(multimodal, "imaging_available", lambda: False)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(None)


def test_image_decode_real_when_pillow_present(spark):
    """Invariant test for the REAL decode path — skips cleanly where
    Pillow is absent (this container), runs wherever it exists: a tiny
    generated PNG decodes to its true dimensions with an 8x8 [0,1]
    feature vector, and a non-image payload yields width=height=0 with
    NULL features instead of failing the task."""
    from pyspark_kmeans_spark.operators.multimodal import (
        decode_image,
        imaging_available,
    )

    if not imaging_available():
        pytest.skip("Pillow not available in this environment")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (12, 5), color=128).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_image(df).collect()}
    assert (got[1].width, got[1].height) == (12, 5)
    assert len(got[1].features) == 64
    assert all(abs(v - 128 / 255.0) < 1e-9 for v in got[1].features)
    assert (got[2].width, got[2].height) == (0, 0)
    assert got[2].features is None
