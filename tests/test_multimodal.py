"""B54 multimodal plumbing: binary payloads travel intact through plans
and joins; decode is real when Pillow/soundfile are importable (gated
round-trip tests) with a deterministic fake behind it; feature
extraction has a stable schema and values."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lookup_transform_spark import LookupSpec
from lookup_transform_spark.operators.multimodal import (
    attach_payload,
    decode_audio,
    decode_image,
    extract_features,
    frame_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frame(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return attach_payload(docs, "doc_id", "text", ["lang", "n_chars"])


def test_decode_without_codec_raises_clearly():
    from lookup_transform_spark.operators.multimodal import (
        have_audio_codec,
        have_image_codec,
    )

    if not have_image_codec():
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_image(b"abc")
    if not have_audio_codec():
        with pytest.raises(NotImplementedError, match="soundfile"):
            decode_audio(b"abc")
    # the fake path never needs a codec
    assert decode_image(b"abcdef", fake=True).shape == (8, 8, 3)
    assert decode_audio(b"ab", fake=True).tolist() == pytest.approx(
        [97 / 255.0, 98 / 255.0]
    )


def test_real_image_decode_roundtrip():
    """Gated on Pillow availability: encode a known RGB array to PNG,
    decode through the real path, expect the exact pixels back."""
    from lookup_transform_spark.operators.multimodal import have_image_codec

    if not have_image_codec():
        pytest.skip("Pillow not installed")
    import io

    from PIL import Image

    rgb = (np.arange(4 * 5 * 3, dtype=np.uint8)).reshape(4, 5, 3)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    out = decode_image(buf.getvalue())
    assert out.shape == (4, 5, 3)
    assert (out == rgb).all()


def test_real_audio_decode_roundtrip():
    """Gated on soundfile availability: WAV-encode a ramp, decode, and
    expect the samples back (16-bit quantization tolerance)."""
    from lookup_transform_spark.operators.multimodal import have_audio_codec

    if not have_audio_codec():
        pytest.skip("soundfile not installed")
    import io

    import soundfile as sf

    pcm = np.linspace(-0.5, 0.5, 64, dtype=np.float32)
    buf = io.BytesIO()
    sf.write(buf, pcm, samplerate=8000, format="WAV", subtype="PCM_16")
    out = decode_audio(buf.getvalue())
    assert out.shape == (64,)
    assert np.abs(out - pcm).max() < 1e-3


def test_resize_image_nearest():
    from lookup_transform_spark.operators.multimodal import resize_image

    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    small = resize_image(img, 3, 2)
    assert small.shape == (3, 2, 3)
    # nearest-neighbor: row i maps to source row i*6//3, col j to j*4//2
    assert (small == img[[0, 2, 4]][:, [0, 2]]).all()
    big = resize_image(img, 12, 8)
    assert big.shape == (12, 8, 3)


def test_payload_schema(frame):
    assert dict(frame.dtypes)["payload"] == "binary"
    assert dict(frame.dtypes)["meta"].startswith("struct<lang:string")


def test_payload_survives_lookup(spark, frame):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spec = LookupSpec("documents", "doc_id", "doc_id", "source", "src")
    out = spec.apply(frame, docs)
    row = out.filter(F.col("doc_id") == 0).collect()[0]
    original = docs.filter(F.col("doc_id") == 0).collect()[0]
    assert bytes(row.payload).decode("utf-8") == original.text
    assert row.src == original.source


def test_feature_extraction_deterministic(spark, frame):
    f1 = {r.doc_id: r for r in extract_features(frame).collect()}
    f2 = {r.doc_id: r for r in extract_features(frame).collect()}
    assert len(f1) == frame.count()
    some = next(iter(f1))
    assert f1[some].payload_len > 0
    assert len(f1[some].feature) == 8
    for k in f1:
        assert f1[k] == f2[k]


def test_frame_sample(frame):
    sampled = frame_sample(frame, every_nth=10)
    assert 0 < sampled.count() < frame.count()
