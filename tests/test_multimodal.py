"""B54 multimodal plumbing: binary payloads travel intact through plans
and joins; decode is stubbed (NotImplementedError) with a deterministic
fake behind it; feature extraction has a stable schema and values."""

from __future__ import annotations

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


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")
    with pytest.raises(NotImplementedError):
        decode_audio(b"abc")
    assert decode_image(b"abcdef", fake=True).shape == (8, 8, 3)
    assert decode_audio(b"ab", fake=True).tolist() == pytest.approx(
        [97 / 255.0, 98 / 255.0]
    )


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
