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


def test_compressed_png_roundtrip_byte_exact():
    """COMPRESSED image path, no library needed (VERDICT r5 #7): PNG is
    lossless, so encode_png → decode must return the EXACT pixels —
    through the public dispatch (magic-byte sniff) when Pillow is
    absent, and through the built-in decoder directly either way."""
    from lookup_transform_spark.operators.multimodal import (
        _decode_png,
        encode_png,
        have_image_codec,
    )

    rgb = (np.arange(4 * 5 * 3, dtype=np.uint8) * 7 % 256).reshape(4, 5, 3)
    payload = encode_png(rgb)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    assert (_decode_png(payload) == rgb).all()
    out = decode_image(payload)  # Pillow when present, built-in otherwise
    assert out.shape == (4, 5, 3) and (out == rgb).all()
    if have_image_codec():  # both decoders must agree bit-for-bit
        assert (_decode_png(payload) == out).all()


def test_png_all_filter_types_unfilter_correctly():
    """The built-in PNG decoder must invert every scanline filter type
    (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth): filter a known image
    row-by-row with each type, wrap it in chunks, decode, expect the
    original pixels."""
    import struct
    import zlib

    from lookup_transform_spark.operators.multimodal import _decode_png

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, ch = rgb.shape
    stride = w * ch
    flat = rgb.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = y % 5
        line = flat[y]
        if f == 0:
            filt = line
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(ch, dtype=np.int64), line[:-ch]])
            filt = (line - left) & 255
        elif f == 2:  # Up
            filt = (line - prev) & 255
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(ch, dtype=np.int64), line[:-ch]])
            filt = (line - ((left + prev) >> 1)) & 255
        else:  # Paeth
            filt = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = int(line[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = (line[i] - pred) & 255
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = line

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (_decode_png(payload) == rgb).all()


def test_compressed_mulaw_wav_roundtrip():
    """COMPRESSED audio path, no library needed (VERDICT r5 #7): G.711
    µ-law WAV. Decode must recover samples within companding tolerance,
    and re-encoding the decoded signal must reproduce the encoded bytes
    EXACTLY (µ-law is idempotent on its own reconstruction levels)."""
    from lookup_transform_spark.operators.multimodal import (
        _mulaw_compress,
        _mulaw_expand,
        encode_wav,
    )

    pcm = np.linspace(-0.5, 0.5, 64, dtype=np.float32)
    payload = encode_wav(pcm, subtype="ULAW")
    assert len(payload) < len(encode_wav(pcm, subtype="PCM_16"))  # 2:1
    out = decode_audio(payload)
    assert out.shape == (64,)
    # µ-law quantization: the coarsest (top) segment has step
    # 2^7·8/32768 ≈ 0.031, so worst-case error is a half-step ≈ 0.0156
    # of full scale (measured 0.0116 at the ±0.5 endpoints here)
    assert np.abs(out - pcm).max() < 0.016
    # byte-exact in the compressed domain
    enc = _mulaw_compress((pcm * 32767.0).round().astype(np.int16))
    again = _mulaw_compress(_mulaw_expand(enc))
    assert (enc == again).all()


def test_builtin_ppm_roundtrip_byte_exact():
    """Real decode path, no library needed: P6 PPM is lossless, so the
    encode→decode round-trip must return the EXACT pixel array."""
    from lookup_transform_spark.operators.multimodal import encode_ppm

    rgb = (np.arange(4 * 5 * 3, dtype=np.uint8) * 7 % 256).reshape(4, 5, 3)
    out = decode_image(encode_ppm(rgb))
    assert out.dtype == np.uint8 and out.shape == (4, 5, 3)
    assert (out == rgb).all()


def test_builtin_ppm_header_comments_and_whitespace():
    from lookup_transform_spark.operators.multimodal import encode_ppm

    rgb = np.full((2, 3, 3), 9, dtype=np.uint8)
    body = encode_ppm(rgb).split(b"255\n", 1)[1]
    weird = b"P6 # a comment\n# another\n 3\t2\n255\n" + body
    assert (decode_image(weird) == rgb).all()


def test_builtin_bmp_roundtrip_byte_exact():
    """BMP 24-bit: bottom-up rows + 4-byte row padding both exercised
    (width 5 → 15-byte rows, 1 pad byte)."""
    from lookup_transform_spark.operators.multimodal import encode_bmp

    rgb = (np.arange(3 * 5 * 3, dtype=np.uint8) * 11 % 256).reshape(3, 5, 3)
    out = decode_image(encode_bmp(rgb))
    assert out.shape == (3, 5, 3)
    assert (out == rgb).all()


def test_builtin_wav_roundtrips():
    from lookup_transform_spark.operators.multimodal import encode_wav

    pcm = np.linspace(-0.5, 0.5, 64, dtype=np.float32)
    # PCM_16: 16-bit quantization tolerance
    out16 = decode_audio(encode_wav(pcm, subtype="PCM_16"))
    assert out16.shape == (64,) and out16.dtype == np.float32
    assert np.abs(out16 - pcm).max() < 1e-3
    # FLOAT: exact in float32
    outf = decode_audio(encode_wav(pcm, subtype="FLOAT"))
    assert (outf == pcm).all()
    # PCM_8: coarse but bounded
    out8 = decode_audio(encode_wav(pcm, subtype="PCM_8"))
    assert np.abs(out8 - pcm).max() < 1e-1


def test_builtin_wav_stereo_mixes_to_mono():
    import struct

    from lookup_transform_spark.operators.multimodal import _decode_wav

    left = np.array([0.5, -0.5, 0.25], dtype=np.float32)
    right = np.array([0.0, 0.5, 0.25], dtype=np.float32)
    inter = np.empty(6, dtype="<f4")
    inter[0::2], inter[1::2] = left, right
    body = inter.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 2, 8000, 8000 * 8, 8, 32)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    out = _decode_wav(wav)
    assert np.allclose(out, (left + right) / 2.0)


def test_decode_stats_spark_stage(spark):
    """The mapInPandas decode stage runs REAL container parsing on the
    executors for a mixed image/audio frame."""
    from lookup_transform_spark.operators.multimodal import (
        decode_stats,
        encode_ppm,
        encode_wav,
    )

    rgb = (np.arange(8 * 8 * 3, dtype=np.uint8)).reshape(8, 8, 3)
    pcm = np.linspace(-0.25, 0.25, 32)
    rows = [
        (0, bytearray(encode_ppm(rgb)), "image"),
        (1, bytearray(encode_wav(pcm, subtype="PCM_16")), "audio"),
    ]
    frame = spark.createDataFrame(
        rows, "doc_id long, payload binary, modality string"
    )
    got = {r["doc_id"]: r for r in decode_stats(frame).collect()}
    assert got[0]["height"] == 8 and got[0]["width"] == 8
    assert got[0]["mean_value"] == pytest.approx(float(rgb.mean()))
    assert got[1]["n_samples"] == 32
    assert got[1]["mean_value"] == pytest.approx(float(pcm.mean()), abs=1e-3)


def test_decode_stats_dirty_rows_survive_with_null_stats(spark):
    """r8 review: a NULL payload hit bytes(None) (TypeError killed the
    stage) and an unknown/NULL modality was dispatched to the AUDIO
    decoder, dying with a misleading codec error. Dirty rows must
    survive with NULL stats; clean rows must decode unchanged."""
    from lookup_transform_spark.operators.multimodal import (
        decode_stats,
        encode_ppm,
    )

    rgb = (np.arange(4 * 4 * 3, dtype=np.uint8)).reshape(4, 4, 3)
    rows = [
        (0, bytearray(encode_ppm(rgb)), "image"),
        (1, None, "image"),                       # NULL payload
        (2, bytearray(b"notacontainer"), "video"),  # unknown modality
        (3, bytearray(b"x"), None),               # NULL modality
    ]
    frame = spark.createDataFrame(
        rows, "doc_id long, payload binary, modality string"
    )
    got = {r["doc_id"]: r for r in decode_stats(frame).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0]["height"] == 4 and got[0]["width"] == 4
    for i in (1, 2, 3):
        assert got[i]["height"] is None and got[i]["mean_value"] is None


def test_codec_roundtrips_property():
    """Property pin for the built-in codecs: encode→decode is the
    identity (PPM/BMP byte-exact; WAV within subtype quantization) over
    randomized shapes and contents."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lookup_transform_spark.operators.multimodal import (
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
    )
    def image_roundtrip(h, w, seed):
        rng = np.random.RandomState(seed)
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_image(encode_ppm(rgb)) == rgb).all()
        assert (decode_image(encode_bmp(rgb)) == rgb).all()

    @settings(max_examples=40, deadline=None)
    @given(n=st.integers(1, 200), seed=st.integers(0, 2**31 - 1))
    def audio_roundtrip(n, seed):
        rng = np.random.RandomState(seed)
        pcm = (rng.rand(n).astype(np.float32) - 0.5) * 1.8
        assert (decode_audio(encode_wav(pcm, subtype="FLOAT")) == pcm).all()
        got = decode_audio(encode_wav(pcm, subtype="PCM_16"))
        assert np.abs(got - pcm).max() < 1e-3

    image_roundtrip()
    audio_roundtrip()


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


def test_extract_features_parameterized_columns(spark):
    """r8 review: hardcoded pdf['doc_id']/pdf['payload'] crashed with an
    opaque executor KeyError on renamed frames; the columns are now
    parameters (decode_stats' existing contract)."""
    from pyspark.sql import functions as F

    from lookup_transform_spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [(7, bytearray(b"\x00\x01\x02\x03"))],
        "image_id long, blob binary",
    )
    out = extract_features(df, id_col="image_id", payload_col="blob").collect()
    assert len(out) == 1 and out[0]["payload_len"] == 4
    # default names still work
    d2 = df.select(F.col("image_id").alias("doc_id"), F.col("blob").alias("payload"))
    assert extract_features(d2).count() == 1
