"""Multimodal columns (SURVEY.md §2.2 B54): opaque binary payloads with
typed metadata, plus decode / feature-extract / resize / frame-sample
plumbing as Arrow-batched ``mapInPandas`` stages.

Decode is REAL when the optional codec libraries are importable —
Pillow for images, soundfile for audio — and import-guarded so the
module (and every Spark plan built from it) works without them:
``decode_image``/``decode_audio`` use the library when present, raise a
clear ``NotImplementedError`` when absent, and ``fake=True`` always
selects the deterministic stand-in (byte-tiling / byte-PCM) that CI and
the oracle checks pin. The imports happen lazily INSIDE the decode
call, i.e. on the executor — the right place for an optional native
dependency in a cluster deployment (the driver never needs it).

The Spark-side contract — schemas, batch iteration, partitioning,
binary transport through joins — is identical on both paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pillow():
    """Import-guarded Pillow handle (None when not installed)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _soundfile():
    """Import-guarded soundfile handle (None when not installed)."""
    try:
        import soundfile  # noqa: PLC0415

        return soundfile
    except ImportError:
        return None


def have_image_codec() -> bool:
    return _pillow() is not None


def have_audio_codec() -> bool:
    return _soundfile() is not None

#: schema of the feature-extraction stage output
FEATURE_SCHEMA = (
    "doc_id long, payload_len int, mean_byte double, byte_entropy double, "
    "feature array<float>"
)


def attach_payload(
    df: DataFrame, id_col: str, text_col: str, meta_cols: list[str]
) -> DataFrame:
    """Build a multimodal frame: binary payload + metadata struct. In a
    real pipeline the payload column comes from
    ``spark.read.format("binaryFile")`` or a parquet binary column."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(*[F.col(c) for c in meta_cols]).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWxC uint8 array.

    Real path: Pillow (any format it supports — PNG/JPEG/...), imported
    lazily on the executor. ``fake=True`` (or in tests/CI) selects the
    deterministic byte-tiling stand-in regardless of codec presence."""
    if not fake:
        Image = _pillow()
        if Image is None:
            raise NotImplementedError(
                "image decode requires Pillow (pip install pillow) on the "
                "executors; pass fake=True for the deterministic stand-in"
            )
        import io  # noqa: PLC0415

        with Image.open(io.BytesIO(payload)) as img:
            return np.asarray(img.convert("RGB"))
    # deterministic fake: tile the bytes into a fixed 8x8 "image"
    arr = np.frombuffer(payload, dtype=np.uint8)
    out = np.resize(arr, (8, 8, 3))
    return out


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an audio payload to a 1-D float32 PCM array (mono-mixed).

    Real path: soundfile (WAV/FLAC/OGG/...), imported lazily on the
    executor. ``fake=True`` selects the byte-PCM stand-in."""
    if not fake:
        sf = _soundfile()
        if sf is None:
            raise NotImplementedError(
                "audio decode requires soundfile (pip install soundfile) on "
                "the executors; pass fake=True for the deterministic stand-in"
            )
        import io  # noqa: PLC0415

        data, _rate = sf.read(io.BytesIO(payload), dtype="float32")
        if data.ndim > 1:  # mix channels down to mono
            data = data.mean(axis=1)
        return data
    return np.frombuffer(payload, dtype=np.uint8).astype(np.float32) / 255.0


def resize_image(
    img: np.ndarray, height: int, width: int
) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (no codec dependency) — the
    post-decode normalization step of an image pipeline. Deterministic,
    so resized features stay oracle-comparable."""
    h, w = img.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return img[rows[:, None], cols[None, :]]


def extract_features(frame: DataFrame, batch_fake_decode: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas — the
    Arrow-batched shape a real decoder plugs into (one numpy pass per
    batch, no per-row Python).

    Features here are the deterministic fake: payload length, mean byte
    value, byte entropy, and an 8-bin byte histogram as array<float>.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = decode_audio(bytes(payload), fake=batch_fake_decode)
                byts = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.histogram(byts, bins=8, range=(0, 256))[0]
                p = hist / max(1, byts.size)
                nz = p[p > 0]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload_len": int(byts.size),
                        "mean_byte": float(byts.mean()) if byts.size else 0.0,
                        "byte_entropy": float(-(nz * np.log2(nz)).sum()),
                        "feature": (hist.astype(np.float32) / max(1, byts.size)),
                    }
                )
            yield pd.DataFrame(rows)

    return frame.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample(frame: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling stand-in: deterministically keep every Nth payload
    by id — the partition-pruning-friendly shape of video frame
    sampling (filter before decode, never after)."""
    return frame.filter(F.col("doc_id") % every_nth == 0)
