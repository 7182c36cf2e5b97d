"""Multimodal columns (SURVEY.md §2.2 B54): opaque binary payloads with
typed metadata, plus decode / feature-extract / resize / frame-sample
plumbing as Arrow-batched ``mapInPandas`` stages.

The image/audio codecs are not available in this environment, so the
actual decode is STUBBED: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (byte-histogram features) stands in. The
Spark-side contract — schemas, batch iteration, partitioning, binary
transport through joins — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    """Decode an image payload to HxWxC. STUB: no codec libs here."""
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    # deterministic fake: tile the bytes into a fixed 8x8 "image"
    arr = np.frombuffer(payload, dtype=np.uint8)
    out = np.resize(arr, (8, 8, 3))
    return out


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an audio payload to a 1-D PCM array. STUB (see above)."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires a codec library not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    return np.frombuffer(payload, dtype=np.uint8).astype(np.float32) / 255.0


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
