"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extraction run as Arrow-batched pandas
transformations over ``mapInPandas``. The media libraries (Pillow, librosa,
decord, …) are NOT in this container, so the actual decoding step is
STUBBED: ``decode_image``/``decode_audio`` raise ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder (hash-seeded)
produces stable feature vectors — the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes int, sha256 string, feat array<float>"
)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'decoded features': bytes of sha256 → float[dim].

    Stands in for real pixel decoding; replace the body with PIL/librosa
    when the libs exist. Keeps tests meaningful: stable, content-derived.
    """
    h = hashlib.sha256(payload or b"").digest()
    while len(h) < dim * 4:  # extend for dims beyond 8 (sha256 is 32 bytes)
        h += hashlib.sha256(h).digest()
    return np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32) / 2**32


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image decode requires Pillow (not in this container); pass fake=True "
        "for the deterministic stub"
    )


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload, dim=16)
    raise NotImplementedError(
        "audio decode requires librosa/soundfile (not in this container); "
        "pass fake=True for the deterministic stub"
    )


def extract_image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the whole batch in one pandas DataFrame per Arrow
    chunk — the right shape for real decoders too (vectorized pre/post
    processing around a per-item decode loop). Partitioning is preserved;
    at 100 TB repartition upstream so each task holds ~128 MB of payloads.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "sha256": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feat": [f.tolist() for f in feats],
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame timestamp.

    Real decoders would demux the container; the stub emits the frame grid
    from ``duration_ms`` alone (deterministic), with a content hash.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                if not fake:
                    raise NotImplementedError("video decode not available; fake=True")
                dur = int(r["duration_ms"] or 0)
                digest = hashlib.sha256(r["payload"] or b"").hexdigest()
                for ts in range(0, max(dur, 1), every_ms):
                    rows.append((int(r["media_id"]), ts, digest))
            yield pd.DataFrame(rows, columns=["media_id", "frame_ts_ms", "sha256"])

    return df.filter(F.col("kind") == "video").mapInPandas(
        batches, schema="media_id long, frame_ts_ms long, sha256 string"
    )


def resize_images(
    df: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = True
) -> DataFrame:
    """Resize plumbing: payload → payload at (target_w, target_h).

    The stub keeps the payload bytes and rewrites the size metadata +
    content hash deterministically; a real implementation decodes,
    resamples, and re-encodes inside the same batch loop. Output schema is
    again MEDIA-shaped so resize composes with the other operators.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError("image resize requires Pillow; fake=True")
            out = pdf.copy()
            out["width"] = np.int32(target_w)
            out["height"] = np.int32(target_h)
            out["resize_sha256"] = [
                hashlib.sha256(
                    (p or b"") + f"{target_w}x{target_h}".encode()
                ).hexdigest()
                for p in pdf["payload"]
            ]
            yield out

    schema = (
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long, resize_sha256 string"
    )
    return df.filter(F.col("kind") == "image").mapInPandas(batches, schema=schema)


def extract_audio_features(
    df: DataFrame, window_ms: int = 500, fake: bool = True
) -> DataFrame:
    """Windowed audio features: one row per ``window_ms`` slice with a
    16-dim feature vector (MFCC-shaped; stub derives it from the content
    hash + window index so values are stable and content-dependent)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                if not fake:
                    raise NotImplementedError("audio decode requires librosa; fake=True")
                dur = int(r["duration_ms"] or 0)
                payload = r["payload"] or b""
                for i, _start in enumerate(range(0, max(dur, 1), window_ms)):
                    feat = _fake_decode(payload + i.to_bytes(4, "big"), dim=16)
                    rows.append(
                        (int(r["media_id"]), i * window_ms, feat.tolist())
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "window_start_ms", "feat"]
            )

    return df.filter(F.col("kind") == "audio").mapInPandas(
        batches, schema="media_id long, window_start_ms long, feat array<float>"
    )
