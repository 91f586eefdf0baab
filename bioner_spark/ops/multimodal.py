"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic byte-level fake, or NotImplementedError for real codecs) —
but the Spark-side plumbing is real and tested: schema, Arrow batch shape,
mapInPandas signature, partitioning. Swapping in PIL/librosa/ffmpeg later
changes only the body of `_decode_stub`.

Design for 100 TB of media: payloads stay binary end-to-end (never hit
Python strings), batches are bounded by bytes not rows (`byte_budget`), and
feature extraction emits fixed-size float arrays so downstream is columnar.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = "media_id string, modality string, n_bytes int, feature array<float>"
HIST_SCHEMA = "media_id string, modality string, n_bytes int, feature array<int>"

REAL_CODECS_AVAILABLE = False  # flipped when PIL/librosa exist in the image


def _decode_stub(payload: bytes, modality: str, normalize: bool = True) -> np.ndarray:
    """Deterministic fake 'decode + featurize': 32-bin byte histogram,
    L1-normalized (normalize=False returns the raw int32 counts — exact
    integer output lets the DuckDB oracle verify the full mapInPandas
    plumbing bit-for-bit, no float32-vs-double tolerance games).
    Stands in for resize/mel-spectrogram/frame-sample."""
    if payload is None or len(payload) == 0:
        z = np.zeros(32, dtype=np.float32 if normalize else np.int32)
        return z
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 3, minlength=32)
    if not normalize:
        return hist.astype(np.int32)
    hist = hist.astype(np.float32)
    return hist / max(hist.sum(), 1.0)


def decode_real(payload: bytes, modality: str) -> np.ndarray:
    """The real decoder hook — requires codec libraries not in this image."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "wire PIL/librosa/av here and set REAL_CODECS_AVAILABLE=True"
    )


def extract_features(
    media: DataFrame, byte_budget: int = 64 << 20, normalize: bool = True
) -> DataFrame:
    """media table → per-item feature vectors via mapInPandas.

    Sub-batches by cumulative payload bytes so a partition of 4K-video rows
    cannot blow executor memory even if Arrow hands us 2048 rows at once.
    normalize=False → integer histogram counts (oracle-exact output).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-wise zip, not iterrows: iterrows materializes a pandas
            # Series per row (~10-50× slower than tuple iteration); the
            # per-item decode is inherent, the iterator overhead is not
            ids = pdf["media_id"].to_numpy()
            modalities = pdf["modality"].to_numpy()
            payloads = pdf["payload"].to_numpy()
            out_ids: list = []
            out_mods: list = []
            out_nbytes: list[int] = []
            out_feats: list[list[float]] = []
            acc = 0

            def flush() -> pd.DataFrame:
                return pd.DataFrame(
                    {
                        "media_id": out_ids,
                        "modality": out_mods,
                        "n_bytes": np.asarray(out_nbytes, dtype=np.int32),
                        "feature": out_feats,
                    }
                )

            for media_id, modality, payload in zip(ids, modalities, payloads):
                n = len(payload) if payload is not None else 0
                acc += n
                out_ids.append(media_id)
                out_mods.append(modality)
                out_nbytes.append(n)
                out_feats.append(
                    _decode_stub(payload, modality, normalize=normalize).tolist()
                )
                if acc >= byte_budget:
                    yield flush()
                    out_ids, out_mods, out_nbytes, out_feats = [], [], [], []
                    acc = 0
            if out_ids:
                yield flush()

    return media.mapInPandas(
        run, schema=FEATURES_SCHEMA if normalize else HIST_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling PLAN: emits (media_id, frame_idx) rows from the
    declared frame count in meta — the real frame grab happens in
    decode_real. Demonstrates metadata-driven explode without decoding."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.when(
                n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("frame_idx"),
    )
