"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Decode has two tiers. UNCOMPRESSED containers decode natively here — RIFF
WAV-PCM (decode_wav) and binary netpbm P5/P6 (decode_netpbm) are pure
byte-layout formats needing no codec library; both are round-trip-tested
against their writers and oracle-verified end-to-end (multimodal_decode).
COMPRESSED codecs (JPEG/MP3/H.264) still raise NotImplementedError inside
decode_real — the container has no PIL/librosa/av; wiring them in changes
only that dispatcher. The byte-histogram stub (`_decode_stub`) remains for
the codec-free feature-plumbing queries.

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


# ---------------------------------------------------------------------------
# real decoders: pure-stdlib/numpy parsers for UNCOMPRESSED containers.
# WAV (RIFF PCM) and PPM/PGM (binary netpbm) need no codec library — they are
# byte-layout formats, parsed here from their public specs (RIFF/WAVE:
# Microsoft multimedia file format; netpbm: P5/P6 man pages). Compressed
# codecs (JPEG/MP3/H.264) still raise NotImplementedError below.
# ---------------------------------------------------------------------------


class MediaDecodeError(ValueError):
    """Malformed media payload."""


_WAV_PCM_DTYPES = {8: np.dtype("u1"), 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE PCM parser → {'samples': int32 [n_frames, n_channels],
    'sample_rate': int, 'n_channels': int}. Walks chunks (fmt /data may be
    preceded by LIST etc.), supports PCM (format 1) at 8/16/32 bits;
    8-bit WAV is unsigned and is re-centered to signed like every decoder.
    Bounds-checked: declared sizes never read past the buffer."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise MediaDecodeError(f"chunk {cid!r} declares {size} bytes past EOF")
        if cid == b"fmt ":
            if size < 16:
                raise MediaDecodeError("fmt chunk too short")
            fmt = {
                "audio_format": int.from_bytes(body[0:2], "little"),
                "n_channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaDecodeError("missing fmt /data chunk")
    if fmt["audio_format"] != 1:
        raise NotImplementedError(
            f"WAV audio_format {fmt['audio_format']} is compressed/non-PCM; "
            "only PCM (1) is decoded without codec libraries"
        )
    dtype = _WAV_PCM_DTYPES.get(fmt["bits"])
    if dtype is None or fmt["n_channels"] < 1:
        raise MediaDecodeError(f"unsupported PCM layout {fmt}")
    n = len(data) // dtype.itemsize
    samples = np.frombuffer(data, dtype=dtype, count=n).astype(np.int32)
    if fmt["bits"] == 8:
        samples = samples - 128
    frames = n // fmt["n_channels"]
    samples = samples[: frames * fmt["n_channels"]].reshape(
        frames, fmt["n_channels"]
    )
    return {
        "samples": samples,
        "sample_rate": fmt["sample_rate"],
        "n_channels": fmt["n_channels"],
        "bits": fmt["bits"],
    }


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono 16-bit PCM WAV writer (fixtures + the synthetic media tables):
    the exact inverse of decode_wav for this layout."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + int(sample_rate).to_bytes(4, "little")
        + int(sample_rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_netpbm(payload: bytes) -> dict:
    """Binary netpbm parser (P5 grayscale / P6 RGB, maxval ≤ 255) →
    {'pixels': uint8 [h, w] or [h, w, 3], 'width', 'height'}. Header is
    ASCII tokens with '#' comments; raster follows the single whitespace
    after maxval."""
    if len(payload) < 2 or payload[0:1] != b"P" or payload[1:2] not in b"56":
        raise MediaDecodeError("not a binary netpbm (P5/P6) payload")
    depth = 1 if payload[1:2] == b"5" else 3
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise MediaDecodeError("truncated netpbm header")
        c = payload[pos : pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            j = pos
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tok = payload[pos:j]
            if not tok.isdigit():
                raise MediaDecodeError(f"bad netpbm header token {tok!r}")
            tokens.append(int(tok))
            pos = j
    w, h, maxval = tokens
    if maxval > 255 or w <= 0 or h <= 0:
        raise MediaDecodeError(f"unsupported netpbm geometry {w}x{h} max {maxval}")
    pos += 1  # exactly one whitespace byte before the raster
    need = w * h * depth
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise MediaDecodeError(f"netpbm raster short: {len(raster)} < {need}")
    px = np.frombuffer(raster, dtype=np.uint8, count=need)
    return {
        "pixels": px.reshape((h, w) if depth == 1 else (h, w, 3)),
        "width": w,
        "height": h,
    }


def encode_ppm(pixels: np.ndarray) -> bytes:
    """P6 writer ([h, w, 3] uint8) — inverse of decode_netpbm for RGB."""
    p = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = p.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + p.tobytes()


def decode_real(payload: bytes, modality: str) -> dict:
    """Real decode, dispatched on magic bytes: RIFF/WAVE PCM and binary
    netpbm (P5/P6) are fully decoded in-process; compressed codecs still
    raise until PIL/librosa/av are wired in."""
    if payload is None or len(payload) < 2:
        raise MediaDecodeError("empty payload")
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[0:1] == b"P" and payload[1:2] in b"56":
        return decode_netpbm(payload)
    raise NotImplementedError(
        "compressed image/audio codecs are not installed in this "
        "environment; add a magic-byte dispatch branch above wiring "
        "PIL/librosa/av (uncompressed WAV-PCM and netpbm decode natively)"
    )


def _budget_subbatches(
    pdf: pd.DataFrame, byte_budget: int, row_fn, finalize
) -> "Iterator[pd.DataFrame]":
    """OUTPUT-side flush cadence, shared by extract_features and
    extract_decoded_histograms: accumulated result rows are flushed every
    `byte_budget` of INPUT payload consumed, so a worker never holds the
    whole batch's outputs plus Python-side decode temporaries at once.

    This does NOT bound the input batch — `pdf` is fully materialized by
    Arrow before this runs. The input-side bound is
    `spark.sql.execution.arrow.maxBytesPerBatch` (64 MB, pinned in
    session.get_spark): Spark closes each Arrow batch at that many bytes
    regardless of the row cap, which is what actually keeps a partition of
    32 MB video payloads from arriving as one multi-GB pandas frame.

    Iterates the batch column-wise (iterrows materializes a pandas Series
    per row, ~10-50× slower than tuple iteration; the per-item decode is
    inherent, the iterator overhead is not). row_fn(media_id, modality,
    payload) returns a dict of output values, or None to skip the row.
    `finalize` stamps schema-exact dtypes on EVERY flush — not just the
    tail — so a mid-loop flush emits the same Arrow dtype as the declared
    schema instead of leaning on a silent narrowing cast."""
    ids = pdf["media_id"].to_numpy()
    mods = pdf["modality"].to_numpy()
    payloads = pdf["payload"].to_numpy()
    out: list[dict] = []
    acc = 0
    for mid, mod, payload in zip(ids, mods, payloads):
        vals = row_fn(mid, mod, payload)
        if vals is not None:
            out.append(vals)
        acc += len(payload) if payload is not None else 0
        if acc >= byte_budget:
            if out:
                yield finalize(pd.DataFrame(out))
            out, acc = [], 0
    if out:
        yield finalize(pd.DataFrame(out))


def extract_features(
    media: DataFrame, byte_budget: int = 64 << 20, normalize: bool = True
) -> DataFrame:
    """media table → per-item feature vectors via mapInPandas.

    Byte-budget sub-batching via _budget_subbatches.
    normalize=False → integer histogram counts (oracle-exact output).
    """

    def row_fn(media_id, modality, payload) -> dict:
        return {
            "media_id": media_id,
            "modality": modality,
            "n_bytes": len(payload) if payload is not None else 0,
            "feature": _decode_stub(payload, modality, normalize=normalize).tolist(),
        }

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["n_bytes"] = df["n_bytes"].astype(np.int32)
        return df

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield from _budget_subbatches(pdf, byte_budget, row_fn, finalize)

    return media.mapInPandas(
        run, schema=FEATURES_SCHEMA if normalize else HIST_SCHEMA
    )


DECODED_HIST_SCHEMA = (
    "media_id string, modality string, n_values int, feature array<int>"
)


def extract_decoded_histograms(
    media: DataFrame, byte_budget: int = 64 << 20, on_error: str = "raise"
) -> DataFrame:
    """REAL-decode feature extraction: parse each payload with decode_real
    (WAV-PCM samples / netpbm pixels) and emit an exact 16-bin integer
    histogram of the decoded values — PCM samples normalized to the int16
    domain (8-bit << 8, 32-bit >> 16) then binned by (s + 32768) >> 12,
    uint8 pixels by b >> 4, so every supported bit depth lands in exactly
    16 bins. Integer output ⇒ the DuckDB oracle can verify the decode
    end-to-end with zero float tolerance. Same byte-budget sub-batching as
    extract_features.

    on_error: "raise" (default) fails the job on the first undecodable row
    — right for the contract fixtures, where any decode error is a bug.
    "skip" drops rows whose payload is NULL or not a decodable WAV/netpbm
    container (MediaDecodeError / NotImplementedError) and keeps going —
    the 100 TB setting, where corrupt/foreign payloads are certain and one
    bad row must not kill a thousand-executor stage; pair it with an
    anti-join against the output to quarantine the skipped rows."""

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def _hist(payload) -> tuple[int, list[int]]:
        d = decode_real(payload, "")
        if "samples" in d:
            s = d["samples"].ravel().astype(np.int64)
            bits = d.get("bits", 16)
            if bits == 8:        # recentered [-128,127] → int16 domain
                s = s << 8
            elif bits == 32:     # int32 domain → int16 domain
                s = s >> 16
            vals = (s + 32768) >> 12
        else:
            vals = d["pixels"].ravel().astype(np.int64) >> 4
        return len(vals), np.bincount(vals, minlength=16).astype(np.int32).tolist()

    def row_fn(mid, mod, payload) -> dict | None:
        if on_error == "skip":
            try:
                n, hist = _hist(payload)
            except (MediaDecodeError, NotImplementedError):
                return None
        else:
            n, hist = _hist(payload)
        return {"media_id": mid, "modality": mod, "n_values": n, "feature": hist}

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["n_values"] = df["n_values"].astype(np.int32)
        return df

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield from _budget_subbatches(pdf, byte_budget, row_fn, finalize)

    return media.mapInPandas(run, schema=DECODED_HIST_SCHEMA)


def synthesize_codec_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-container media table from the documents table:
    odd doc_ids become mono 16-bit PCM WAVs whose samples follow
    s[i] = ((doc_id*7919 + i*104729) mod 65536) − 32768 with
    n = (n_chars mod 200) + 50 samples; even doc_ids become P6 PPMs with
    w = (n_chars mod 16) + 4, h = 8 and bytes p[j] = (doc_id*31 + j*17)
    mod 256. The formulas are SQL-expressible, so the DuckDB oracle
    recomputes the decoded histograms independently — verifying the WAV/PPM
    writers AND parsers against a derivation that never touches them."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict = {"media_id": [], "modality": [], "payload": []}
            for doc_id, n_chars in zip(
                pdf["doc_id"].to_numpy(), pdf["n_chars"].to_numpy()
            ):
                d = int(doc_id)
                if d % 2 == 1:
                    n = (int(n_chars) % 200) + 50
                    i = np.arange(n, dtype=np.int64)
                    s = ((d * 7919 + i * 104729) % 65536) - 32768
                    payload = encode_wav_pcm16(s.astype(np.int16))
                    mod = "audio"
                else:
                    w = (int(n_chars) % 16) + 4
                    h = 8
                    j = np.arange(w * h * 3, dtype=np.int64)
                    px = ((d * 31 + j * 17) % 256).astype(np.uint8)
                    payload = encode_ppm(px.reshape(h, w, 3))
                    mod = "image"
                out["media_id"].append(str(d))
                out["modality"].append(mod)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    # NULL n_chars (fetch-failure doc) coalesces to 0 BEFORE the kernel: a
    # NULL reaches pandas as NaN and int(NaN) kills the whole job; the
    # DuckDB oracle applies the same COALESCE so the formulas stay aligned
    return docs.select(
        "doc_id", F.coalesce(F.col("n_chars"), F.lit(0)).alias("n_chars")
    ).mapInPandas(
        run, schema="media_id string, modality string, payload binary"
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling PLAN: emits (media_id, frame_idx) rows from the
    declared frame count in meta — the real frame grab happens in
    decode_real. Demonstrates metadata-driven explode without decoding."""
    n_frames = F.coalesce(
        # try_cast, not cast: a non-numeric producer value ('unknown') must
        # route to the declared-absent branch, not abort the job under
        # Spark's default ANSI mode
        F.element_at(F.col("meta"), "n_frames").try_cast("int"), F.lit(0)
    )
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.when(
                n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("frame_idx"),
    )
