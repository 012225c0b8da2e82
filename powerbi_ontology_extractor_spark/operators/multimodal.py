"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed through mapInPandas.

Decode support (pure numpy — no image/audio libs in this container):
- **PPM (P6) images**: full header+raster parser (comments, arbitrary
  maxval ≤ 65535) → grayscale signal → bucket-mean features.
- **WAV (RIFF/PCM) audio**: chunk walker (fmt/data, 8/16/32-bit PCM,
  any channel count) → mono float signal → bucket-mean features.
- other containers (PNG/JPEG/MP4…) still raise NotImplementedError —
  they need real codec libraries; ``fake=True`` keeps the deterministic
  hash-based stand-in for pipeline tests over arbitrary bytes.

Design for 100 TB of media: binary payloads never shuffle.  All
feature extraction is a narrow mapInPandas over the scan; only the
(small) feature vectors and metadata proceed to joins/aggregations.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),      # opaque bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("source_uri", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload_sha256", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _bucket_features(signal: np.ndarray, dim: int) -> np.ndarray:
    """Mean of ``dim`` equal-width buckets of a 1-D float signal — the
    fixed-size feature vector every decoded modality reduces to."""
    signal = np.asarray(signal, dtype=np.float64).ravel()
    if signal.size == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.linspace(0, signal.size, dim + 1).astype(np.int64)
    counts = np.diff(edges)
    # reduceat misbehaves on repeated indices (empty buckets): guard
    sums = np.add.reduceat(signal, np.minimum(edges[:-1], signal.size - 1))
    out = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
    return out.astype(np.float32)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) image → float array (h, w, 3) in [0,1].

    Pure numpy: header tokenizer handles ``#`` comments and any
    whitespace; maxval ≤ 255 → 1 byte/sample, else 2 bytes big-endian
    (per the netpbm spec)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize header: 3 integers (width, height, maxval) after 'P6',
    # skipping comments; raster starts after exactly ONE whitespace
    # byte following maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    n = width * height * 3
    if maxval < 256:
        raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    else:
        raster = np.frombuffer(payload, dtype=">u2", count=n, offset=pos)
    return raster.reshape(height, width, 3).astype(np.float64) / maxval


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE PCM payload → (mono float samples in [-1,1],
    sample_rate).  Chunk walker: fmt (PCM only) + data; 8-bit unsigned,
    16/32-bit signed little-endian; multi-channel averaged to mono."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise NotImplementedError(f"WAV format {audio_format} (non-PCM)")
    if bits == 8:
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2**31
    else:
        raise NotImplementedError(f"{bits}-bit WAV")
    if n_channels > 1:
        samples = samples[: len(samples) - len(samples) % n_channels]
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return samples, sample_rate


def decode_media(payload: bytes, media_type: str, dim: int, fake: bool) -> np.ndarray:
    """Decode one media payload to a ``dim``-float feature vector.

    Real decoders: PPM (P6) images and RIFF/PCM WAV audio, parsed with
    pure numpy (no codec libs needed).  Other containers (PNG, JPEG,
    MP4, …) require libraries absent from this environment and raise
    NotImplementedError.  ``fake=True`` derives the vector from the
    payload's sha256 stream instead — deterministic stand-in for
    pipeline tests over arbitrary bytes.
    """
    if fake:
        h = hashlib.sha256(payload or b"")
        raw = b""
        block = h.digest()
        while len(raw) < dim * 4:
            block = hashlib.sha256(block).digest()
            raw += block
        arr = np.frombuffer(raw[: dim * 4], dtype=np.uint32).astype(np.float32)
        return arr / np.float32(2**32)
    if payload[:2] == b"P6":
        rgb = decode_ppm(payload)
        return _bucket_features(rgb.mean(axis=2), dim)  # grayscale
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, _ = decode_wav(payload)
        return _bucket_features(samples, dim)
    raise NotImplementedError(
        f"no pure-numpy decoder for this {media_type} container; "
        "PPM (P6) and PCM WAV are supported, or pass fake=True"
    )


def synth_ppm_bytes(width: int = 24, height: int = 16, seed: int = 7) -> bytes:
    """Deterministic P6 fixture: seeded RGB gradient + comment header."""
    rng = np.random.RandomState(seed)
    img = (
        np.fromfunction(
            lambda y, x, c: (x * 7 + y * 5 + c * 41) % 256, (height, width, 3)
        ).astype(np.uint8)
        ^ rng.randint(0, 256, (height, width, 3), dtype=np.uint8)
    )
    header = f"P6\n# synthetic fixture\n{width} {height}\n255\n".encode()
    return header + img.tobytes()


def synth_wav_bytes(
    n_samples: int = 2048, sample_rate: int = 8000, seed: int = 7
) -> bytes:
    """Deterministic 16-bit mono PCM WAV fixture: two sine tones +
    seeded noise."""
    rng = np.random.RandomState(seed)
    t = np.arange(n_samples) / sample_rate
    sig = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.25 * np.sin(2 * np.pi * 1000 * t)
        + 0.05 * rng.standard_normal(n_samples)
    )
    pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little")          # PCM
        + (1).to_bytes(2, "little")        # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")        # block align
        + (16).to_bytes(2, "little")       # bits
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True, batch_hint: int = 64
) -> DataFrame:
    """mapInPandas feature extraction: binary batches in, small feature
    rows out.  Payload bytes are dropped on the way out (never shuffled).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            shas = []
            sizes = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                b = bytes(payload) if payload is not None else b""
                shas.append(hashlib.sha256(b).hexdigest())
                sizes.append(len(b))
                feats.append(
                    [float(x) for x in decode_media(b, mtype, dim, fake)]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_sha256": shas,
                    "n_bytes": sizes,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes metadata through, marks the target
    size; the pixel transform itself is the stubbed decoder step."""
    return media.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp —
    sequence/explode on duration metadata (JVM-side).  The actual frame
    decode is the stubbed step."""
    v = media.where(F.col("media_type") == "video").where(
        F.col("duration_ms").isNotNull()
    )
    return v.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synth_media_df(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(128 + i))
        rows.append(
            (
                i,
                mtype,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[mtype],
                64 if mtype == "image" else None,
                48 if mtype == "image" else None,
                5000 + 100 * i if mtype != "image" else None,
                f"synthetic://media/{i}",
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
