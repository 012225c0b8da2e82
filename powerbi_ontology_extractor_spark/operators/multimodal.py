"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed through mapInPandas.

The decode step is STUBBED (no image/audio libs in this container):
``decode_media`` raises NotImplementedError unless ``fake=True``, in
which case a deterministic hash-based feature vector stands in for the
real decoder.  The Spark-side plumbing — schema, Arrow batch shape,
partitioning, UDF signatures — is real and tested; swapping the stub
for PIL/torchaudio is a one-function change.

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


def decode_media(payload: bytes, media_type: str, dim: int, fake: bool) -> np.ndarray:
    """Decode one media payload to a feature vector.

    Real decoders (PIL / torchaudio / pyav) are not available in this
    environment — the deterministic fake derives ``dim`` floats from the
    payload's sha256 stream so the pipeline is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this container; pass fake=True for the deterministic stub"
        )
    h = hashlib.sha256(payload or b"")
    raw = b""
    block = h.digest()
    while len(raw) < dim * 4:
        block = hashlib.sha256(block).digest()
        raw += block
    arr = np.frombuffer(raw[: dim * 4], dtype=np.uint32).astype(np.float32)
    return arr / np.float32(2**32)


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
