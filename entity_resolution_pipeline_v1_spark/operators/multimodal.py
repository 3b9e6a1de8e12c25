"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata
structs. The Spark side — schema, partitioning, Arrow batch shape,
UDF signatures — is real and tested; the actual codec work is STUBBED
(this container ships no image/audio libraries): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder produces stable pseudo-features so downstream plumbing is
testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap native metadata: byte length + md5 content id."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "content_id", F.md5(F.col(payload_col).cast("string"))
    )


def _fake_feature(payload: bytes | None, dim: int) -> list[float] | None:
    """Deterministic stand-in for a real decode+embed: md5-seeded
    pseudo-features. NOT a real decoder — see module docstring."""
    if payload is None:
        return None
    h = hashlib.md5(payload).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
    v = rng.randn(dim)
    return (v / np.linalg.norm(v)).astype(np.float32).tolist()


def extract_features(
    media: DataFrame,
    dim: int = 32,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. The real
    decode path is a stub (no codecs in this image)."""
    if not fake:
        raise NotImplementedError(
            "real image/audio decoding requires codec libraries not present "
            "in this container; pass fake=True for the deterministic test path"
        )
    out_schema = ", ".join(f.name + " " + f.dataType.simpleString() for f in media.schema.fields)
    out_schema += ", features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = pdf[payload_col].map(lambda b: _fake_feature(b, dim))
            yield pdf

    return media.mapInPandas(run, schema=out_schema)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: explodes one row per
    sampled frame with a frame_ts_ms column. Decode is stubbed; the
    fake path derives a deterministic frame count from metadata."""
    if not fake:
        raise NotImplementedError(
            "real video frame extraction requires codecs not present here; "
            "pass fake=True for the deterministic test path"
        )
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return media.select(
        "media_id",
        F.explode(frames).alias("frame_ts_ms"),
        F.md5(F.concat_ws(":", F.col("media_id"), F.col(payload_col).cast("string"))).alias(
            "frame_content_id"
        ),
    )
