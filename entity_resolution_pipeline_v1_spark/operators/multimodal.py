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
from pyspark.sql import types as T

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap native metadata: byte length + md5 content id."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "content_id", F.md5(F.col(payload_col).cast("string"))
    )


def _parse_image_header(b: bytes | None) -> tuple[str | None, int | None, int | None]:
    """(mime, width, height) from raw image bytes — pure byte parsing
    of the container headers, no codec library needed. Supports PNG
    (IHDR), GIF87a/89a (logical screen descriptor), and JPEG (walks
    the segment list to the first SOFn frame header). Unknown or
    truncated payloads -> (None, None, None)."""
    if not b or len(b) < 10:
        return (None, None, None)
    # PNG: 8-byte signature, then IHDR chunk: len(4) 'IHDR' W(4 BE) H(4 BE)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) >= 24 and b[12:16] == b"IHDR":
            return (
                "image/png",
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
            )
        return ("image/png", None, None)
    # GIF: 6-byte version, then W(2 LE) H(2 LE)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "image/gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    # JPEG: SOI then segments [FF marker len(2 BE) payload]; SOFn
    # (C0-CF minus C4/C8/CC) payload = precision(1) H(2 BE) W(2 BE)
    if b[:2] == b"\xff\xd8":
        i, n = 2, len(b)
        while i + 4 <= n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= n:
                    return (
                        "image/jpeg",
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                    )
                break
            i += 2 + seg_len
        return ("image/jpeg", None, None)
    return (None, None, None)


IMAGE_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


@F.pandas_udf(IMAGE_HEADER_SCHEMA)
def image_header_udf(payload: pd.Series) -> pd.DataFrame:
    """REAL multimodal decode step (not stubbed): container-header
    parse of binary image payloads -> (mime, width, height). Pixel
    decode stays stubbed (extract_features) — this container has no
    codec libraries — but dimensions/mime come from the actual bytes."""
    rows = [_parse_image_header(b) for b in payload]
    return pd.DataFrame(rows, columns=["mime", "width", "height"])


def make_png(width: int, height: int) -> bytes:
    """Minimal structurally-valid PNG header bytes (signature + IHDR)
    for the given dimensions — deterministic payload generator for
    tests and oracle-checked queries."""
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # bit depth 8, truecolor
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"  # CRC placeholder (header parse ignores it)
    )


@F.pandas_udf(T.BinaryType())
def make_png_udf(width: pd.Series, height: pd.Series) -> pd.Series:
    """Deterministic PNG payload per row (see make_png)."""
    return pd.Series(
        [make_png(int(w), int(h)) for w, h in zip(width, height)], dtype=object
    )


def _parse_av_header(b: bytes | None) -> tuple[str | None, int | None]:
    """(mime, duration_ms) from raw audio/video container bytes — pure
    byte parsing, no codec library. Supports WAV/RIFF (fmt byte-rate +
    data chunk size) and MP4 (top-level box walk to moov/mvhd,
    version 0 and 1 layouts). Unknown/truncated -> (None, None)."""
    if not b or len(b) < 12:
        return (None, None)
    # WAV: 'RIFF' size(4 LE) 'WAVE', then chunks [id(4) size(4 LE) data]
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i, n = 12, len(b)
        byte_rate: int | None = None
        data_size: int | None = None
        while i + 8 <= n:
            cid = b[i : i + 4]
            csize = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 16 + 8 <= n:
                # fmt: format(2) channels(2) sample_rate(4) byte_rate(4) ...
                byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
            elif cid == b"data":
                data_size = csize
            # chunks are word-aligned: odd sizes carry a pad byte
            i += 8 + csize + (csize & 1)
        if byte_rate and data_size is not None:
            return ("audio/wav", data_size * 1000 // byte_rate)
        return ("audio/wav", None)
    # MP4: top-level boxes [size(4 BE) type(4)]; ftyp first, then moov
    # whose mvhd child carries timescale + duration
    if b[4:8] == b"ftyp":
        i, n = 0, len(b)
        while i + 8 <= n:
            size = int.from_bytes(b[i : i + 4], "big")
            btype = b[i + 4 : i + 8]
            if size < 8:
                break
            if btype == b"moov":
                j, end = i + 8, min(i + size, n)
                while j + 8 <= end:
                    csize = int.from_bytes(b[j : j + 4], "big")
                    if csize < 8:
                        break
                    if b[j + 4 : j + 8] == b"mvhd" and j + 12 <= end:
                        v = b[j + 8]
                        if v == 1 and j + 40 <= end:
                            # v1: ver/flags(4) ctime(8) mtime(8)
                            # timescale(4) duration(8)
                            ts = int.from_bytes(b[j + 28 : j + 32], "big")
                            dur = int.from_bytes(b[j + 32 : j + 40], "big")
                        elif v == 0 and j + 28 <= end:
                            # v0: ver/flags(4) ctime(4) mtime(4)
                            # timescale(4) duration(4)
                            ts = int.from_bytes(b[j + 20 : j + 24], "big")
                            dur = int.from_bytes(b[j + 24 : j + 28], "big")
                        else:
                            return ("video/mp4", None)
                        if ts:
                            return ("video/mp4", dur * 1000 // ts)
                        return ("video/mp4", None)
                    j += csize
            i += size
        return ("video/mp4", None)
    return (None, None)


AV_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


@F.pandas_udf(AV_HEADER_SCHEMA)
def av_header_udf(payload: pd.Series) -> pd.DataFrame:
    """REAL audio/video metadata decode (not stubbed): container-header
    parse of WAV/MP4 payloads -> (mime, duration_ms). Sample/frame
    decode stays stubbed (no codecs in this container); the duration
    comes from the actual bytes."""
    rows = [_parse_av_header(b) for b in payload]
    return pd.DataFrame(rows, columns=["mime", "duration_ms"])


def make_wav(duration_ms: int, sample_rate: int = 8000) -> bytes:
    """Minimal structurally-valid WAV bytes (RIFF + fmt + empty-ish
    data chunk sized to the requested duration; 16-bit mono PCM).
    Deterministic payload generator for tests and oracle queries —
    _parse_av_header recovers duration_ms exactly."""
    byte_rate = sample_rate * 2  # mono, 16-bit
    data_size = duration_ms * byte_rate // 1000
    fmt = (
        (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits/sample
    )
    # data chunk declares its size; payload bytes themselves are
    # elided (header parse never reads samples)
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + data_size.to_bytes(4, "little")
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def make_mp4(duration_ms: int, version: int = 0) -> bytes:
    """Minimal structurally-valid MP4 bytes (ftyp + moov/mvhd with
    timescale 1000 so duration == duration_ms; mvhd version 0 or 1).
    Deterministic payload generator — _parse_av_header recovers
    duration_ms exactly."""
    if version == 1:
        mvhd_body = (
            bytes([1, 0, 0, 0])
            + (0).to_bytes(8, "big")  # ctime
            + (0).to_bytes(8, "big")  # mtime
            + (1000).to_bytes(4, "big")  # timescale
            + duration_ms.to_bytes(8, "big")
        )
    else:
        mvhd_body = (
            bytes([0, 0, 0, 0])
            + (0).to_bytes(4, "big")
            + (0).to_bytes(4, "big")
            + (1000).to_bytes(4, "big")
            + duration_ms.to_bytes(4, "big")
        )
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    ftyp = (16).to_bytes(4, "big") + b"ftyp" + b"isom" + (0).to_bytes(4, "big")
    return ftyp + moov


@F.pandas_udf(T.BinaryType())
def make_av_udf(kind: pd.Series, duration_ms: pd.Series) -> pd.Series:
    """Deterministic WAV ('audio') / MP4 ('video') payload per row."""
    return pd.Series(
        [
            make_wav(int(d)) if k == "audio" else make_mp4(int(d), version=int(d) % 2)
            for k, d in zip(kind, duration_ms)
        ],
        dtype=object,
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
