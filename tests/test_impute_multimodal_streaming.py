"""Imputation, multimodal plumbing, and the streaming ingest path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_v1_spark.operators import impute, multimodal
from entity_resolution_pipeline_v1_spark.sources import pages as P
from entity_resolution_pipeline_v1_spark.streaming import ingest


def test_impute_field(spark):
    def unit(*x):
        v = np.array(x, dtype=float)
        return (v / np.linalg.norm(v)).astype(np.float32).tolist()

    wide = spark.createDataFrame(
        [
            ("r1", None, unit(1, 0, 0)),          # target: provision null
            ("r2", "London", unit(0, 1, 0)),
        ],
        "record_id string, provision string, composite_vec array<float>",
    )
    donors = spark.createDataFrame(
        [
            ("h1", "provision", "Paris : X, 1800", unit(0.9, 0.1, 0)),
            ("h2", "provision", "Berlin : Y, 1900", unit(0, 0, 1)),
        ],
        "hash string, field string, value string, vector array<float>",
    )
    out = impute.impute_field(wide, donors, "provision", k=2, min_similarity=0.1).collect()
    assert len(out) == 1
    row = out[0]
    assert row["record_id"] == "r1"
    assert row["imputed_value"] == "Paris : X, 1800"  # nearest neighbor text
    assert row["imputed_vector"] is not None and len(row["imputed_vector"]) == 3


def test_multimodal_fake_features(spark):
    media = spark.createDataFrame(
        [("m1", "image", b"\x89PNG...", ("image/png", 8, 8, None)),
         ("m2", "image", None, ("image/png", 4, 4, None))],
        multimodal.MEDIA_SCHEMA,
    )
    # the real path decodes PNG/WAV natively but must still REFUSE
    # codec-bound / undecodable payloads (raised inside the executor,
    # so Spark surfaces it as a PythonException wrapper)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.extract_features(media, fake=False).collect()
    out = multimodal.extract_features(media, dim=16, fake=True).collect()
    feats = {r["media_id"]: r["features"] for r in out}
    assert len(feats["m1"]) == 16
    assert feats["m2"] is None
    meta = multimodal.attach_media_meta(media).collect()[0]
    assert meta["payload_bytes"] == len(b"\x89PNG...")


def test_multimodal_real_features(spark):
    """extract_features(fake=False) is REAL for PNG pixels and PCM WAV:
    the descriptor values must equal stats computed on the source
    arrays before encoding."""
    import numpy as np

    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        encode_png,
        make_wav_pcm,
        ramp_samples,
    )

    arr = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    samples = ramp_samples(200, seed=5)
    media = spark.createDataFrame(
        [("img", "image", bytearray(encode_png(arr)), None),
         ("aud", "audio", bytearray(make_wav_pcm(samples)), None)],
        multimodal.MEDIA_SCHEMA,
    )
    feats = {
        r["media_id"]: r["features"]
        for r in multimodal.extract_features(media, fake=False).collect()
    }
    img = feats["img"]
    assert img[:4] == [1.0, 6.0, 4.0, 3.0]  # kind, width, height, channels
    assert img[4] == pytest.approx(arr.astype(float).mean() / 255.0)
    assert img[5] == pytest.approx(arr.astype(float).std() / 255.0)
    aud = feats["aud"]
    assert aud[:3] == [2.0, 200.0, 8000.0]  # kind, n_samples, rate
    f = samples.astype(float)
    assert aud[5] == pytest.approx(np.sqrt((f * f).mean()) / 32768.0)


def test_image_header_parse_roundtrip(spark):
    """REAL decode step: mime/width/height parsed out of actual bytes
    for PNG (built), GIF, JPEG (hand-crafted segments), and junk."""
    from entity_resolution_pipeline_v1_spark.operators.multimodal import make_png

    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    )
    jpg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 4
    rows = [
        ("png", make_png(123, 45)),
        ("jpg", jpg),
        ("gif", gif),
        ("junk", b"not an image at all"),
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {
        r["media_id"]: (r["hdr"]["mime"], r["hdr"]["width"], r["hdr"]["height"])
        for r in df.select(
            "media_id", multimodal.image_header_udf("payload").alias("hdr")
        ).collect()
    }
    assert out["png"] == ("image/png", 123, 45)
    assert out["jpg"] == ("image/jpeg", 640, 480)
    assert out["gif"] == ("image/gif", 320, 200)
    assert out["junk"] == (None, None, None)
    assert out["none"] == (None, None, None)


def test_av_header_parse_roundtrip(spark):
    """REAL audio/video metadata decode: duration_ms parsed out of
    actual WAV/RIFF and MP4 mvhd (v0 AND v1) bytes, junk and
    truncation -> NULLs (never a crash)."""
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        make_mp4,
        make_wav,
    )

    rows = [
        ("wav", make_wav(4273)),
        ("mp4v0", make_mp4(86_400_000, version=0)),
        ("mp4v1", make_mp4(7, version=1)),
        ("wav_trunc", make_wav(500)[:14]),
        ("junk", b"garbage bytes here"),
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {
        r["media_id"]: (r["hdr"]["mime"], r["hdr"]["duration_ms"])
        for r in df.select(
            "media_id", multimodal.av_header_udf("payload").alias("hdr")
        ).collect()
    }
    assert out["wav"] == ("audio/wav", 4273)
    assert out["mp4v0"] == ("video/mp4", 86_400_000)
    assert out["mp4v1"] == ("video/mp4", 7)
    assert out["wav_trunc"] == ("audio/wav", None)
    assert out["junk"] == (None, None)
    assert out["none"] == (None, None)


def test_multimodal_real_gif_frame_sampling(spark):
    """sample_frames(fake=False) is REAL for animated GIF: sample
    timestamps map to the frame actually on screen per the GCE delays
    parsed from the bytes; non-GIF payloads yield no rows."""
    import numpy as np

    from entity_resolution_pipeline_v1_spark.operators.multimodal import encode_gif

    rng = np.random.RandomState(4)
    pal = rng.randint(0, 256, size=(4, 3)).astype(np.uint8)
    frames = [
        (rng.randint(0, 4, size=(3, 3)).astype(np.uint8), d) for d in (30, 30, 100)
    ]  # 300ms + 300ms + 1000ms = 1600ms total
    gif = encode_gif(frames[0][0], pal, frames=frames)
    media = spark.createDataFrame(
        [("g1", "video", bytearray(gif), None),
         ("x1", "video", b"not media", None)],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.sample_frames(media, every_ms=250, fake=False).collect()
    assert {r["media_id"] for r in rows} == {"g1"}
    got = [(r["frame_ts_ms"], r["frame_index"]) for r in sorted(rows, key=lambda r: r["frame_ts_ms"])]
    # frame starts: 0, 300, 600; samples every 250ms over [0, 1600)
    assert got == [(0, 0), (250, 0), (500, 1), (750, 2), (1000, 2), (1250, 2), (1500, 2)]


def test_multimodal_frame_sampling(spark):
    media = spark.createDataFrame(
        [("v1", "video", b"fakebytes", ("video/mp4", None, None, 3500))],
        multimodal.MEDIA_SCHEMA,
    )
    frames = multimodal.sample_frames(media, every_ms=1000, fake=True).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_streaming_block_keys(spark, corpus, tmp_path):
    pages_dir = str(tmp_path / "pages_stream")
    P.pages_view(corpus).limit(50).write.mode("overwrite").parquet(pages_dir)
    stream = ingest.read_pages_stream(spark, pages_dir, max_files=2)
    assert stream.isStreaming
    keys = ingest.block_keys_stream(stream)
    ingest.run_to_memory(keys, "blk_out")
    got = spark.sql("select * from blk_out")
    assert got.count() > 0
    assert set(got.columns) == {"record_id", "block_key"}


def test_streaming_block_keys_match_batch(spark, corpus, tmp_path):
    """Incremental ingest must emit EXACTLY the block keys the batch
    path computes on the same pages — the contract that lets a
    downstream batch job re-pair only affected blocks."""
    from entity_resolution_pipeline_v1_spark.operators import blocking, extract, preprocess

    pages_dir = str(tmp_path / "pages_parity")
    pages = P.pages_view(corpus).limit(50)
    pages.write.mode("overwrite").parquet(pages_dir)
    ingest.run_to_memory(
        ingest.block_keys_stream(ingest.read_pages_stream(spark, pages_dir, max_files=2)),
        "blk_parity",
    )
    got = {
        (r["record_id"], r["block_key"])
        for r in spark.sql("select * from blk_parity").collect()
    }
    batch = blocking.build_blocks(
        preprocess.parse_records(
            extract.extract_text(spark.read.parquet(pages_dir), mode="main")
        ),
        use_sorted_neighborhood=False,
    )
    want = {(r["record_id"], r["block_key"]) for r in batch.collect()}
    assert got == want and got


def test_streaming_watermark_closes_windows(spark, tmp_path):
    """Real watermark semantics in append mode: a window is emitted
    only once the event-time watermark (max ts - 10 min) passes its
    end. Micro-batch 1 (ts 10:00) emits nothing; micro-batch 2
    (ts 10:30) advances the watermark to 10:20, closing the 10:00
    window — and ONLY that one."""
    import datetime as dt

    def rows(ts, n, lang):
        t = dt.datetime(2026, 1, 1, *ts)
        return [(f"u{ts}{i}", t, None, "body text", lang) for i in range(n)]

    pages_dir = str(tmp_path / "pages_wm")
    spark.createDataFrame(rows((10, 0), 3, "en"), ingest.PAGES_DDL) \
        .write.mode("overwrite").parquet(pages_dir)
    agg = ingest.page_rate_stats(
        ingest.read_pages_stream(spark, pages_dir), window="1 minute"
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select * from wm_out").count() == 0  # window still open
        spark.createDataFrame(rows((10, 30), 2, "de"), ingest.PAGES_DDL) \
            .write.mode("append").parquet(pages_dir)
        q.processAllAvailable()
        out = spark.sql("select window.start as s, lang, n_pages from wm_out").collect()
    finally:
        q.stop()
    assert [(r["s"].minute, r["lang"], r["n_pages"]) for r in out] == [(0, "en", 3)]


def test_streaming_page_rate(spark, corpus, tmp_path):
    pages_dir = str(tmp_path / "pages_stream2")
    P.pages_view(corpus).limit(100).write.mode("overwrite").parquet(pages_dir)
    stream = ingest.read_pages_stream(spark, pages_dir)
    agg = ingest.page_rate_stats(stream, window="1 minute")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rate_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select sum(n_pages) as n from rate_out").collect()
    assert rows[0]["n"] == 100
