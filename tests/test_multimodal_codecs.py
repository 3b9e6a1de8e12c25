"""Pure-Python media codec tests (no Spark session needed).

The PNG decoder is validated against an INDEPENDENT scalar encoder
that can emit every spec filter type (0-4), so the numpy unfiltering
(cumsum Sub, vector Up, serial Average/Paeth) is checked byte-for-byte
against the spec arithmetic rather than against its own encoder.
"""

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_pipeline_v1_spark.operators.multimodal import (
    _GIF_INTERLACE,
    _lzw_decode,
    _lzw_encode,
    _parse_av_header,
    _parse_image_header,
    decode_gif_pixels,
    decode_png_pixels,
    decode_wav_samples,
    encode_gif,
    encode_png,
    gradient_pixels,
    make_wav_pcm,
    ramp_samples,
)


def _encode_png_with_filters(arr: np.ndarray, ftypes: list[int]) -> bytes:
    """Independent scalar PNG encoder cycling through the given filter
    types — straight transcription of the spec's per-byte filter
    arithmetic, deliberately sharing no code with the module."""
    h, w, c = arr.shape
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int64)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        row = flat[y]
        filt = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = row[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (row[x] - pred) % 256
        out.append(f)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = row
    idat = zlib.compress(bytes(out), 6)

    def chunk(t, d):
        return len(d).to_bytes(4, "big") + t + d + zlib.crc32(t + d).to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, {1: 0, 2: 4, 3: 2, 4: 6}[c], 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(1, 1, 1), (5, 3, 1), (12, 16, 3), (7, 9, 4), (6, 4, 2)])
def test_png_roundtrip(shape):
    arr = np.random.RandomState(7).randint(0, 256, size=shape, dtype=np.uint8)
    b = encode_png(arr)
    back = decode_png_pixels(b)
    assert back is not None and back.shape == arr.shape and (back == arr).all()
    mime, w, h = _parse_image_header(b)
    assert (mime, w, h) == ("image/png", shape[1], shape[0])


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize(
    "ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4], [4, 3, 2, 1, 0]]
)
def test_png_unfilter_all_types_vs_scalar_reference(channels, ftypes):
    arr = np.random.RandomState(channels).randint(
        0, 256, size=(11, 7, channels), dtype=np.uint8
    )
    back = decode_png_pixels(_encode_png_with_filters(arr, ftypes))
    assert back is not None and (back == arr).all()


def test_png_rejects_unsupported_never_wrong():
    arr = np.random.RandomState(0).randint(0, 256, (4, 4, 3), dtype=np.uint8)
    good = bytearray(encode_png(arr))
    interlaced = bytearray(good)
    interlaced[28] = 1  # IHDR interlace flag
    deep = bytearray(good)
    deep[24] = 16  # IHDR bit depth
    assert decode_png_pixels(bytes(interlaced)) is None
    assert decode_png_pixels(bytes(deep)) is None
    assert decode_png_pixels(b"not a png") is None
    assert decode_png_pixels(None) is None
    assert decode_png_pixels(good[:30]) is None  # truncated


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_hypothesis(w, h, c, seed):
    arr = np.random.RandomState(seed % 2**32).randint(0, 256, (h, w, c), dtype=np.uint8)
    back = decode_png_pixels(encode_png(arr))
    assert back is not None and (back == arr).all()


def test_gradient_formula_matches_pixels():
    px = gradient_pixels(5, 4, seed=9)
    for y in range(4):
        for x in range(5):
            for c in range(3):
                assert px[y, x, c] == (x + 7 * y + 13 * c + 9) % 256


@pytest.mark.parametrize("mcs,n", [(2, 10), (2, 5000), (4, 3000), (8, 100000)])
def test_lzw_roundtrip(mcs, n):
    """Raw GIF-variant LZW across code-width bumps and (at n=100000
    with 8-bit random symbols) the 12-bit table cap + CLEAR reset."""
    data = np.random.RandomState(3).randint(0, 1 << mcs, size=n).astype(np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data, mcs), mcs, n) == data


@pytest.mark.parametrize("h,w,npal", [(1, 1, 2), (7, 5, 4), (20, 30, 256), (13, 17, 100)])
def test_gif_roundtrip(h, w, npal):
    rng = np.random.RandomState(npal)
    pal = rng.randint(0, 256, size=(npal, 3)).astype(np.uint8)
    idx = rng.randint(0, npal, size=(h, w)).astype(np.uint8)
    b = encode_gif(idx, pal)
    assert _parse_image_header(b) == ("image/gif", w, h)
    px = decode_gif_pixels(b)
    assert px is not None and px.shape == (h, w, 3) and (px == pal[idx]).all()


def test_gif_interlaced_decode():
    """The decoder must restore interlaced row order. Encode the rows
    in GIF pass order with the interlace flag patched on, and require
    the ORIGINAL image back."""
    rng = np.random.RandomState(1)
    h, w = 13, 6
    pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, size=(h, w)).astype(np.uint8)
    order = np.concatenate([np.arange(off, h, step) for off, step in _GIF_INTERLACE])
    b = bytearray(encode_gif(idx[order], pal))
    # image descriptor sits right after header(6)+LSD(7)+palette(48):
    # 0x2C left(2) top(2) w(2) h(2) flags(1) -> flags byte at +9
    desc = 6 + 7 + 16 * 3
    assert b[desc] == 0x2C
    b[desc + 9] |= 0x40
    px = decode_gif_pixels(bytes(b))
    assert px is not None and (px == pal[idx]).all()


def test_gif_rejects():
    assert decode_gif_pixels(b"GIF89a\x00") is None
    assert decode_gif_pixels(b"not a gif") is None
    assert decode_gif_pixels(None) is None


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 14),
    h=st.integers(1, 11),
    npal=st.sampled_from([2, 5, 16, 256]),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_hypothesis(w, h, npal, seed):
    rng = np.random.RandomState(seed % 2**32)
    pal = rng.randint(0, 256, size=(npal, 3)).astype(np.uint8)
    idx = rng.randint(0, npal, size=(h, w)).astype(np.uint8)
    px = decode_gif_pixels(encode_gif(idx, pal))
    assert px is not None and (px == pal[idx]).all()


def test_gif_animated_timeline():
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        gif_frame_timeline,
    )

    rng = np.random.RandomState(2)
    pal = rng.randint(0, 256, size=(4, 3)).astype(np.uint8)
    fr = [
        (rng.randint(0, 4, size=(5, 5)).astype(np.uint8), d) for d in (25, 7, 50)
    ]
    b = encode_gif(fr[0][0], pal, frames=fr)
    tl = gif_frame_timeline(b)
    # delays are centiseconds -> ms
    assert tl == [(0, 250), (250, 70), (320, 500)]
    # first frame decodes normally through the GCE blocks
    px = decode_gif_pixels(b)
    assert px is not None and (px == pal[fr[0][0]]).all()
    # single-frame (no GCE) files report one frame at the 100ms default
    assert gif_frame_timeline(encode_gif(fr[0][0], pal)) == [(0, 100)]
    assert gif_frame_timeline(b"junk") is None


def test_wav_pcm_roundtrip():
    s = ramp_samples(473, 11)
    b = make_wav_pcm(s)
    rate, back = decode_wav_samples(b)
    assert rate == 8000 and (back == s).all()
    mime, dur = _parse_av_header(b)
    assert mime == "audio/wav" and dur == 473 * 2 * 1000 // 16000
    # negative samples encode as little-endian two's complement
    assert back.min() < 0
    # rejections
    assert decode_wav_samples(b"RIFFxxxxWAVE") is None
    assert decode_wav_samples(b"junk") is None
    assert decode_wav_samples(None) is None


@settings(max_examples=40, deadline=None)
@given(n=st.integers(0, 600), seed=st.integers(0, 2**31 - 1))
def test_wav_roundtrip_hypothesis(n, seed):
    s = ramp_samples(n, seed)
    dec = decode_wav_samples(make_wav_pcm(s))
    assert dec is not None
    rate, back = dec
    assert rate == 8000 and len(back) == n and (back == s).all()


# -- JPEG (T.81 baseline) ------------------------------------------------------

from entity_resolution_pipeline_v1_spark.operators.multimodal import (  # noqa: E402
    _DCT_A,
    _JPEG_QTABLE,
    _ZIGZAG,
    decode_jpeg_pixels,
    encode_jpeg,
)


def test_jpeg_dct_matrix_is_orthonormal():
    assert np.allclose(_DCT_A @ _DCT_A.T, np.eye(8), atol=1e-12)


def test_jpeg_zigzag_is_the_spec_order():
    # first 10 and last 4 indices of T.81 Figure 5 (public constants)
    assert list(_ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(_ZIGZAG[-4:]) == [47, 55, 62, 63]
    assert sorted(_ZIGZAG) == list(range(64))


@pytest.mark.parametrize("v", [0, 2, 64, 128, 200, 254])
@pytest.mark.parametrize("sub", ["444", "420"])
def test_jpeg_solid_even_gray_roundtrips_exactly(v, sub):
    """Even solid gray is the lossless subdomain: only the Y DC
    coefficient is nonzero and (v-128)/2 is an integer, so quantization
    rounds nothing — decode must return v at every pixel."""
    px = np.full((13, 21, 3), v, dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(px, subsampling=sub))
    assert out is not None and out.shape == (13, 21, 3)
    assert (out == v).all()


def test_jpeg_solid_odd_gray_matches_independent_quantization_math():
    """Odd v: the DC quantizes with a real rounding step. The expected
    value is computed INDEPENDENTLY from the closed form
    round(round((v-128)/2) * 2 + 128) — np.round (half-to-even) on
    both sides of the codec."""
    for v in (63, 129, 201):
        px = np.full((8, 8, 3), v, dtype=np.uint8)
        out = decode_jpeg_pixels(encode_jpeg(px))
        q00 = int(_JPEG_QTABLE[0, 0])  # 16
        expected = int(
            np.clip(np.round(np.round(8 * (v - 128.0) / q00) * q00 / 8.0 + 128.0), 0, 255)
        )
        assert (out == expected).all(), (v, expected, np.unique(out))


def _smooth(h, w, c):
    """Low-frequency ramp (no mod-256 wrap discontinuities — those are
    legitimately hard content for a DCT codec, not a codec bug)."""
    y = np.linspace(0, 180, h)[:, None]
    x = np.linspace(0, 50, w)[None, :]
    base = y + x  # max 230; +10*i stays under 256 for c<=3: no wraps
    return np.stack([base + 10 * i for i in range(c)], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("shape", [(8, 8, 1), (16, 24, 3), (23, 37, 3), (9, 9, 1)])
def test_jpeg_smooth_gradient_psnr(shape):
    h, w, c = shape
    px = _smooth(h, w, c)
    out = decode_jpeg_pixels(encode_jpeg(px))
    assert out.shape == px.shape
    mse = ((out.astype(float) - px.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 30


def test_jpeg_420_is_a_real_subsampled_encoding():
    px = gradient_pixels(32, 32, seed=5)
    e444, e420 = encode_jpeg(px), encode_jpeg(px, subsampling="420")
    i = e420.find(b"\xff\xc0")
    assert e420[i + 4 + 7] == 0x22  # Y sampling factor 2x2 in SOF
    assert len(e420) < len(e444)
    out = decode_jpeg_pixels(e420)
    assert out.shape == px.shape
    mse = ((out.astype(float) - px.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 24


def test_jpeg_header_parse_agrees_with_decode():
    enc = encode_jpeg(gradient_pixels(37, 23, seed=1))
    assert _parse_image_header(enc) == ("image/jpeg", 37, 23)


def test_jpeg_rejects_unsupported_never_wrong():
    enc = bytearray(encode_jpeg(gradient_pixels(16, 16, seed=2)))
    i = enc.find(b"\xff\xc0")
    prog = bytes(enc[:i+1]) + b"\xc2" + bytes(enc[i+2:])  # SOF2 progressive
    assert decode_jpeg_pixels(prog) is None
    assert decode_jpeg_pixels(None) is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_pixels(b"GIF89a") is None
    truncated = bytes(enc[: len(enc) // 2])
    assert decode_jpeg_pixels(truncated) is None or isinstance(
        decode_jpeg_pixels(truncated), np.ndarray
    )


@settings(max_examples=12, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    off=st.integers(0, 25),
    sub=st.sampled_from(["444", "420"]),
)
def test_jpeg_roundtrip_hypothesis(w, h, off, sub):
    """Smooth content at arbitrary shapes (incl. 1-pixel edges and the
    MCU padding paths) must decode at the right shape with low error.
    gradient_pixels' mod-256 sawtooth is deliberately NOT used here:
    a 255->0 wrap box-averaged by 4:2:0 chroma subsampling is
    destructive for ANY conformant codec."""
    px = np.clip(_smooth(h, w, 3).astype(int) + off, 0, 255).astype(np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(px, subsampling=sub))
    assert out is not None and out.shape == px.shape
    mse = ((out.astype(float) - px.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 24


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_jpeg_restart_intervals_roundtrip(ri):
    """DRI/RSTn: the encoder emits real byte-aligned restart markers
    with DC-predictor resets; decode must be identical to the
    no-restart stream's decode (restarts change framing, not values)."""
    px = _smooth(24, 40, 3)
    plain = decode_jpeg_pixels(encode_jpeg(px))
    enc = encode_jpeg(px, restart_interval=ri)
    assert b"\xff\xdd" in enc  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + k]) in enc for k in range(8))  # real RSTn
    out = decode_jpeg_pixels(enc)
    assert out is not None and (out == plain).all()


# ---- MP4 sample tables (stts/stsz/stsc/stco frame indexing) -------------


def _expected_frame_rows(seed: int):
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        mp4_frame_schedule,
    )

    rows, t, off = [], 0, 24
    for i, (d, sz) in enumerate(mp4_frame_schedule(seed)):
        rows.append((i, t, d, off, sz))
        t += d
        off += sz
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 7, 10, 14, 35, 499])
def test_mp4_sample_table_roundtrip(seed):
    # seeds cover: uniform stsz (seed % 5 == 0), co64 offsets
    # (seed % 7 == 0), per-sample stsz + stco otherwise, and every
    # frame count 3..6. The parse must reproduce the closed-form
    # schedule EXACTLY, including the 600-units -> ms conversion.
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        make_mp4_frames,
        mp4_sample_table,
    )

    assert mp4_sample_table(make_mp4_frames(seed)) == _expected_frame_rows(seed)


def test_mp4_sample_table_frame_bytes_are_addressable():
    # the byte ranges must index the ACTUAL mdat payload: slicing the
    # container at (byte_off, byte_len) yields the deterministic frame
    # content make_mp4_frames wrote
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        make_mp4_frames,
        mp4_sample_table,
    )

    seed = 11
    b = make_mp4_frames(seed)
    for i, _t, _d, off, ln in mp4_sample_table(b):
        assert b[off : off + ln] == bytes((seed + i + k) % 256 for k in range(ln))


def test_mp4_sample_table_rejects_garbage_and_truncation():
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        make_mp4_frames,
        mp4_sample_table,
    )

    assert mp4_sample_table(None) is None
    assert mp4_sample_table(b"") is None
    assert mp4_sample_table(b"RIFF\x00\x00\x00\x00WAVE") is None
    full = make_mp4_frames(8)
    for cut in (4, 12, 40, len(full) // 2):
        assert mp4_sample_table(full[:cut]) is None


def test_mp4_av_header_still_parses_sample_table_files():
    # mvhd (timescale 1000) coexists with the mdhd-600 track: the
    # duration header parse and the sample-table parse agree on total
    # duration
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        make_mp4_frames,
        mp4_sample_table,
    )

    for seed in (0, 3, 9):
        b = make_mp4_frames(seed)
        mime, dur = _parse_av_header(b)
        st = mp4_sample_table(b)
        assert mime == "video/mp4"
        assert dur == st[-1][1] + st[-1][2]


def test_mp4_sample_table_malformed_tables_yield_none_not_crash():
    # box-valid but structurally inconsistent tables (the kind a real
    # corpus contains) must yield None, never an exception or an OOM
    # allocation: stsc runs skipping chunk 1, and entry counts that
    # point far past the table body / payload size
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        make_mp4_frames,
        mp4_sample_table,
    )

    b = bytearray(make_mp4_frames(1))
    i = bytes(b).find(b"stsc")
    b[i + 8 : i + 12] = (1).to_bytes(4, "big")  # entry_count = 1
    b[i + 12 : i + 16] = (2).to_bytes(4, "big")  # first_chunk = 2
    assert mp4_sample_table(bytes(b)) is None

    b = bytearray(make_mp4_frames(2))
    i = bytes(b).find(b"stts")
    b[i + 8 : i + 12] = (0x0FFFFFFF).to_bytes(4, "big")
    assert mp4_sample_table(bytes(b)) is None

    b = bytearray(make_mp4_frames(3))
    i = bytes(b).find(b"stsz")
    b[i + 8 : i + 12] = (0).to_bytes(4, "big")
    b[i + 12 : i + 16] = (0x7FFFFFFF).to_bytes(4, "big")
    assert mp4_sample_table(bytes(b)) is None

    b = bytearray(make_mp4_frames(4))
    i = bytes(b).find(b"stco")
    b[i + 8 : i + 12] = (0x00FFFFFF).to_bytes(4, "big")
    assert mp4_sample_table(bytes(b)) is None

    # stsc guard bypass (advisor finding): samples_per_chunk == 0 makes
    # the byte-budget check (spc * reps > n) vacuous, so a crafted
    # next-entry first_chunk near 2^32 drove a ~4-billion-entry list
    # allocation (MemoryError escaping the None contract). The run
    # length must be bounded by the declared chunk count instead.
    b = bytearray(make_mp4_frames(6))  # seed 6: 2 chunks, 2-entry stsc
    i = bytes(b).find(b"stsc")
    b[i + 16 : i + 20] = (0).to_bytes(4, "big")  # entry 0 spc = 0
    b[i + 24 : i + 28] = (0xFFFFFFF0).to_bytes(4, "big")  # entry 1 first_chunk
    assert mp4_sample_table(bytes(b)) is None


def test_jpeg_malformed_component_refs_yield_none_not_crash():
    # an SOS naming a component id SOF0 never declared (KeyError in
    # the scan setup) and a declared sampling factor of 0
    # (ZeroDivisionError in the MCU geometry) must both hit the
    # decode guard, not escape it
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    enc = bytes(encode_jpeg(gradient_pixels(16, 16, 3)))
    i = enc.find(b"\xff\xda")  # SOS: marker(2) len(2) ncomp(1) (cid, tsel)...
    bad_cid = bytearray(enc)
    bad_cid[i + 5] = 9
    assert decode_jpeg_pixels(bytes(bad_cid)) is None

    j = enc.find(b"\xff\xc0")  # SOF0: ... ncomp(1) then (cid, hv, tq)
    zero_hv = bytearray(enc)
    zero_hv[j + 11] = 0
    assert decode_jpeg_pixels(bytes(zero_hv)) is None
