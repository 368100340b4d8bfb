"""Real (stdlib) image decode: PNG pixel roundtrip, header parsing for
JPEG/GIF/BMP, and the Spark map-only feature stage on real payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hyped_spark.functions.multimodal import (
    _ahash64,
    _luma,
    decode_png_pixels,
    encode_png,
    parse_image_header,
)


def _rgb(seed: int, h: int = 13, w: int = 11, ch: int = 3) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8).astype(np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip_every_filter(filter_type, ch):
    """encode → decode is the identity for every scanline filter type and
    gray / RGB / RGBA sample layouts."""
    img = _rgb(7 * filter_type + ch, ch=ch)
    blob = encode_png(img, filter_type=filter_type)
    hdr = parse_image_header(blob)
    assert hdr == ("png", 11, 13, ch)
    out = decode_png_pixels(blob)
    assert out.shape == img.shape
    assert (out == img).all(), f"filter {filter_type} ch {ch} corrupted pixels"


def test_png_features_are_real():
    """fake=False computes mean_luma/phash from the ACTUAL pixels."""
    from hyped_spark.functions.multimodal import _real_decode

    dark = np.full((16, 16, 3), 10, dtype=np.uint8)
    bright = dark.copy()
    bright[:, 8:] = 245  # right half bright
    w, h, luma, ph = _real_decode(encode_png(bright))
    assert (w, h) == (16, 16)
    expected_luma = round(float(_luma(bright.astype(np.float64)).mean()), 6)
    assert luma == expected_luma
    # right-half-bright ⇒ ahash bits are exactly the right 4 columns
    expect_bits = np.zeros((8, 8), dtype=bool)
    expect_bits[:, 4:] = True
    v = 0
    for bit in expect_bits.flatten():
        v = (v << 1) | int(bit)
    assert ph == (v - (1 << 64) if v >= (1 << 63) else v)
    # determinism + sensitivity
    assert _real_decode(encode_png(bright))[3] == ph
    assert _real_decode(encode_png(np.flip(bright, axis=1).copy()))[3] != ph


def test_ahash_matches_direct_computation():
    img = _rgb(42, h=37, w=53)
    y = _luma(img.astype(np.float64))
    from hyped_spark.functions.multimodal import _real_decode

    assert _real_decode(encode_png(img))[3] == _ahash64(y)


def _jpeg_bytes(w: int, h: int, progressive: bool = False) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = sof_marker + struct.pack(">HBHHB", 17, 8, h, w, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + app0 + sof


def test_jpeg_gif_bmp_headers():
    assert parse_image_header(_jpeg_bytes(640, 480)) == ("jpeg", 640, 480, 3)
    assert parse_image_header(_jpeg_bytes(31, 17, progressive=True)) == ("jpeg", 31, 17, 3)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert parse_image_header(gif) == ("gif", 320, 200, 3)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 100, -60) + b"\x00" * 8
    assert parse_image_header(bmp) == ("bmp", 100, 60, 3)
    assert parse_image_header(b"not an image at all") is None


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker;
    real-crawl JPEGs use them.  The scan must skip them, not read a fill
    byte as marker 0xFF with a garbage segment length (round-5 advice)."""
    app0 = (b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    sof = (b"\xff" * 4 + b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 480, 640, 3)
           + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01")
    assert parse_image_header(b"\xff\xd8" + b"\xff" * 3 + app0[1:] + sof) \
        == ("jpeg", 640, 480, 3)
    # fill bytes directly before SOF, APP0 unpadded
    assert parse_image_header(b"\xff\xd8" + app0 + sof) == ("jpeg", 640, 480, 3)


def test_jpeg_pixels_need_codec():
    """Header-real formats without a stdlib pixel path fail LOUDLY on the
    feature route (no silently fabricated luma/phash)."""
    from hyped_spark.functions.multimodal import _real_decode

    with pytest.raises(NotImplementedError, match="codec"):
        _real_decode(_jpeg_bytes(640, 480))


def test_png_exotic_variants_refused():
    # palette PNG: patch color_type byte in a valid header
    blob = bytearray(encode_png(_rgb(1, ch=1)))
    blob[25] = 3  # color type → palette
    with pytest.raises(NotImplementedError, match="color_type=3"):
        decode_png_pixels(bytes(blob))


def test_spark_decode_real_png_features(spark):
    """End-to-end mapInPandas with fake=False over real PNG payloads."""
    from hyped_spark.functions.multimodal import decode_image_features, decode_image_meta

    imgs = [(i, encode_png(_rgb(i, h=12 + i, w=9 + i))) for i in range(4)]
    df = spark.createDataFrame(imgs + [(99, None)], "id long, image binary")
    rows = {r.id: r.img for r in
            decode_image_features(df, "image", "img").collect()}
    assert rows[99] is None
    for i in range(4):
        assert (rows[i].width, rows[i].height) == (9 + i, 12 + i)
        y = _luma(_rgb(i, h=12 + i, w=9 + i).astype(np.float64))
        assert rows[i].mean_luma == pytest.approx(round(float(y.mean()), 6), abs=1e-6)
        assert rows[i].phash == _ahash64(y)

    # header-only path covers JPEG too
    mixed = spark.createDataFrame(
        [(1, encode_png(_rgb(5))), (2, _jpeg_bytes(77, 33)), (3, b"junk")],
        "id long, image binary",
    )
    metas = {r.id: r.meta for r in decode_image_meta(mixed, "image").collect()}
    assert (metas[1].width, metas[1].height, metas[1].format) == (11, 13, "png")
    assert (metas[2].width, metas[2].height, metas[2].format) == (77, 33, "jpeg")
    assert metas[3] is None


# ---------------------------------------------------------------------------
# audio (WAV)
# ---------------------------------------------------------------------------


def _square_wav(n=100, ch=1, amp=700, sr=8000):
    from hyped_spark.functions.multimodal import encode_wav

    sign = np.where(np.arange(n) % 2 == 0, 1, -1)[:, None]
    return encode_wav((sign * amp * np.ones((n, ch))).astype(np.int16), sr)


def test_wav_roundtrip_16_and_8_bit():
    from hyped_spark.functions.multimodal import (
        _real_audio_decode, encode_wav, parse_wav_header,
    )

    b = _square_wav(n=161, ch=2, amp=1000, sr=12000)
    assert parse_wav_header(b)[:4] == (1, 2, 12000, 16)
    sr, ch, bits, nf, dur, rms, peak = _real_audio_decode(b)
    assert (sr, ch, bits, nf) == (12000, 2, 16, 161)
    assert rms == 1000.0 and peak == 1000
    assert dur == round(161 * 1000.0 / 12000, 6)

    sign = np.where(np.arange(64) % 2 == 0, 1, -1)
    u8 = (128 + sign * 50).astype(np.uint8)
    sr, ch, bits, nf, dur, rms, peak = _real_audio_decode(encode_wav(u8, 8000))
    assert (sr, ch, bits, nf, rms, peak) == (8000, 1, 8, 64, 50.0, 50)


def test_wav_codec_boundary_raises():
    from hyped_spark.functions.multimodal import _real_audio_decode, encode_wav

    with pytest.raises(NotImplementedError, match="RIFF/WAVE"):
        _real_audio_decode(b"\xffjunkjunkjunkjunk")
    # IEEE-float WAV (format 3) sits past the stdlib boundary
    b = bytearray(_square_wav())
    b[20] = 3  # audio_format field inside fmt chunk
    with pytest.raises(NotImplementedError, match="needs a real codec"):
        _real_audio_decode(bytes(b))


def test_spark_decode_audio_features(spark):
    from hyped_spark.functions.multimodal import decode_audio_features

    rows = [(i, _square_wav(n=90 + i, ch=1 + i % 2, amp=600 + i, sr=8000))
            for i in range(4)]
    df = spark.createDataFrame(rows + [(99, None)], "id long, audio binary")
    got = {r.id: r.a for r in
           decode_audio_features(df, "audio", "a").collect()}
    assert got[99] is None
    for i in range(4):
        a = got[i]
        assert (a.sample_rate, a.channels, a.n_frames) == (8000, 1 + i % 2, 90 + i)
        assert a.rms == float(600 + i) and a.peak == 600 + i

    plan = decode_audio_features(df, "audio", "a") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: blobs never shuffle


# ---------------------------------------------------------------------------
# video (RIFF/AVI container — real stdlib parse + frame extraction)
# ---------------------------------------------------------------------------


def _mpng_avi(n: int = 7, w: int = 8, h: int = 6, fps: int = 12,
              seed: int = 0) -> bytes:
    from hyped_spark.functions.multimodal import encode_avi, encode_png

    frames = [encode_png(np.full((h, w, 1), (seed + 37 * k) % 256,
                                 dtype=np.uint8)) for k in range(n)]
    return encode_avi(frames, w, h, fps=fps)


def test_avi_roundtrip_and_alignment():
    """encode → parse is the identity on frame payloads, including
    odd-length frames (word-aligned chunks) and container metadata."""
    from hyped_spark.functions.multimodal import (decode_png_pixels,
                                                  encode_avi, parse_avi)

    blob = _mpng_avi(n=5, w=10, h=4, fps=25, seed=3)
    w, h, n, usec, codec, frames = parse_avi(blob)
    assert (w, h, n, usec, codec, len(frames)) == (10, 4, 5, 40000, "MPNG", 5)
    for k, f in enumerate(frames):
        px = decode_png_pixels(f)
        assert px.shape == (4, 10, 1) and int(px[0, 0, 0]) == (3 + 37 * k) % 256

    odd = [b"x" * 3, b"y" * 5, b"z" * 4]  # odd lengths exercise pad bytes
    assert parse_avi(encode_avi(odd, 1, 1, fps=1))[5] == odd
    assert parse_avi(b"RIFFxxxxWAVE") is None
    assert parse_avi(b"\x89PNGnot-a-riff") is None


def test_avi_deeply_nested_lists_do_not_crash():
    """Adversarial container: thousands of nested LIST('strl') chunks.
    The old recursive scan raised RecursionError (crashing the executor
    task on untrusted crawled bytes); the iterative scan must terminate
    and treat the payload as unrecognized (None — no avih, no frames)."""
    import struct as _struct

    from hyped_spark.functions.multimodal import parse_avi

    depth = 3000
    inner = b""
    for _ in range(depth):
        inner = b"LIST" + _struct.pack("<I", len(inner) + 4) + b"strl" + inner
    blob = b"RIFF" + _struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    assert parse_avi(blob) is None


def test_avi_truncated_avih_does_not_crash():
    """A chunk can DECLARE clen >= 40 while the blob is truncated —
    struct.unpack on the short slice raised struct.error (task crash on
    one corrupt crawled AVI); short chunks must be unrecognized."""
    import struct as _struct

    from hyped_spark.functions.multimodal import parse_avi

    blob = (b"RIFF" + _struct.pack("<I", 100) + b"AVI "
            + b"avih" + _struct.pack("<I", 40) + b"\x00" * 10)
    assert parse_avi(blob) is None
    # 25 pad bytes: enough for the first unpack, short for width/height
    blob2 = (b"RIFF" + _struct.pack("<I", 100) + b"AVI "
             + b"avih" + _struct.pack("<I", 40) + b"\x00" * 25)
    assert parse_avi(blob2) is None


def test_avi_mjpg_frames_give_real_dimensions():
    """An MJPG-tagged AVI carries JPEG payloads; the frame blobs parse with
    the real JPEG header scan (entropy decode stays behind the codec
    boundary, as for still JPEGs)."""
    from hyped_spark.functions.multimodal import (encode_avi,
                                                  parse_image_header,
                                                  parse_avi)

    # minimal JPEG: SOI + SOF0 (h=2, w=3, 1 comp) + EOI
    jpg = (b"\xff\xd8"
           + b"\xff\xc0" + struct.pack(">H", 11)
           + bytes([8]) + struct.pack(">HH", 2, 3) + bytes([1, 1, 0x11, 0])
           + b"\xff\xd9")
    assert parse_image_header(jpg) == ("jpeg", 3, 2, 1)
    p = parse_avi(encode_avi([jpg, jpg], 3, 2, fps=10, codec=b"MJPG"))
    assert p[4] == "MJPG"
    assert [parse_image_header(f) for f in p[5]] == [("jpeg", 3, 2, 1)] * 2


def test_sample_frame_indices_grid():
    from hyped_spark.functions.multimodal import sample_frame_indices

    assert sample_frame_indices(7, 3) == [0, 2, 4]
    assert sample_frame_indices(10, 4) == [0, 2, 5, 7]
    assert sample_frame_indices(2, 5) == [0, 1]  # k caps at total
    assert sample_frame_indices(1, 1) == [0]


def test_spark_video_meta_and_real_frames(spark):
    """decode_video_meta + sample_video_frames(fake=False) run the REAL
    container parse in the map-only Arrow stage; junk payloads yield a
    NULL meta struct and raise at the frame-extraction codec boundary."""
    from hyped_spark.functions.multimodal import (decode_png_pixels,
                                                  decode_video_meta,
                                                  sample_video_frames)

    rows = [(i, _mpng_avi(n=6 + i, seed=i)) for i in range(3)]
    df = spark.createDataFrame(rows + [(99, None)], "id long, video binary")
    metas = {r.id: r.m for r in decode_video_meta(df, "video", "m").collect()}
    assert metas[99] is None
    for i in range(3):
        assert (metas[i].width, metas[i].height, metas[i].n_frames,
                metas[i].codec) == (8, 6, 6 + i, "MPNG")

    got = {r.id: r.frames for r in
           sample_video_frames(df, "video", n_frames=3).collect()}
    assert got[99] is None
    for i in range(3):
        n = 6 + i
        grays = [int(decode_png_pixels(bytes(f))[0, 0, 0]) for f in got[i]]
        assert grays == [(i + 37 * ((j * n) // 3)) % 256 for j in range(3)]

    plan = sample_video_frames(df, "video") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: blobs never shuffle

    junk = spark.createDataFrame([(1, b"not a riff")], "id long, video binary")
    with pytest.raises(Exception, match="RIFF/AVI"):
        sample_video_frames(junk, "video").collect()
    # fake=True stays the deterministic plumbing twin
    fake = sample_video_frames(junk, "video", n_frames=2, fake=True).collect()
    assert len(fake[0].frames) == 2 and len(fake[0].frames[0]) == 32


def test_resize_images_real_png(spark):
    """resize_images(fake=False) decodes, integer-grid resamples, and
    re-encodes real PNG pixels; non-PNG raises at the codec boundary."""
    from hyped_spark.functions.multimodal import (decode_png_pixels,
                                                  encode_png, resize_images,
                                                  resize_pixels)

    img = _rgb(11, h=10, w=8, ch=3)
    df = spark.createDataFrame([(1, encode_png(img))], "id long, image binary")
    out = resize_images(df, "image", width=4, height=5).collect()[0].resized
    got = decode_png_pixels(bytes(out))
    ri = [(y * 10) // 5 for y in range(5)]
    ci = [(x * 8) // 4 for x in range(4)]
    assert got.shape == (5, 4, 3)
    assert (got == img[ri][:, ci]).all()
    # pure-python grid rule == vectorized helper
    assert (resize_pixels(img, 4, 5) == img[ri][:, ci]).all()

    # upscale repeats source pixels on the same grid rule
    up = resize_pixels(img, 16, 10)
    assert up.shape == (10, 16, 3) and (up[0, 0] == img[0, 0]).all()

    jpeg = b"\xff\xd8\xff\xd9"
    bad = spark.createDataFrame([(1, jpeg)], "id long, image binary")
    with pytest.raises(Exception, match="PNG"):
        resize_images(bad, "image").collect()
