"""Multimodal plumbing unit checks (oracle parity covers the values)."""

from __future__ import annotations

import hashlib

import pytest

from optimal_parallel_fp_growth_spark.operators.multimodal import (
    attach_media,
    attach_payload,
    build_payload,
    decode_media,
    decode_real,
    extract_features,
    media_meta_for,
    sample_frames,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

# Real-world 1x1 files (public domain minimal fixtures), NOT built by
# build_payload — parsing these checks decode_real against actual
# encoder output, not just our own writer.
_PNG_1x1 = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
    "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)
_GIF_1x1 = "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"


def test_decode_real_parses_real_encoder_output():
    import base64

    png = decode_real(base64.b64decode(_PNG_1x1))
    assert (png["format"], png["width"], png["height"]) == ("png", 1, 1)
    gif = decode_real(base64.b64decode(_GIF_1x1))
    assert (gif["format"], gif["width"], gif["height"]) == ("gif", 1, 1)


@pytest.mark.parametrize(
    "fmt,kw",
    [
        ("png", {"width": 640, "height": 480}),
        ("gif", {"width": 320, "height": 200}),
        ("bmp", {"width": 1024, "height": 768}),
        ("jpeg", {"width": 1920, "height": 1080}),
        ("wav", {"sample_rate": 44100, "channels": 2}),
    ],
)
def test_build_decode_round_trip(fmt, kw):
    payload = build_payload(fmt, filler=b"body-bytes" * 37, **kw)
    got = decode_real(payload)
    assert got["format"] == fmt
    for k, v in kw.items():
        assert got[k] == v, (fmt, k, got)


def test_decode_real_unsupported_still_raises():
    # the codec seam contract: anything beyond the five native header
    # parsers raises NotImplementedError (incl. truncated magics)
    for junk in (b"\x89PNG", b"\x00\x01\x02\x03garbage", b"RIFF1234AVI "):
        with pytest.raises(NotImplementedError):
            decode_real(junk)


def test_attach_decode_media_matches_recipe(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    got = decode_media(attach_media(docs)).collect()
    assert len(got) == docs.count() > 0
    for r in got:
        want = media_meta_for(r.doc_id)
        assert (
            r.format, r.width, r.height, r.sample_rate, r.channels
        ) == (
            want["format"], want["width"], want["height"],
            want["sample_rate"], want["channels"],
        ), r.doc_id


def test_payload_schema_and_meta(spark, sf_small):
    df = attach_payload(load_table(spark, sf_small, "documents"))
    assert dict(df.dtypes)["payload"] == "binary"
    row = df.select("doc_id", "meta.*").first()
    assert row.modality in ("image", "audio", "video")
    assert row.n_bytes > 0 and len(row.content_md5) == 32


def test_frame_fanout_bounds(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    frames = sample_frames(attach_payload(docs))
    n_docs = docs.count()
    n_frames = frames.count()
    assert n_docs <= n_frames <= 4 * n_docs
    assert frames.select("doc_id").distinct().count() == n_docs


def test_decode_pixels_netpbm_real(spark):
    """REAL pixel decode: hand-built P6/P5 payloads with known means,
    comment-tolerant headers, and honest failures elsewhere."""
    import pytest as _pytest

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        decode_pixels,
        extract_pixel_stats,
    )

    p6 = b"P6\n# a comment\n2 2\n255\n" + bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    )
    d = decode_pixels(p6)
    assert (d["format"], d["width"], d["height"]) == ("ppm", 2, 2)
    assert (d["mean_r"], d["mean_g"], d["mean_b"]) == (127.5, 127.5, 127.5)

    p5 = b"P5 3 1 255\n" + bytes([0, 128, 255])
    d5 = decode_pixels(p5)
    assert d5["format"] == "pgm" and d5["mean_r"] == d5["mean_b"]

    with _pytest.raises(NotImplementedError):
        decode_pixels(b"\x89PNG\r\n\x1a\nrest")  # png = header-only tier
    with _pytest.raises(NotImplementedError):
        decode_pixels(b"P6 2 2 255\n" + bytes(3))  # truncated pixels

    # distributed: the mapInPandas op reproduces the local decode
    rows = [
        (1, bytearray(p6)),
        (2, bytearray(b"P6 1 1 255\n" + bytes([10, 20, 30]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_pixel_stats(df).collect()}
    assert got[1].mean_r == 127.5
    assert (got[2].mean_r, got[2].mean_g, got[2].mean_b) == (10.0, 20.0, 30.0)
    assert got[2].format == "ppm" and got[2].width == 1


# ---------------------------------------------------------------------
# round 6: full PNG pixel decode (stdlib zlib + scanline unfiltering)
# ---------------------------------------------------------------------


def test_png_golden_hand_assembled():
    """Decode a PNG assembled BY HAND from the spec (no build twin):
    2x2 RGB, filter type 0, known bytes — pins signature/chunk/inflate
    framing independently of build_png_pixels."""
    import struct
    import zlib

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        decode_png_pixels,
    )

    # pixels: (10,20,30) (40,50,60) / (70,80,90) (100,110,120)
    raw = bytes([0, 10, 20, 30, 40, 50, 60, 0, 70, 80, 90, 100, 110, 120])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    d = decode_png_pixels(png)
    assert (d["width"], d["height"]) == (2, 2)
    assert d["mean_r"] == (10 + 40 + 70 + 100) / 4
    assert d["mean_g"] == (20 + 50 + 80 + 110) / 4
    assert d["mean_b"] == (30 + 60 + 90 + 120) / 4


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_round_trip_all_color_types_and_filters(color_type, channels):
    """build (filters cycling 0-4 across rows) → decode → means equal
    numpy's, for every supported color type. 7 rows so every filter
    type appears at least once."""
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_png_pixels,
        decode_png_pixels,
    )

    rng = np.random.default_rng(42 + color_type)
    w, h = 11, 7
    px = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    png = build_png_pixels(w, h, px.tobytes(), color_type=color_type)
    d = decode_png_pixels(png)
    assert (d["format"], d["width"], d["height"]) == ("png", w, h)
    if channels >= 3:
        want = [px[:, :, c].mean() for c in range(3)]
    else:
        want = [px[:, :, 0].mean()] * 3
    for got, exp in zip((d["mean_r"], d["mean_g"], d["mean_b"]), want):
        assert abs(got - exp) < 1e-9


def test_png_palette_round_trip():
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_png_pixels,
        decode_png_pixels,
    )

    palette = bytes(range(256 * 3 % 768)) + bytes(768 - (256 * 3 % 768))
    palette = bytes((i * 7) % 256 for i in range(768))
    rng = np.random.default_rng(7)
    w, h = 6, 6
    idx = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    png = build_png_pixels(w, h, idx.tobytes(), color_type=3, palette=palette)
    d = decode_png_pixels(png)
    for c, key in enumerate(("mean_r", "mean_g", "mean_b")):
        want = np.array(
            [[palette[3 * v + c] for v in row] for row in idx]
        ).mean()
        assert abs(d[key] - want) < 1e-9


def test_png_property_random_pixels_exact_means():
    from hypothesis import given, settings, strategies as st

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_png_pixels,
        decode_png_pixels,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 9),
        data=st.data(),
    )
    def run(w, h, data):
        px = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
                )
            )
        )
        d = decode_png_pixels(build_png_pixels(w, h, px, color_type=2))
        n = w * h
        assert abs(d["mean_r"] - sum(px[0::3]) / n) < 1e-9
        assert abs(d["mean_g"] - sum(px[1::3]) / n) < 1e-9
        assert abs(d["mean_b"] - sum(px[2::3]) / n) < 1e-9

    run()


def test_png_unsupported_seams_raise():
    import struct
    import zlib

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_png_pixels,
        decode_png_pixels,
    )

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # every legal depth now decodes; an ILLEGAL depth/color combo
    # (4-bit RGB, spec 11.2.2) and a nonsense depth still reject
    png4 = sig + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0)
    )
    with pytest.raises(NotImplementedError, match="gray/palette"):
        decode_png_pixels(png4)
    png3 = sig + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 1, 1, 3, 0, 0, 0, 0)
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png_pixels(png3)
    # invalid interlace method (Adam7 itself is supported since r6)
    png_i = sig + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 9)
    )
    with pytest.raises(NotImplementedError, match="interlace method"):
        decode_png_pixels(png_i)
    # truncated pixel stream
    good = build_png_pixels(3, 3, bytes(27), color_type=2)
    # corrupt: drop the IEND and shrink IDAT by rebuilding with short raw
    short = sig + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
    ) + chunk(b"IDAT", zlib.compress(bytes(5))) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="length mismatch"):
        decode_png_pixels(short)
    assert decode_png_pixels(good)["mean_r"] == 0.0


def test_decode_pixels_dispatches_png():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_png_pixels,
        decode_pixels,
    )

    png = build_png_pixels(2, 2, bytes([100] * 12), color_type=2)
    d = decode_pixels(png)
    assert d["format"] == "png" and d["mean_r"] == 100.0
    # JPEG magic now dispatches to the real decoder (round 6), which
    # rejects a corrupt marker stream; formats with no decoder at all
    # still name the seam
    with pytest.raises(NotImplementedError, match="marker"):
        decode_pixels(b"\xff\xd8jpegdata")
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        decode_pixels(b"II*\x00tiffdata")


def test_attach_pixel_media_closed_form(spark, sf_small):
    """The registry entry's recipe: decoded means equal
    base_c + (h-1)/2 for both the PNG and netpbm halves."""
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        attach_pixel_media,
        extract_pixel_stats,
        pixel_meta_for,
    )

    docs = load_table(spark, sf_small, "documents").limit(40)
    out = extract_pixel_stats(attach_pixel_media(docs)).collect()
    assert len(out) == 40
    saw = set()
    for r in out:
        m = pixel_meta_for(r.doc_id)
        saw.add(m["format"])
        assert r.format == m["format"]
        assert (r.width, r.height) == (m["width"], m["height"])
        half = (m["height"] - 1) / 2.0
        assert abs(r.mean_r - (m["base"][0] + half)) < 1e-9
        assert abs(r.mean_g - (m["base"][1] + half)) < 1e-9
        assert abs(r.mean_b - (m["base"][2] + half)) < 1e-9
    assert saw == {"png", "ppm", "gif"}  # all three decoders exercised


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_16bit_round_trip(color_type, channels):
    """16-bit PNG: big-endian byte-pair samples, filters operate on
    bytes with bpp = channels*2; decoded means are over the 0-65535
    range and must equal numpy's."""
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_png_pixels,
        decode_png_pixels,
    )

    rng = np.random.default_rng(1000 + color_type)
    w, h = 9, 7
    px = rng.integers(0, 65536, size=(h, w, channels), dtype=np.uint16)
    png = build_png_pixels(
        w, h, px.astype(">u2").tobytes(), color_type=color_type, depth=16
    )
    d = decode_png_pixels(png)
    assert (d["format"], d["width"], d["height"]) == ("png", w, h)
    if channels >= 3:
        want = [px[:, :, c].mean() for c in range(3)]
    else:
        want = [px[:, :, 0].mean()] * 3
    for got, exp in zip((d["mean_r"], d["mean_g"], d["mean_b"]), want):
        assert abs(got - exp) < 1e-6


def test_png_16bit_palette_rejected():
    import struct
    import zlib as _zlib

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        decode_png_pixels,
    )

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", _zlib.crc32(t + b) & 0xFFFFFFFF
        )

    png = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
    )
    with pytest.raises(NotImplementedError, match="not valid per spec"):
        decode_png_pixels(png)


def test_gif_lzw_round_trip_random_images():
    """build (real LZW: dict growth, width escalation, CLEAR on
    overflow) → decode → channel means equal numpy's color-table
    lookup, across palette sizes."""
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_gif_pixels,
        decode_gif_pixels,
    )

    rng = np.random.default_rng(5)
    for n_colors in (4, 16, 256):
        palette = bytes(rng.integers(0, 256, size=n_colors * 3, dtype=np.uint8))
        w, h = 23, 17
        idx = rng.integers(0, n_colors, size=w * h, dtype=np.int64).tolist()
        gif = build_gif_pixels(w, h, idx, palette)
        d = decode_gif_pixels(gif)
        assert (d["format"], d["width"], d["height"]) == ("gif", w, h)
        for c, key in enumerate(("mean_r", "mean_g", "mean_b")):
            want = sum(palette[3 * i + c] for i in idx) / len(idx)
            assert abs(d[key] - want) < 1e-9, (n_colors, key)


def test_gif_lzw_overflow_clear_round_trip():
    """An image big enough to overflow the 12-bit LZW table forces the
    encoder's CLEAR path; the decode must resynchronize."""
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_gif_pixels,
        decode_gif_pixels,
    )

    rng = np.random.default_rng(9)
    palette = bytes(rng.integers(0, 256, size=8 * 3, dtype=np.uint8))
    w, h = 120, 90  # 10800 px: random 8-color noise overflows 4096 codes
    idx = rng.integers(0, 8, size=w * h, dtype=np.int64).tolist()
    d = decode_gif_pixels(build_gif_pixels(w, h, idx, palette))
    for c, key in enumerate(("mean_r", "mean_g", "mean_b")):
        want = sum(palette[3 * i + c] for i in idx) / len(idx)
        assert abs(d[key] - want) < 1e-9


def test_gif_decode_skips_extensions_and_uses_local_table():
    """GIF89a with a graphic-control extension before the image and a
    LOCAL color table overriding the global one."""
    import struct
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        _lzw_encode,
        decode_gif_pixels,
    )

    rng = np.random.default_rng(11)
    lct = bytes(rng.integers(0, 256, size=4 * 3, dtype=np.uint8))
    idx = [0, 1, 2, 3, 3, 2, 1, 0, 1]
    lzw = _lzw_encode(idx, 2)
    gif = (
        b"GIF89a" + struct.pack("<HH", 3, 3)
        + bytes([0x00, 0, 0])  # no global color table
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE extension
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 3, 3)
        + bytes([0x81])  # local color table flag, size field 1 (4 colors)
        + lct
        + bytes([2, len(lzw)]) + lzw + b"\x00"
        + b"\x3b"
    )
    d = decode_gif_pixels(gif)
    for c, key in enumerate(("mean_r", "mean_g", "mean_b")):
        want = sum(lct[3 * i + c] for i in idx) / len(idx)
        assert abs(d[key] - want) < 1e-9


def test_gif_seams_raise():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        decode_gif_pixels,
        decode_pixels,
    )

    with pytest.raises(NotImplementedError, match="not a GIF"):
        decode_gif_pixels(b"JUNK")
    # GIF with no image block
    with pytest.raises(NotImplementedError, match="without an image"):
        decode_gif_pixels(b"GIF89a" + bytes(7) + b"\x3b")
    # dispatch: decode_pixels routes GIF
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_gif_pixels,
    )

    gif = build_gif_pixels(2, 2, [0, 1, 1, 0], bytes([0, 0, 0, 255, 255, 255]))
    assert decode_pixels(gif)["format"] == "gif"
    assert abs(decode_pixels(gif)["mean_r"] - 127.5) < 1e-9


def test_png_adam7_interlaced_round_trip():
    """Adam7: the builder writes a genuine seven-pass layout (each
    pass filtered independently); the decoder unfilters per pass and
    the means equal the non-interlaced image's — including edge sizes
    where some passes are empty (w or h < pass origin)."""
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_png_pixels,
        decode_png_pixels,
    )

    rng = np.random.default_rng(77)
    for w, h in [(1, 1), (2, 3), (7, 5), (16, 16), (13, 21)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        gold = decode_png_pixels(
            build_png_pixels(w, h, px.tobytes(), color_type=2)
        )
        inter = decode_png_pixels(
            build_png_pixels(w, h, px.tobytes(), color_type=2, interlace=True)
        )
        for k in ("width", "height", "mean_r", "mean_g", "mean_b"):
            assert abs(gold[k] - inter[k]) < 1e-9, (w, h, k)


def test_png_adam7_16bit_gray_alpha():
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_png_pixels,
        decode_png_pixels,
    )

    rng = np.random.default_rng(78)
    w, h = 10, 9
    px = rng.integers(0, 65536, size=(h, w, 2), dtype=np.uint16)
    d = decode_png_pixels(
        build_png_pixels(
            w, h, px.astype(">u2").tobytes(), color_type=4, depth=16,
            interlace=True,
        )
    )
    assert abs(d["mean_r"] - px[:, :, 0].mean()) < 1e-6
    assert d["mean_r"] == d["mean_g"] == d["mean_b"]


# ---------------------------------------------------------------------
# round 6: real WAV sample decode (PCM 8/16/24/32 + float32)
# ---------------------------------------------------------------------


def test_wav_property_random_samples_exact_stats():
    import math

    from hypothesis import given, settings, strategies as st

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_wav_samples,
        decode_wav_samples,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        bits=st.sampled_from([8, 16, 24, 32]),
        channels=st.integers(1, 3),
        frames=st.integers(1, 40),
        data=st.data(),
    )
    def run(bits, channels, frames, data):
        lo, hi = (-128, 127) if bits == 8 else (-(2 ** (bits - 1)), 2 ** (bits - 1) - 1)
        n = frames * channels
        s = data.draw(st.lists(st.integers(lo, hi), min_size=n, max_size=n))
        d = decode_wav_samples(
            build_wav_samples(s, 44100, channels=channels, bits=bits)
        )
        assert d["bits"] == bits and d["channels"] == channels
        assert d["n_frames"] == frames
        assert d["mean"] == sum(s) / n
        assert math.isclose(
            d["rms"], math.sqrt(sum(v * v for v in s) / n), rel_tol=1e-12
        )
        assert d["peak"] == max(abs(v) for v in s)
        assert d["duration_sec"] == frames / 44100

    run()


def test_wav_float32_round_trip():
    import math

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_wav_samples,
        decode_wav_samples,
    )

    # small integers and dyadic fractions are exact in float32
    s = [0.5, -1.25, 3.0, -0.75, 2.5, 1.0]
    d = decode_wav_samples(
        build_wav_samples(s, 16000, channels=2, bits=32, float32=True)
    )
    assert d["codec"] == "f32" and d["bits"] == 32
    assert d["n_frames"] == 3 and d["channels"] == 2
    assert d["mean"] == sum(s) / len(s)
    assert math.isclose(
        d["rms"], math.sqrt(sum(v * v for v in s) / len(s)), rel_tol=1e-12
    )
    assert d["peak"] == 3.0


def test_wav_24bit_sign_extension_and_odd_pad():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_wav_samples,
        decode_wav_samples,
    )

    # negative 24-bit values must sign-extend; 3 samples * 3 bytes = 9
    # (odd) exercises the RIFF pad byte being OUTSIDE the chunk length
    s = [-(2 ** 23), 2 ** 23 - 1, -1]
    d = decode_wav_samples(build_wav_samples(s, 8000, channels=1, bits=24))
    assert d["n_frames"] == 3
    assert d["peak"] == 2 ** 23
    assert d["mean"] == sum(s) / 3


def test_wav_8bit_offset_binary():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_wav_samples,
        decode_wav_samples,
    )

    # stored bytes are value+128; silence (0) must decode to 0, not 128
    d = decode_wav_samples(build_wav_samples([0, 0, 0, 0], 8000, bits=8))
    assert d["mean"] == 0.0 and d["rms"] == 0.0 and d["peak"] == 0.0


def test_wav_seams_raise():
    import struct

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_payload,
        build_wav_samples,
        decode_wav_samples,
    )

    with pytest.raises(NotImplementedError, match="RIFF"):
        decode_wav_samples(b"not audio at all")
    # compressed fmt tag (2 = ADPCM) stays a documented seam
    good = build_wav_samples([1, 2, 3, 4], 8000, bits=16)
    adpcm = bytearray(good)
    adpcm[20:22] = struct.pack("<H", 2)
    with pytest.raises(NotImplementedError, match="fmt tag"):
        decode_wav_samples(bytes(adpcm))
    # build_payload's header-only WAV carries an EMPTY data chunk:
    # zero samples decode to zero stats, not garbage and not a raise
    empty = decode_wav_samples(
        build_payload("wav", sample_rate=8000, channels=1)
    )
    assert empty["n_frames"] == 0 and empty["rms"] == 0.0
    # a payload truly missing its data chunk raises
    with pytest.raises(NotImplementedError, match="fmt/data"):
        decode_wav_samples(good[:36])
    # torn payload (data chunk shorter than its declared length) raises
    with pytest.raises(NotImplementedError):
        decode_wav_samples(good[:-1])


def test_attach_audio_media_closed_form(spark, sf_small):
    """The registry entry's recipe end-to-end on Spark: decoded stats
    equal the closed forms for all five codecs."""
    import math

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        attach_audio_media,
        audio_meta_for,
        extract_audio_stats,
    )

    docs = load_table(spark, sf_small, "documents").limit(40)
    out = extract_audio_stats(attach_audio_media(docs)).collect()
    assert len(out) == 40
    saw = set()
    for r in out:
        a = audio_meta_for(r.doc_id)
        saw.add(a["codec"])
        m, base, amp = a["m"], a["base"], a["amp"]
        assert r.codec == a["codec"]
        assert (r.sample_rate, r.channels) == (a["sample_rate"], a["channels"])
        assert r.n_frames == a["n_frames"]
        assert r.mean == base + amp * (m - 1) / 2
        assert math.isclose(
            r.rms,
            math.sqrt(
                base * base
                + base * amp * (m - 1)
                + amp * amp * (m - 1) * (2 * m - 1) / 6
            ),
            rel_tol=1e-12,
        )
        assert r.peak == max(abs(base), abs(base + amp * (m - 1)))
    assert saw == {"pcm8", "pcm16", "pcm24", "pcm32", "f32"}


# ---------------------------------------------------------------------
# round 6: real baseline JPEG codec pair
# ---------------------------------------------------------------------


def test_jpeg_flat_blocks_round_trip_exactly():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    w, h = 32, 16
    bw = w // 8
    vals = [30 + 9 * k for k in range((w // 8) * (h // 8))]
    px = bytes(
        vals[(y // 8) * bw + (x // 8)] for y in range(h) for x in range(w)
    )
    d = decode_jpeg_pixels(build_jpeg_pixels(w, h, px, channels=1))
    assert (d["width"], d["height"]) == (w, h)
    want = sum(vals) / len(vals)
    assert d["mean_r"] == want == d["mean_g"] == d["mean_b"]


def test_jpeg_property_random_gray_close_means():
    from hypothesis import given, settings, strategies as st

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 20),
        data=st.data(),
    )
    def run(w, h, data):
        px = bytes(
            data.draw(
                st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)
            )
        )
        # near-lossless quantization: the full entropy-coding pipeline
        # (including edge-padded partial blocks) must reproduce the
        # mean to within IDCT rounding
        d = decode_jpeg_pixels(
            build_jpeg_pixels(w, h, px, channels=1, dc_quant=1, ac_quant=1)
        )
        assert (d["width"], d["height"]) == (w, h)
        assert abs(d["mean_r"] - sum(px) / (w * h)) <= 1.0

    run()


def test_jpeg_color_flat_image_within_conversion_rounding():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    w, h = 16, 8
    px = bytes(c for _ in range(w * h) for c in (200, 30, 90))
    d = decode_jpeg_pixels(build_jpeg_pixels(w, h, px, channels=3))
    # RGB->YCbCr->RGB costs at most +-2 per channel on a flat image
    assert abs(d["mean_r"] - 200) <= 2
    assert abs(d["mean_g"] - 30) <= 2
    assert abs(d["mean_b"] - 90) <= 2


def test_jpeg_seams_raise():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    good = build_jpeg_pixels(8, 8, bytes(64), channels=1)
    with pytest.raises(NotImplementedError, match="SOI"):
        decode_jpeg_pixels(b"not a jpeg")
    # a baseline file relabeled SOF2 is a LEGAL single-scan
    # progressive file (full spectral window) — it must now DECODE
    # identically, not raise
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg_pixels(prog)["mean_r"] == 0.0
    # SOF3 now dispatches to the real lossless decoder (round 7); a
    # relabeled DCT file is not a valid lossless stream — its baseline
    # SOS declares predictor 0 — and must fail closed there
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(NotImplementedError, match="predictor"):
        decode_jpeg_pixels(lossless)
    # hierarchical SOF types stay a documented seam
    hier = good.replace(b"\xff\xc0", b"\xff\xc5", 1)
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg_pixels(hier)
    # out-of-range sampling factors reject cleanly
    sub = bytearray(build_jpeg_pixels(8, 8, bytes(192), channels=3))
    i = sub.index(b"\xff\xc0")
    sub[i + 11] = 0x55  # first component h=v=5 (spec max is 4)
    with pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg_pixels(bytes(sub))
    # truncated scan data
    with pytest.raises((NotImplementedError, IndexError)):
        decode_jpeg_pixels(good[: len(good) // 2])


def test_decode_pixels_dispatches_jpeg():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_pixels,
    )

    d = decode_pixels(build_jpeg_pixels(8, 8, bytes([77]) * 64, channels=1))
    assert d["format"] == "jpeg" and d["mean_r"] == 77.0


def test_attach_jpeg_media_closed_form(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        attach_jpeg_media,
        extract_pixel_stats,
        jpeg_meta_for,
    )

    docs = load_table(spark, sf_small, "documents").limit(30)
    out = extract_pixel_stats(attach_jpeg_media(docs)).collect()
    assert len(out) == 30
    for r in out:
        m = jpeg_meta_for(r.doc_id)
        if r.doc_id % 8 == 4:  # hierarchical class: flat at base
            assert r.format == "jpeg-hierarchical"
            assert r.width == 16 * (1 + (r.doc_id // 8) % 3)
            assert r.height == 16 * (1 + (r.doc_id // 8) % 2)
            assert r.mean_r == m["base"] == r.mean_g == r.mean_b
            continue
        assert (r.width, r.height) == (m["width"], m["height"])
        want = m["base"] + m["step"] * (m["n_blocks"] - 1) / 2
        assert r.mean_r == want == r.mean_g == r.mean_b


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_jpeg_subsampled_flat_color_round_trip(sub):
    """4:2:2/4:2:0: chroma planes are mean-downsampled at encode and
    block-replicated at decode — on a flat image both are identity, so
    every subsampling mode lands within YCbCr conversion rounding."""
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    w, h = 20, 12  # deliberately NOT MCU-aligned (16x16 MCUs at 420)
    px = bytes(c for _ in range(w * h) for c in (180, 60, 120))
    d = decode_jpeg_pixels(
        build_jpeg_pixels(w, h, px, channels=3, subsampling=sub)
    )
    assert (d["width"], d["height"]) == (w, h)
    assert abs(d["mean_r"] - 180) <= 2
    assert abs(d["mean_g"] - 60) <= 2
    assert abs(d["mean_b"] - 120) <= 2


def test_jpeg_420_random_image_tracks_means():
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    random.seed(11)
    w, h = 24, 17
    px = bytes(random.randrange(256) for _ in range(w * h * 3))
    true = [sum(px[c::3]) / (w * h) for c in range(3)]
    d = decode_jpeg_pixels(
        build_jpeg_pixels(
            w, h, px, channels=3, dc_quant=1, ac_quant=1, subsampling="420"
        )
    )
    # chroma is genuinely lossy at 420 on noise — means still track
    for got, t in zip((d["mean_r"], d["mean_g"], d["mean_b"]), true):
        assert abs(got - t) <= 6.0


def test_jpeg_422_vs_444_gray_identical():
    """Grayscale ignores subsampling (single component is always 1x1),
    and a 4:2:2 color file of a grayscale-valued image must agree with
    the 4:4:4 encode to within rounding."""
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    random.seed(5)
    w, h = 16, 16
    gray = [random.randrange(256) for _ in range(w * h)]
    px = bytes(v for v in gray for _ in range(3))
    d444 = decode_jpeg_pixels(
        build_jpeg_pixels(w, h, px, channels=3, dc_quant=1, ac_quant=1)
    )
    d422 = decode_jpeg_pixels(
        build_jpeg_pixels(
            w, h, px, channels=3, dc_quant=1, ac_quant=1, subsampling="422"
        )
    )
    for c in ("mean_r", "mean_g", "mean_b"):
        assert abs(d444[c] - d422[c]) <= 1.5


def test_g711_codec_pair_identity_and_anchors():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        alaw_to_linear,
        linear_to_alaw,
        linear_to_ulaw,
        ulaw_to_linear,
    )

    # ITU anchor values
    assert ulaw_to_linear(0xFF) == 0
    assert ulaw_to_linear(0x00) == -32124  # most negative level
    assert alaw_to_linear(0xD5) == 8 and alaw_to_linear(0x55) == -8
    # every code is a fixed point of encode(decode(.)) — except mu-law
    # negative zero 0x7F, which canonically re-encodes to 0xFF
    for c in range(256):
        if c != 0x7F:
            assert linear_to_ulaw(ulaw_to_linear(c)) == c, c
        assert linear_to_alaw(alaw_to_linear(c)) == c, c
    assert linear_to_ulaw(ulaw_to_linear(0x7F)) == 0xFF


def test_g711_matches_stdlib_audioop_if_present():
    """Differential vs CPython's audioop (removed in 3.13): decode
    must match byte-for-byte and encode over the full 16-bit range."""
    import struct
    import warnings

    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import audioop
    except ImportError:
        pytest.skip("audioop not in this Python")
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        alaw_to_linear,
        linear_to_alaw,
        linear_to_ulaw,
        ulaw_to_linear,
    )

    for c in range(256):
        assert struct.unpack("<h", audioop.ulaw2lin(bytes([c]), 2))[0] \
            == ulaw_to_linear(c)
        assert struct.unpack("<h", audioop.alaw2lin(bytes([c]), 2))[0] \
            == alaw_to_linear(c)
    for v in range(-32768, 32768, 7):  # ~9400 probes incl. negatives
        assert audioop.lin2ulaw(struct.pack("<h", v), 2)[0] == linear_to_ulaw(v)
        assert audioop.lin2alaw(struct.pack("<h", v), 2)[0] == linear_to_alaw(v)


def test_g711_wav_round_trip_exact_on_table_levels():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        alaw_to_linear,
        build_wav_samples,
        decode_wav_samples,
        ulaw_to_linear,
    )

    for codec, table in (
        ("ulaw", [ulaw_to_linear(c) for c in range(256)]),
        ("alaw", [alaw_to_linear(c) for c in range(256)]),
    ):
        # samples ON the companding grid survive encode->decode exactly
        s = [table[(i * 37) % 256] for i in range(120)]
        d = decode_wav_samples(
            build_wav_samples(s, 8000, channels=2, bits=8, codec=codec)
        )
        assert d["codec"] == codec and d["bits"] == 8
        assert d["n_frames"] == 60
        assert d["mean"] == sum(s) / len(s)
        assert d["peak"] == max(abs(v) for v in s)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_sub_byte_round_trips(depth):
    """1/2/4-bit gray and palette PNGs (round 6): MSB-first packing
    with pad bits, exact 255/(2^d-1) gray scaling, both interlace
    modes, widths that do NOT fill the last byte."""
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_png_pixels,
        decode_png_pixels,
    )

    random.seed(40 + depth)
    mask = (1 << depth) - 1
    scale = 255 // mask
    w, h = 11, 6  # 11 samples/row never fills the final byte cleanly
    px = bytes(random.randrange(mask + 1) for _ in range(w * h))
    for interlace in (False, True):
        d = decode_png_pixels(
            build_png_pixels(
                w, h, px, color_type=0, depth=depth, interlace=interlace
            )
        )
        want = sum(v * scale for v in px) / (w * h)
        assert d["mean_r"] == want == d["mean_g"] == d["mean_b"]
    pal = bytes((i * 13) % 256 for i in range(768))
    d = decode_png_pixels(
        build_png_pixels(w, h, px, color_type=3, palette=pal, depth=depth)
    )
    assert d["mean_g"] == sum(pal[v * 3 + 1] for v in px) / (w * h)


def test_ima_adpcm_core_matches_stdlib_audioop_if_present():
    """Our IMA/DVI step loop vs CPython's audioop over thousands of
    random nibbles — the same step/index tables, so the decoded
    predictor sequence must match exactly."""
    import random
    import struct
    import warnings

    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import audioop
    except ImportError:
        pytest.skip("audioop not in this Python")
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        _ima_decode_nibble,
    )

    random.seed(17)
    vals = [random.randrange(-32768, 32768) for _ in range(3000)]
    adp, _ = audioop.lin2adpcm(struct.pack(f"<{len(vals)}h", *vals), 2, None)
    pred, idx = 0, 0
    ours = []
    for byte in adp:
        for nib in (byte >> 4, byte & 0xF):  # audioop packs HIGH first
            pred, idx = _ima_decode_nibble(nib, pred, idx)
            ours.append(pred)
    ref = struct.unpack(
        f"<{len(vals)}h", audioop.adpcm2lin(adp, 2, None)[0]
    )
    assert ours == list(ref)


def test_ima_adpcm_wav_round_trip_tracks_signal():
    import math

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_wav_samples,
        decode_ima_adpcm_wav,
        decode_wav_samples,
        encode_ima_adpcm_wav,
    )

    n = 1 + 8 * 30
    sig = [int(6000 * math.sin(i / 35)) for i in range(n)]
    d = decode_wav_samples(
        build_wav_samples(sig, 8000, channels=1, bits=4, codec="ima_adpcm")
    )
    assert (d["codec"], d["bits"], d["n_frames"]) == ("ima_adpcm", 4, n)
    # WAV-level stats equal an independent block decode
    data, ba = encode_ima_adpcm_wav(sig, 1, n)
    dec = decode_ima_adpcm_wav(data, 1, ba)
    assert d["mean"] == sum(dec) / len(dec)
    assert d["peak"] == max(abs(v) for v in dec)
    # the lossy codec tracks a slow signal within one adaptive step
    # once warmed up
    assert max(abs(a - b) for a, b in zip(sig[20:], dec[20:])) < 600


def test_ima_adpcm_stereo_blocks_and_validation():
    import math

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_wav_samples,
        decode_wav_samples,
        encode_ima_adpcm_wav,
    )

    spb = 1 + 8 * 5
    st = [int(2000 * math.sin(i / 20)) for i in range(2 * spb * 3)]
    data, ba = encode_ima_adpcm_wav(st, 2, spb)
    assert len(data) % ba == 0 and len(data) // ba == 3  # three blocks
    d = decode_wav_samples(
        build_wav_samples(st[: 2 * spb], 16000, channels=2, bits=4,
                          codec="ima_adpcm")
    )
    assert d["channels"] == 2 and d["n_frames"] == spb
    with pytest.raises(ValueError, match="multiple of 8"):
        build_wav_samples([0] * 10, 8000, bits=4, codec="ima_adpcm")


# ---------------------------------------------------------------------
# round 6: progressive JPEG (SOF2 spectral selection + DC successive
# approximation)
# ---------------------------------------------------------------------


def test_jpeg_progressive_flat_blocks_exact():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    w, h = 24, 16
    bw = w // 8
    vals = [30 + 9 * k for k in range((w // 8) * (h // 8))]
    px = bytes(
        vals[(y // 8) * bw + (x // 8)] for y in range(h) for x in range(w)
    )
    d = decode_jpeg_pixels(
        build_jpeg_pixels(w, h, px, channels=1, progressive=True)
    )
    assert d["mean_r"] == sum(vals) / len(vals)


@pytest.mark.parametrize(
    "ch,sub", [(1, "444"), (3, "444"), (3, "422"), (3, "420")]
)
def test_jpeg_progressive_decodes_identically_to_baseline(ch, sub):
    """Spectral selection only reframes the SAME coefficients into
    multiple scans (interleaved DC, per-component AC with their
    non-interleaved block grids) — decode must be bit-identical to
    the single-scan baseline file."""
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    random.seed(23 + ch)
    w, h = 20, 12  # not MCU-aligned at 420
    px = bytes(random.randrange(256) for _ in range(w * h * ch))
    kw = dict(channels=ch, dc_quant=1, ac_quant=1, subsampling=sub)
    b = decode_jpeg_pixels(build_jpeg_pixels(w, h, px, **kw))
    p = decode_jpeg_pixels(
        build_jpeg_pixels(w, h, px, progressive=True, **kw)
    )
    assert b == p


def test_jpeg_progressive_dc_successive_approximation():
    """dc_split=True emits a (dc >> 1) first scan at Al=1 plus a
    one-bit refinement scan at Ah=1 — the decoder's point-transform
    and refinement-bit paths must reassemble the exact DC values
    (including negatives, where the arithmetic shift matters)."""
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    random.seed(29)
    w, h = 16, 16
    px = bytes(random.randrange(256) for _ in range(w * h))
    b = decode_jpeg_pixels(
        build_jpeg_pixels(w, h, px, channels=1, dc_quant=1, ac_quant=1)
    )
    p = decode_jpeg_pixels(
        build_jpeg_pixels(
            w, h, px, channels=1, dc_quant=1, ac_quant=1,
            progressive=True, dc_split=True,
        )
    )
    assert b == p


def test_jpeg_refinement_rejects_wide_magnitudes():
    """AC refinement symbols carry magnitude 0 or 1 only (spec
    G.1.2.3). A first-scan bitstream relabeled as a refinement scan
    (Ah=1) contains wider sizes and must reject cleanly — refinement
    itself is SUPPORTED since round 6, so only genuinely malformed
    streams raise."""
    import random
    import struct

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    random.seed(3)
    px = bytes(random.randrange(256) for _ in range(64))
    prog = bytearray(
        build_jpeg_pixels(
            8, 8, px, channels=1, dc_quant=1, ac_quant=1, progressive=True
        )
    )
    i = prog.rindex(b"\xff\xda")
    ln = struct.unpack(">H", prog[i + 2 : i + 4])[0]
    prog[i + 2 + ln - 1] = 0x10  # Ah=1: now claims to be refinement
    with pytest.raises(NotImplementedError, match="magnitude"):
        decode_jpeg_pixels(bytes(prog))


@pytest.mark.parametrize("ch,sub", [(1, "444"), (3, "420")])
def test_jpeg_progressive_ac_refinement_round_trip(ch, sub):
    """Full successive approximation: AC scans split into a top-bits
    pass (Al=1, magnitudes divided toward zero) and a refinement pass
    (Ah=1: newly-visible coefficients as (run,1)+sign, correction
    bits for already-sent ones — including inside EOB runs). Decode
    must be bit-identical to the baseline file."""
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    random.seed(41 + ch)
    for w, h in ((16, 16), (20, 12), (11, 7)):
        px = bytes(random.randrange(256) for _ in range(w * h * ch))
        for dq, aq in ((1, 1), (8, 16)):
            kw = dict(channels=ch, dc_quant=dq, ac_quant=aq,
                      subsampling=sub)
            b = decode_jpeg_pixels(build_jpeg_pixels(w, h, px, **kw))
            p = decode_jpeg_pixels(
                build_jpeg_pixels(
                    w, h, px, progressive=True, ac_split=True,
                    dc_split=True, **kw,
                )
            )
            assert b == p, (w, h, dq, aq)


def test_jpeg_ac_refinement_eob_run_spans_silent_blocks():
    """A mostly-flat image quantized hard produces runs of blocks with
    nothing to refine — the encoder accumulates them into EOBn runs
    and the decoder must walk them (consuming correction bits only
    where history exists)."""
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    w, h = 48, 24  # 18 blocks, almost all silent in the refinement
    px = bytearray([100] * (w * h))
    px[0] = 180  # one busy corner block
    b = decode_jpeg_pixels(build_jpeg_pixels(w, h, bytes(px), channels=1))
    p = decode_jpeg_pixels(
        build_jpeg_pixels(
            w, h, bytes(px), channels=1, progressive=True, ac_split=True
        )
    )
    assert b == p


def test_decoders_fail_closed_on_fuzzed_bytes():
    """Every decoder entry point raises ONLY NotImplementedError on
    bytes it cannot handle — random garbage, truncations of valid
    payloads, and single-byte mutations must never leak IndexError/
    zlib.error/struct.error out of the parse seam."""
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_gif_pixels,
        build_jpeg_pixels,
        build_png_pixels,
        build_wav_samples,
        decode_jpeg_pixels,
        decode_pixels,
        decode_real,
        decode_wav_samples,
    )

    random.seed(77)
    w, h = 8, 8
    seeds = [
        build_png_pixels(w, h, bytes(range(192)), color_type=2),
        build_gif_pixels(
            2, 2, [0, 1, 2, 3], bytes((i * 31) % 256 for i in range(768))
        ),
        build_jpeg_pixels(w, h, bytes(64), channels=1),
        build_jpeg_pixels(
            w, h, bytes(64), channels=1, progressive=True, ac_split=True
        ),
        build_wav_samples([1, -2, 3, -4], 8000, bits=16),
    ]
    cases = []
    for s in seeds:
        for cut in (3, len(s) // 3, len(s) - 1):
            cases.append(s[:cut])  # truncations
        for _ in range(20):  # point mutations
            b = bytearray(s)
            b[random.randrange(len(b))] ^= 1 << random.randrange(8)
            cases.append(bytes(b))
    for _ in range(30):  # pure garbage
        cases.append(bytes(random.randrange(256) for _ in range(random.randrange(1, 200))))

    for payload in cases:
        for dec in (decode_pixels, decode_real, decode_wav_samples,
                    decode_jpeg_pixels):
            try:
                dec(payload)
            except NotImplementedError:
                pass  # the one allowed failure mode
            # any other exception type propagates and fails the test


def test_extract_stats_on_error_null_quarantines_rows(spark):
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_wav_samples,
        extract_audio_stats,
        extract_pixel_stats,
    )

    rows = [
        (1, bytearray(b"P6 1 1 255\n" + bytes([10, 20, 30]))),
        (2, bytearray(b"garbage, not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_pixel_stats(df, on_error="null").collect()}
    assert got[1].mean_r == 10.0
    assert got[2].format is None and got[2].mean_r is None
    # default mode still fails the task on the bad row
    with pytest.raises(Exception):
        extract_pixel_stats(df).collect()
    with pytest.raises(ValueError, match="on_error"):
        extract_pixel_stats(df, on_error="skip")

    wav = build_wav_samples([1, 2, 3, 4], 8000, bits=16)
    rows = [(1, bytearray(wav)), (2, bytearray(b"not audio"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_audio_stats(df, on_error="null").collect()}
    assert got[1].n_frames == 4 and got[2].codec is None


def test_mp4_box_walk_golden_and_seams():
    """MP4 parse against a HAND-BUILT box tree (independent of the
    build twin), plus the seams: missing moov, corrupt box size,
    audio-only files report format without dims."""
    import struct

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_payload,
        decode_real,
    )

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    tkhd = box(
        b"tkhd",
        bytes(4) + bytes(8) + struct.pack(">I", 1) + bytes(4)
        + struct.pack(">I", 0) + bytes(16) + bytes(36)
        + struct.pack(">II", 640 << 16, 360 << 16),
    )
    golden = (
        box(b"ftyp", b"isom" + bytes(4))
        + box(b"moov", box(b"trak", tkhd))
    )
    d = decode_real(golden)
    assert (d["format"], d["width"], d["height"]) == ("mp4", 640, 360)

    # build twin round trip at a different size
    d2 = decode_real(build_payload("mp4", width=320, height=240))
    assert (d2["width"], d2["height"]) == (320, 240)

    # audio-only (trak without dims): format reported, dims absent
    tkhd0 = box(
        b"tkhd",
        bytes(4) + bytes(8) + struct.pack(">I", 1) + bytes(4)
        + struct.pack(">I", 0) + bytes(16) + bytes(36)
        + struct.pack(">II", 0, 0),
    )
    audio = box(b"ftyp", b"isom" + bytes(4)) + box(
        b"moov", box(b"trak", tkhd0)
    )
    da = decode_real(audio)
    assert da["format"] == "mp4" and da["width"] is None

    with pytest.raises(NotImplementedError, match="moov"):
        decode_real(box(b"ftyp", b"isom" + bytes(4)) + box(b"free", b""))
    corrupt = bytearray(golden)
    corrupt[0:4] = struct.pack(">I", 3)  # impossible box size
    with pytest.raises(NotImplementedError):
        decode_real(bytes(corrupt))


def test_extract_features_matches_recipe(spark, sf_small):
    """Twin differential for the `multimodal_features` registry entry
    (tests/test_registry_order.py::TWINS): width/height/f0..f3 are an
    md5-derived recipe over the payload bytes; recompute it inline
    (NOT via _decode_stub) and demand exact equality per doc."""
    docs = load_table(spark, sf_small, "documents")
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in attach_payload(docs).select("doc_id", "payload").collect()
    }
    out = extract_features(attach_payload(docs)).collect()
    assert len(out) == len(payloads) > 0
    for r in out:
        b = payloads[r.doc_id]
        hx = hashlib.md5(b).hexdigest()
        h8 = int(hx[:8], 16)
        assert r.n_bytes == len(b)
        assert r.width == 16 + h8 % 1008
        assert r.height == 16 + (h8 // 1008) % 1008
        for j, f in enumerate((r.f0, r.f1, r.f2, r.f3)):
            assert f == round(int(hx[4 * j : 4 * j + 4], 16) / 65535.0, 6)


def _zero_dim_payloads() -> list[bytes]:
    """Spec-shaped payloads whose header dimensions are zero — the
    ADVICE r6 escape: these used to raise ZeroDivisionError at the
    channel-mean divide instead of NotImplementedError."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    png_0x0 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 0, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b""))
        + chunk(b"IEND", b"")
    )
    gif_0x0 = (
        b"GIF89a"
        + struct.pack("<HH", 0, 0)  # logical screen 0x0
        + bytes([0xF0, 0, 0])  # gct flag, 2-entry table
        + bytes(6)  # gct: 2 rgb entries
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 0, 0) + b"\x00"  # 0x0 image
        + b"\x02\x00"  # lzw min code size, empty data
        + b"\x00\x3b"
    )
    netpbm_0x0 = b"P6\n0 0\n255\n"
    jpeg_0x0 = (
        b"\xff\xd8"
        + b"\xff\xc0"
        + struct.pack(">HBHHB", 8 + 3, 8, 0, 0, 1)
        + bytes([1, 0x11, 0])
        + b"\xff\xd9"
    )
    return [png_0x0, gif_0x0, netpbm_0x0, jpeg_0x0]


def test_zero_dimension_payloads_raise_not_implemented():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        decode_jpeg_pixels,
        decode_pixels,
    )

    for payload in _zero_dim_payloads():
        with pytest.raises(NotImplementedError):
            decode_pixels(payload)
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(_zero_dim_payloads()[3])


def test_on_error_null_quarantines_zero_dim_rows(spark):
    """extract_pixel_stats(on_error='null') must absorb zero-dim rows
    as null-stat rows, not fail the task (the exact ADVICE r6 repro)."""
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_png_pixels,
        extract_pixel_stats,
    )

    good = build_png_pixels(2, 2, bytes(range(12)), color_type=2)
    rows = [(1, bytearray(good))] + [
        (i + 2, bytearray(p)) for i, p in enumerate(_zero_dim_payloads())
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in extract_pixel_stats(df, on_error="null").collect()}
    assert len(out) == len(rows)
    assert out[1].width == 2 and out[1].mean_r is not None
    for i in range(2, len(rows) + 1):
        assert out[i].width is None and out[i].mean_r is None


# ---------------------------------------------------------------------
# round 7: MP3 (MPEG Layer III) frame walk
# ---------------------------------------------------------------------


def test_mp3_cbr_round_trip():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_mp3_frames,
        decode_mp3_frames,
    )

    b = build_mp3_frames(10, sample_rate=44100, bitrate_kbps=128, channels=2)
    d = decode_mp3_frames(b)
    assert d["format"] == "mp3" and d["version"] == "1"
    assert (d["sample_rate"], d["channels"], d["n_frames"]) == (44100, 2, 10)
    assert d["vbr"] is False and d["xing_frames"] is None
    # 10 frames x 1152 samples at 44100 Hz = 261.224 ms
    assert d["duration_ms"] == round(10 * 1152 / 44100 * 1000)
    # CBR without padding: avg bitrate just under nominal (floor'd frames)
    assert abs(d["bitrate_kbps"] - 128) < 1


def test_mp3_padding_and_exact_frame_lengths():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_mp3_frames,
        decode_mp3_frames,
    )

    pads = [0, 1, 0, 1, 1]
    b = build_mp3_frames(
        5, sample_rate=44100, bitrate_kbps=128, channels=1, padding=pads
    )
    # spec: frame length = floor(144 * 128000 / 44100) + pad = 417 + pad
    assert len(b) == 5 * 417 + sum(pads)
    d = decode_mp3_frames(b)
    assert d["n_frames"] == 5 and d["channels"] == 1


def test_mp3_vbr_id3_and_xing():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_mp3_frames,
        decode_mp3_frames,
    )

    rates = [96, 128, 160, 128]
    b = build_mp3_frames(
        4,
        sample_rate=32000,
        bitrate_kbps=rates,
        channels=2,
        id3_text=b"hello metadata",
        xing=True,
    )
    d = decode_mp3_frames(b)
    assert d["vbr"] is True and d["xing_frames"] == 4 and d["n_frames"] == 4
    # byte-weighted average sits strictly between min and max rate
    assert 96 < d["bitrate_kbps"] < 160

    # ID3v1 'TAG' trailer is tolerated
    d2 = decode_mp3_frames(b + b"TAG" + bytes(125))
    assert d2["n_frames"] == 4


def test_mp3_mpeg2_and_mono_side_info():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_mp3_frames,
        decode_mp3_frames,
    )

    b = build_mp3_frames(
        6, sample_rate=22050, bitrate_kbps=64, channels=1, xing=True
    )
    d = decode_mp3_frames(b)
    assert d["version"] == "2" and d["sample_rate"] == 22050
    assert d["duration_ms"] == round(6 * 576 / 22050 * 1000)
    assert d["xing_frames"] == 6


def test_mp3_strictness_fail_closed():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_mp3_frames,
        decode_mp3_frames,
        decode_real,
    )

    good = build_mp3_frames(3, sample_rate=48000, bitrate_kbps=192)
    for bad in (
        good[: len(good) - 5],          # truncated final frame
        good + b"\x00\x01\x02",         # trailing garbage, not a frame
        b"\xff\xfb\x00\x00" + bytes(100),  # free-format bitrate
        b"ID3\x04\x00\x00\x00\x00\x00\x7f",  # ID3 then nothing
    ):
        with pytest.raises(NotImplementedError):
            decode_mp3_frames(bad)
    # mid-stream parameter change = corrupt/concatenated
    a = build_mp3_frames(2, sample_rate=44100, bitrate_kbps=128)
    c = build_mp3_frames(2, sample_rate=48000, bitrate_kbps=128)
    with pytest.raises(NotImplementedError):
        decode_mp3_frames(a + c)
    # decode_real surfaces MP3 sample_rate/channels
    meta = decode_real(good)
    assert (meta["format"], meta["sample_rate"], meta["channels"]) == (
        "mp3", 48000, 2,
    )
    assert meta["width"] is None


def test_mp3_fuzz_fail_closed():
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_mp3_frames,
        decode_mp3_frames,
    )

    random.seed(177)
    seed = build_mp3_frames(
        4, sample_rate=44100, bitrate_kbps=128, id3_text=b"x" * 40, xing=True
    )
    cases = [seed[:cut] for cut in (3, 9, len(seed) // 2, len(seed) - 1)]
    for _ in range(40):
        b = bytearray(seed)
        b[random.randrange(len(b))] ^= 1 << random.randrange(8)
        cases.append(bytes(b))
    for _ in range(20):
        cases.append(bytes(random.randrange(256) for _ in range(random.randrange(1, 64))))
    ok = 0
    for payload in cases:
        try:
            d = decode_mp3_frames(payload)
            ok += 1  # a mutation that leaves the stream valid is fine
        except NotImplementedError:
            pass
    # most mutations must be caught; none may raise anything else
    assert ok < len(cases)


# ---------------------------------------------------------------------
# round 7: AVI/MJPEG container walk + real frame decode
# ---------------------------------------------------------------------


def test_avi_mjpeg_round_trip_exact():
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_avi_mjpeg,
        build_jpeg_pixels,
        decode_avi_frames,
    )

    w, h = 16, 8
    values = [30, 77, 128, 201]
    frames = [
        build_jpeg_pixels(w, h, bytes([v]) * (w * h), channels=1)
        for v in values
    ]
    d = decode_avi_frames(build_avi_mjpeg(frames, w, h, fps=24))
    assert (d["format"], d["width"], d["height"]) == ("avi-mjpeg", w, h)
    assert d["n_frames"] == 4 and abs(d["fps"] - 24.0) < 0.02
    for fr, v in zip(d["frames"], values):
        # flat blocks with dc_quant=8 decode EXACTLY
        assert (fr["mean_r"], fr["mean_g"], fr["mean_b"]) == (v, v, v)


def test_avi_mjpeg_rgb_frames_decode():
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_avi_mjpeg,
        build_jpeg_pixels,
        decode_avi_frames,
    )

    rng = np.random.default_rng(3)
    w, h = 8, 8
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    fr = build_jpeg_pixels(w, h, px.tobytes(), channels=3)
    d = decode_avi_frames(build_avi_mjpeg([fr], w, h))
    # lossy color JPEG: means within a few counts of the source means
    for got, want in zip(
        (d["frames"][0]["mean_r"], d["frames"][0]["mean_g"],
         d["frames"][0]["mean_b"]),
        (px[..., 0].mean(), px[..., 1].mean(), px[..., 2].mean()),
    ):
        assert abs(got - want) < 8.0


def test_avi_strictness_fail_closed():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_avi_mjpeg,
        build_jpeg_pixels,
        decode_avi_frames,
    )

    w, h = 8, 8
    f = build_jpeg_pixels(w, h, bytes([50]) * (w * h), channels=1)
    good = build_avi_mjpeg([f, f], w, h)

    with pytest.raises(NotImplementedError):
        decode_avi_frames(good[:30])  # truncated
    with pytest.raises(NotImplementedError):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")  # wrong RIFF kind
    # frame dims disagree with the container dims
    wrong = build_jpeg_pixels(16, 8, bytes([50]) * 128, channels=1)
    with pytest.raises(NotImplementedError):
        decode_avi_frames(build_avi_mjpeg([wrong], w, h))
    # declared frame count != movi contents
    import struct
    tampered = bytearray(good)
    at = tampered.index(b"avih") + 8 + 16  # total_frames field
    struct.pack_into("<I", tampered, at, 5)
    with pytest.raises(NotImplementedError):
        decode_avi_frames(bytes(tampered))
    # a non-MJPG vids handler names the codec seam
    tampered2 = bytearray(good)
    at2 = tampered2.index(b"vids") + 4
    tampered2[at2 : at2 + 4] = b"H264"
    with pytest.raises(NotImplementedError):
        decode_avi_frames(bytes(tampered2))


def test_avi_fuzz_fail_closed():
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_avi_mjpeg,
        build_jpeg_pixels,
        decode_avi_frames,
    )

    random.seed(277)
    f = build_jpeg_pixels(8, 8, bytes([90]) * 64, channels=1)
    seed = build_avi_mjpeg([f, f, f], 8, 8)
    cases = [seed[:cut] for cut in (5, 40, len(seed) // 2, len(seed) - 1)]
    for _ in range(40):
        b = bytearray(seed)
        b[random.randrange(len(b))] ^= 1 << random.randrange(8)
        cases.append(bytes(b))
    for payload in cases:
        try:
            decode_avi_frames(payload)
        except NotImplementedError:
            pass  # only allowed failure mode


def test_extract_video_frames_distributed_and_quarantine(spark):
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_avi_mjpeg,
        build_jpeg_pixels,
        extract_video_frames,
    )

    f1 = build_jpeg_pixels(8, 8, bytes([40]) * 64, channels=1)
    f2 = build_jpeg_pixels(8, 8, bytes([200]) * 64, channels=1)
    good = build_avi_mjpeg([f1, f2], 8, 8)
    rows = [(1, bytearray(good)), (2, bytearray(b"not a video"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    with pytest.raises(Exception):
        extract_video_frames(df).collect()
    out = extract_video_frames(df, on_error="null").collect()
    got = sorted(((r.doc_id, r.frame_idx, r.mean_r) for r in out))
    assert got == [(1, 0, 40.0), (1, 1, 200.0), (2, None, None)]


# ---------------------------------------------------------------------
# round 7: AAC ADTS frame walk
# ---------------------------------------------------------------------


def test_aac_adts_round_trip():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_aac_adts,
        decode_aac_adts,
    )

    b = build_aac_adts(8, sample_rate=48000, channels=2, frame_payload=300)
    d = decode_aac_adts(b)
    assert (d["format"], d["profile"]) == ("aac-adts", "lc")
    assert (d["sample_rate"], d["channels"], d["n_frames"]) == (48000, 2, 8)
    assert d["n_samples"] == 8 * 1024
    assert d["duration_ms"] == round(8 * 1024 / 48000 * 1000)
    # 8 frames x 307 bytes over 170.7ms
    want_kbps = len(b) * 8 / (8 * 1024 / 48000) / 1000
    assert abs(d["bitrate_kbps"] - want_kbps) < 0.01


def test_aac_adts_crc_blocks_and_profiles():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_aac_adts,
        decode_aac_adts,
    )

    b = build_aac_adts(
        3, sample_rate=22050, channels=6, profile="main",
        frame_payload=64, crc=True, blocks_per_frame=4,
    )
    d = decode_aac_adts(b)
    assert d["profile"] == "main" and d["channels"] == 6
    assert d["n_frames"] == 3 and d["n_samples"] == 3 * 4 * 1024


def test_aac_adts_fail_closed():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_aac_adts,
        decode_aac_adts,
        decode_real,
    )

    good = build_aac_adts(4, sample_rate=44100, channels=1)
    for bad in (
        good[: len(good) - 3],      # truncated final frame
        good + b"\x00\x01",         # trailing garbage
        b"",                        # empty
    ):
        with pytest.raises(NotImplementedError):
            decode_aac_adts(bad)
    # mid-stream parameter change
    other = build_aac_adts(2, sample_rate=32000, channels=1)
    with pytest.raises(NotImplementedError):
        decode_aac_adts(good + other)
    # reserved sampling index / zero channel config
    hdr = bytearray(good[:7])
    hdr[2] = (hdr[2] & 0xC3) | (13 << 2)
    with pytest.raises(NotImplementedError):
        decode_aac_adts(bytes(hdr) + good[7:])
    # decode_real reports AAC metadata and never confuses it with MP3
    meta = decode_real(good)
    assert (meta["format"], meta["sample_rate"], meta["channels"]) == (
        "aac", 44100, 1,
    )


def test_aac_and_mp3_syncs_disjoint():
    """An ADTS header (layer 00) must never parse as MP3 (layer 01)
    and vice versa."""
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        _adts_sync_at,
        _mp3_sync_at,
        build_aac_adts,
        build_mp3_frames,
    )

    aac = build_aac_adts(1, sample_rate=44100)
    mp3 = build_mp3_frames(1, sample_rate=44100)
    assert _adts_sync_at(aac, 0) and not _mp3_sync_at(aac, 0)
    assert _mp3_sync_at(mp3, 0) and not _adts_sync_at(mp3, 0)


def test_aac_fuzz_fail_closed():
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_aac_adts,
        decode_aac_adts,
    )

    random.seed(377)
    seed = build_aac_adts(5, sample_rate=16000, channels=2, crc=True)
    cases = [seed[:cut] for cut in (2, 8, len(seed) // 2, len(seed) - 1)]
    for _ in range(40):
        b = bytearray(seed)
        b[random.randrange(len(b))] ^= 1 << random.randrange(8)
        cases.append(bytes(b))
    for payload in cases:
        try:
            decode_aac_adts(payload)
        except NotImplementedError:
            pass  # only allowed failure mode


# ---------------------------------------------------------------------
# round 7: 12-bit JPEG (extended sequential SOF1)
# ---------------------------------------------------------------------


def test_jpeg_12bit_flat_round_trip_exact():
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    w, h = 16, 8
    for v in (0, 1000, 2048, 3000, 4095):
        px = np.full((h, w), v, dtype="<u2")
        d = decode_jpeg_pixels(
            build_jpeg_pixels(w, h, px.tobytes(), channels=1, precision=12)
        )
        assert (d["width"], d["height"]) == (w, h)
        assert d["mean_r"] == d["mean_g"] == d["mean_b"] == v


def test_jpeg_12bit_extended_dc_categories():
    """Alternating 0/4095 flat blocks force DC diffs past category 11,
    exercising the extended (categories 12..15) DC table on both
    sides of the codec."""
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    w, h = 32, 8  # four 8x8 blocks: 0, 4095, 0, 4095
    px = np.zeros((h, w), dtype="<u2")
    px[:, 8:16] = 4095
    px[:, 24:32] = 4095
    d = decode_jpeg_pixels(
        build_jpeg_pixels(w, h, px.tobytes(), channels=1, precision=12)
    )
    assert d["mean_r"] == float(px.mean())


def test_jpeg_12bit_random_content_close():
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    rng = np.random.default_rng(41)
    w, h = 24, 16
    px = rng.integers(0, 4096, size=(h, w), dtype="<u2")
    d = decode_jpeg_pixels(
        build_jpeg_pixels(w, h, px.tobytes(), channels=1, precision=12)
    )
    # quantization noise scales with the 0..4095 domain: |err| well
    # under 1.5% of range on the mean
    assert abs(d["mean_r"] - px.mean()) < 60


def test_jpeg_12bit_validation_and_sof_rules():
    import struct

    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
        decode_jpeg_pixels,
    )

    px = np.full((8, 8), 9, dtype="<u2").tobytes()
    with pytest.raises(ValueError):
        build_jpeg_pixels(8, 8, px, channels=1, precision=12, progressive=True)
    with pytest.raises(ValueError):
        build_jpeg_pixels(8, 8, px, channels=3, precision=12)
    with pytest.raises(ValueError):
        build_jpeg_pixels(8, 8, bytes(64), channels=1, precision=10)

    good = build_jpeg_pixels(8, 8, px, channels=1, precision=12)
    assert b"\xff\xc1" in good  # SOF1, not SOF0
    # 12-bit inside baseline SOF0 is rejected by the decoder
    tampered = bytearray(good)
    tampered[good.index(b"\xff\xc1") + 1] = 0xC0
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bytes(tampered))
    # and a depth the spec doesn't allow at all
    t2 = bytearray(good)
    t2[good.index(b"\xff\xc1") + 4] = 10
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bytes(t2))


# ---------------------------------------------------------------------
# round 7: lossless JPEG (SOF3, Annex H predictors)
# ---------------------------------------------------------------------


def test_jpeg_lossless_bit_exact_all_predictors():
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_lossless,
        decode_jpeg_lossless,
        decode_jpeg_pixels,
    )

    rng = np.random.default_rng(11)
    w, h = 13, 6
    for predictor in range(1, 8):
        px = rng.integers(0, 256, size=h * w, dtype=np.uint8)
        b = build_jpeg_lossless(w, h, px.tobytes(), predictor=predictor)
        d = decode_jpeg_lossless(b)
        assert d["format"] == "jpeg-lossless"
        assert d["mean_r"] == float(px.mean())  # EXACT: process is lossless
        # dispatch through the general pixel decoder too
        assert decode_jpeg_pixels(b)["mean_r"] == float(px.mean())


def test_jpeg_lossless_high_precision_and_rgb():
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_lossless,
        decode_jpeg_lossless,
    )

    rng = np.random.default_rng(13)
    w, h = 7, 5
    for P in (12, 16):
        px = rng.integers(0, 1 << P, size=h * w).astype("<u2")
        d = decode_jpeg_lossless(
            build_jpeg_lossless(w, h, px.tobytes(), precision=P, predictor=4)
        )
        assert d["mean_r"] == float(px.astype(float).mean())
    rgb = rng.integers(0, 256, size=h * w * 3, dtype=np.uint8)
    d = decode_jpeg_lossless(
        build_jpeg_lossless(w, h, rgb.tobytes(), channels=3, predictor=7)
    )
    a = rgb.astype(float).reshape(h, w, 3)
    assert (d["mean_r"], d["mean_g"], d["mean_b"]) == tuple(
        a[:, :, c].mean() for c in range(3)
    )


def test_jpeg_lossless_fail_closed():
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_lossless,
        decode_jpeg_lossless,
    )

    with pytest.raises(ValueError):
        build_jpeg_lossless(4, 4, bytes(16), predictor=0)
    with pytest.raises(ValueError):
        build_jpeg_lossless(4, 4, bytes(15))
    good = build_jpeg_lossless(8, 8, bytes(range(64)), predictor=4)
    with pytest.raises(NotImplementedError):
        decode_jpeg_lossless(good[: len(good) // 2])
    # a baseline file is not a lossless one
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_pixels,
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg_lossless(build_jpeg_pixels(8, 8, bytes(64), channels=1))
    random.seed(477)
    for _ in range(40):
        b = bytearray(good)
        b[random.randrange(len(b))] ^= 1 << random.randrange(8)
        try:
            decode_jpeg_lossless(bytes(b))
        except NotImplementedError:
            pass  # only allowed failure mode


def test_mp3_xing_rejects_frames_too_small_for_the_tag():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_mp3_frames,
    )

    # MPEG-2 8 kbps / 24 kHz mono: 24-byte frames — a 21-byte
    # side+Xing region cannot fit the 20-byte body
    with pytest.raises(ValueError, match="Xing"):
        build_mp3_frames(
            3, sample_rate=24000, bitrate_kbps=8, channels=1, xing=True
        )


# ---------------------------------------------------------------------
# Ogg/Opus container walk (round 9)


def test_ogg_opus_round_trip_variants():
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_ogg_opus,
        decode_ogg_opus,
    )

    for n, ch, pb, fm in ((1, 1, 30, 10), (3, 2, 120, 20), (4, 1, 600, 40)):
        p = build_ogg_opus(
            n, sample_rate=22050, channels=ch, packet_bytes=pb, frame_ms=fm
        )
        d = decode_ogg_opus(p)
        assert d["format"] == "opus"
        assert (d["n_packets"], d["channels"], d["sample_rate"]) == (
            n, ch, 22050,
        )
        assert d["duration_ms"] == n * fm
        # BOS + tags + one page per audio packet
        assert d["n_pages"] == 2 + n


def test_ogg_packet_continued_across_pages():
    """A packet whose tail rides a continuation page (header bit 0x01)
    must reassemble exactly — the builder never emits this, so it is
    hand-built from _ogg_page."""
    import struct

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        _ogg_page,
        decode_ogg_opus,
    )

    head = (
        b"OpusHead\x01\x01" + struct.pack("<H", 0)
        + struct.pack("<I", 16000) + struct.pack("<h", 0) + b"\x00"
    )
    tags = b"OpusTags" + struct.pack("<I", 0) + struct.pack("<I", 0)
    big = bytes((4 << 3,)) + bytes(509)  # 510 bytes → exactly 2×255
    stream = (
        _ogg_page(head, 7, 0, 0, 0x02)
        + _ogg_page(tags, 7, 1, 0, 0x00)
        # first 255 bytes, continued_tail → no terminating lacing value
        + _ogg_page(big[:255], 7, 2, -1, 0x00, continued_tail=True)
        # continuation page carries the rest and the EOS flag
        + _ogg_page(big[255:], 7, 3, 960, 0x01 | 0x04)
    )
    d = decode_ogg_opus(stream)
    assert d["n_packets"] == 1 and d["n_pages"] == 4
    assert d["duration_ms"] == 960 * 1000 // 48000


def test_ogg_opus_fails_closed():
    import pytest

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_ogg_opus,
        decode_ogg_opus,
    )

    p = build_ogg_opus(2, channels=2)
    with pytest.raises(NotImplementedError, match="not an Ogg"):
        decode_ogg_opus(b"RIFF" + p[4:])
    # flip one payload byte on the BOS page: its CRC must catch it
    bad = bytearray(p)
    bad[30] ^= 0xFF
    with pytest.raises(NotImplementedError, match="CRC"):
        decode_ogg_opus(bytes(bad))
    # drop the final (EOS) page: missing-EOS must fail
    last_page = p.rfind(b"OggS")
    with pytest.raises(NotImplementedError, match="EOS"):
        decode_ogg_opus(p[:last_page])
    with pytest.raises(NotImplementedError, match="truncated"):
        decode_ogg_opus(p[:-5])
    # remove the middle page: sequence discontinuity
    pages = []
    at = 0
    while True:
        nxt = p.find(b"OggS", at + 1)
        pages.append(p[at : nxt if nxt != -1 else len(p)])
        if nxt == -1:
            break
        at = nxt
    with pytest.raises(NotImplementedError, match="discontinuity"):
        decode_ogg_opus(pages[0] + b"".join(pages[2:]))
    with pytest.raises(NotImplementedError, match="BOS"):
        decode_ogg_opus(b"".join(pages[1:]))


def test_ogg_opus_builder_validation():
    import pytest

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_ogg_opus,
    )

    with pytest.raises(ValueError, match="positive"):
        build_ogg_opus(0)
    with pytest.raises(ValueError, match="channel"):
        build_ogg_opus(1, channels=3)
    with pytest.raises(ValueError, match="frame_ms"):
        build_ogg_opus(1, frame_ms=15)


# ---------------------------------------------------------------------
# Hierarchical JPEG (T.81 Annex J, round 9)


def test_hierarchical_jpeg_flat_and_blocky_round_trip_exactly():
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_hierarchical,
        decode_jpeg_hierarchical,
    )

    flat = np.full((32, 48), 77)
    d = decode_jpeg_hierarchical(build_jpeg_hierarchical(48, 32, flat))
    assert (d["width"], d["height"], d["n_levels"]) == (48, 32, 2)
    assert d["format"] == "jpeg-hierarchical"
    assert (d["pixels"] == 77).all() and d["mean_r"] == 77.0

    # per-8x8-block values: the differential level corrects the
    # decimated level-1 reconstruction exactly at unit quant
    vals = np.arange(24).reshape(4, 6) * 9 + 20
    blocky = np.kron(vals, np.ones((8, 8), dtype=int))
    d = decode_jpeg_hierarchical(build_jpeg_hierarchical(48, 32, blocky))
    assert (d["pixels"] == blocky).all()
    assert d["mean_r"] == round(float(blocky.mean()), 6)


def test_hierarchical_jpeg_arbitrary_content_error_bound():
    """The EXP interpolation path does real work on non-flat content;
    the differential frame must correct it to within FDCT/IDCT
    rounding (|err| <= 2 at unit quant)."""
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_hierarchical,
        decode_jpeg_hierarchical,
    )

    rng = np.random.default_rng(11)
    img = np.clip(
        rng.integers(0, 50, (32, 32)).cumsum(axis=1) % 200 + 20, 0, 255
    )
    d = decode_jpeg_hierarchical(build_jpeg_hierarchical(32, 32, img))
    assert np.abs(d["pixels"] - img).max() <= 2


def test_hierarchical_jpeg_dispatches_from_decode_jpeg_pixels():
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_hierarchical,
        decode_jpeg_pixels,
    )

    p = build_jpeg_hierarchical(16, 16, np.full((16, 16), 42))
    d = decode_jpeg_pixels(p)
    assert d["format"] == "jpeg-hierarchical" and d["n_levels"] == 2


def test_hierarchical_jpeg_fails_closed():
    import numpy as np
    import pytest

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_jpeg_hierarchical,
        decode_jpeg_hierarchical,
    )

    p = build_jpeg_hierarchical(16, 16, np.full((16, 16), 9))
    with pytest.raises(NotImplementedError, match="SOI"):
        decode_jpeg_hierarchical(b"xx" + p[2:])
    with pytest.raises(NotImplementedError):
        decode_jpeg_hierarchical(p[:-10])
    # strip the DHP segment: the SOF5 level must be rejected
    dhp_at = p.find(b"\xff\xde")
    seg_len = int.from_bytes(p[dhp_at + 2 : dhp_at + 4], "big")
    no_dhp = p[:dhp_at] + p[dhp_at + 2 + seg_len :]
    with pytest.raises(NotImplementedError, match="before DHP"):
        decode_jpeg_hierarchical(no_dhp)
    # builder validation
    with pytest.raises(ValueError, match="16-aligned"):
        build_jpeg_hierarchical(12, 16, np.zeros((16, 12)))
    with pytest.raises(ValueError, match="range"):
        build_jpeg_hierarchical(16, 16, np.full((16, 16), 300))


def test_hierarchical_jpeg_exp_interpolation_spec_values():
    """(a+b+1)>>1 with edge replication, per axis."""
    import numpy as np

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        _jpeg_expand_ref,
    )

    ref = np.array([[0, 10], [20, 30]], dtype=np.int64)
    h = _jpeg_expand_ref(ref, 1, 0, np)
    assert h.tolist() == [[0, 5, 10, 10], [20, 25, 30, 30]]
    v = _jpeg_expand_ref(ref, 0, 1, np)
    assert v.tolist() == [[0, 10], [10, 20], [20, 30], [20, 30]]
    hv = _jpeg_expand_ref(ref, 1, 1, np)
    assert hv.shape == (4, 4) and hv[0, 0] == 0 and hv[3, 3] == 30


def test_ogg_opus_fuzz_never_leaks_parser_internals():
    import random

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        build_ogg_opus,
        decode_ogg_opus,
    )

    base = build_ogg_opus(3, channels=2, packet_bytes=300)
    rng = random.Random(17)
    for _ in range(150):
        payload = bytearray(base)
        for _ in range(rng.randint(1, 3)):
            payload[rng.randrange(len(payload))] ^= rng.randint(1, 255)
        try:
            decode_ogg_opus(bytes(payload))
        except NotImplementedError:
            pass  # the one documented failure mode
