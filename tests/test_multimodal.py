"""Multimodal plumbing unit checks (oracle parity covers the values)."""

from __future__ import annotations

import pytest

from optimal_parallel_fp_growth_spark.operators.multimodal import (
    attach_media,
    attach_payload,
    build_payload,
    decode_media,
    decode_real,
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
