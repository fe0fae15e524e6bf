"""Multimodal query registry. `multimodal_features` runs the
md5-derived stub decode (codec-free, fully oracle-checkable — see
operators/multimodal.py CODEC STATUS); `multimodal_decode` runs the
REAL header parsers over spec-valid constructed media bytes;
`multimodal_frames` (round 7) FULLY pixel-decodes MJPEG frames out of
real AVI containers."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.multimodal import (
    attach_audio_media,
    attach_flac_media,
    attach_gif_media,
    attach_jpeg_media,
    attach_media,
    attach_mixed_video_media,
    attach_payload,
    attach_pixel_media,
    attach_video_media,
    decode_media,
    extract_mixed_video_frames,
    extract_audio_stats,
    extract_flac_stats,
    extract_features,
    extract_pixel_stats,
    extract_video_frames,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video round trip (round 7): per doc, build an AVI/MJPEG
    container (`video_meta_for`: 1 + doc_id%4 flat-gray frames, each a
    genuine baseline JPEG), then walk the RIFF tree and FULLY decode
    every frame (operators/multimodal.py::decode_avi_frames). Flat
    blocks with dc_quant=8 round-trip exactly, so the oracle is the
    closed form `16 + (doc_id*7 + i*19) % 200` per frame — any bug in
    the RIFF walk, idx1/avih cross-checks, or the JPEG decode shifts a
    mean and breaks equality."""
    docs = load_table(spark, sf_dir, "documents")
    out = extract_video_frames(attach_video_media(docs))
    return out.select(
        "doc_id", "frame_idx", "width", "height",
        *[F.round(F.col(c), 6).alias(c) for c in ("mean_r", "mean_g", "mean_b")],
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL round trip across THIRTEEN container formats: spec-valid
    PNG/GIF/BMP/JPEG/WAV/MP4/MP3/AAC/FLAC/Ogg-Opus/AVI/Y4M/animated-GIF
    bytes built per doc (operators/multimodal.py::build_payload), then
    header-parsed by the live ``decode_real`` seam (MP3/AAC run their
    full frame walks; FLAC runs the FULL CRC+MD5-verified sample
    decode; Opus the CRC-checked Ogg page walk with packet reassembly
    — both round 9; animated GIFs are DETECTED by a strict block walk
    that counts image descriptors whenever a global color table is
    present — round 10). The oracle recomputes the metadata recipe
    (`media_meta_for`) in SQL — a decode bug breaks equality."""
    docs = load_table(spark, sf_dir, "documents")
    out = decode_media(attach_media(docs))
    # inapplicable fields → 0 (not NULL): keeps every comparator's row
    # sort/hash single-typed per column
    return out.select(
        "doc_id",
        "format",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in ("width", "height", "sample_rate", "channels")
        ],
    )


def q_multimodal_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel round trip (round 6): per doc, build a real image —
    8-bit RGB PNG with scanline filters cycling through all five
    types, raw P6 netpbm, or GIF (real LZW encode), rotating by
    doc_id % 3 — whose pixel values follow `pixel_meta_for`'s
    closed-form recipe, then FULLY decode it (zlib inflate +
    unfiltering / netpbm parse / LZW decode + palette lookup) and
    report per-channel means. The oracle recomputes the closed form
    in SQL: any bug in chunk walking, inflate framing, any of the
    five filters, the netpbm parser, or either side of the LZW codec
    shifts a mean and breaks equality."""
    docs = load_table(spark, sf_dir, "documents")
    out = extract_pixel_stats(attach_pixel_media(docs))
    return out.select(
        "doc_id",
        "format",
        "width",
        "height",
        *[F.round(F.col(c), 6).alias(c) for c in ("mean_r", "mean_g", "mean_b")],
    )


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio round trip (round 6): per doc, build a real WAV —
    codec rotating doc_id % 5 over unsigned-8 / signed-16 / 24 / 32
    PCM and IEEE float32 — whose flat sample ``k`` holds
    ``base + amp * (k % m)`` per `audio_meta_for`, then FULLY decode
    every frame and report mean / rms / peak / duration. The oracle
    recomputes the closed forms in SQL: any bug in the RIFF walk,
    chunk-length/pad handling, offset-binary 8-bit decode, 24-bit
    sign extension, or float unpacking shifts a statistic and breaks
    equality (rms rounds to 6 — the two engines order the mean-square
    arithmetic differently by one ulp)."""
    docs = load_table(spark, sf_dir, "documents")
    out = extract_audio_stats(attach_audio_media(docs))
    return out.select(
        "doc_id",
        "codec",
        "sample_rate",
        "channels",
        "bits",
        "n_frames",
        *[
            F.round(F.col(c), 6).alias(c)
            for c in ("duration_sec", "mean", "rms")
        ],
        "peak",
    )


def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG round trip (round 6): per doc, ENCODE a real JPEG
    (float FDCT, quantization, zigzag, DPCM, Annex K Huffman; odd
    doc_ids get PROGRESSIVE SOF2 framing — spectral-selection scans,
    and every fourth doc a split DC scan with a successive-
    approximation refinement pass; doc_id % 8 == 4 a HIERARCHICAL
    T.81 Annex J pyramid — DHP, half-res SOF0, EXP, differential
    SOF5 — added to the rotation in round 10) and FULLY DECODE it
    (marker walk, canonical Huffman, multi-scan coefficient
    accumulation, dequantize, IDCT). The recipe uses flat 8x8 blocks whose DC values quantize
    without remainder (globally flat for the hierarchical class — the
    only regime where the two-level pyramid is exact), so the lossy
    codec round-trips EXACTLY and the oracle states the mean in
    closed form — any bug in either side of the entropy coder, the
    zigzag, the DPCM chain, byte stuffing/unstuffing, or the (I)DCT
    shifts the mean and breaks equality."""
    docs = load_table(spark, sf_dir, "documents")
    out = extract_pixel_stats(attach_jpeg_media(docs))
    return out.select(
        "doc_id",
        "format",
        "width",
        "height",
        *[F.round(F.col(c), 6).alias(c) for c in ("mean_r", "mean_g", "mean_b")],
    )


_H8 = "('0x' || substr(md5(text), 1, 8))::BIGINT"

ORACLE_FEATURES = f"""
SELECT doc_id,
       ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS modality,
       octet_length(encode(text)) AS n_bytes,
       (16 + {_H8} % 1008)::INT AS width,
       (16 + ({_H8} // 1008) % 1008)::INT AS height,
       round(('0x' || substr(md5(text), 1, 4))::BIGINT / 65535.0, 6) AS f0,
       round(('0x' || substr(md5(text), 5, 4))::BIGINT / 65535.0, 6) AS f1,
       round(('0x' || substr(md5(text), 9, 4))::BIGINT / 65535.0, 6) AS f2,
       round(('0x' || substr(md5(text), 13, 4))::BIGINT / 65535.0, 6) AS f3
FROM documents
"""

# video_meta_for mirrored in SQL: n_frames = 1 + doc_id%4, dims
# 8*(1+doc_id%3) x 8*(1+doc_id%2); frame i is flat gray value
# 16 + (doc_id*7 + i*19) % 200, which JPEG-round-trips exactly.
ORACLE_FRAMES = """
SELECT d.doc_id,
       u.i::INT AS frame_idx,
       (8 * (1 + d.doc_id % 3))::INT AS width,
       (8 * (1 + d.doc_id % 2))::INT AS height,
       round((16 + (d.doc_id * 7 + u.i * 19) % 200)::DOUBLE, 6) AS mean_r,
       round((16 + (d.doc_id * 7 + u.i * 19) % 200)::DOUBLE, 6) AS mean_g,
       round((16 + (d.doc_id * 7 + u.i * 19) % 200)::DOUBLE, 6) AS mean_b
FROM documents d,
     LATERAL (SELECT UNNEST(generate_series(0, d.doc_id % 4)) AS i) u
"""

# media_meta_for mirrored in SQL: format rotates doc_id % 13 (round 6
# adds MP4 ISO-BMFF box parsing, round 7 the MP3 frame walk and the
# AAC ADTS walk, round 9 full FLAC decode + the Ogg/Opus CRC-checked
# page walk + the AVI avih and Y4M stream-header parses, round 10 the
# gif-anim class: a REAL two-frame animation that decode_real's
# strict block walk must DETECT as multi-frame, with small dims
# keyed off doc_id//13); images, mp4, avi and y4m get
# (16 + doc_id*7919 % 2000, 16 + doc_id*104729 % 2000); wav, flac and
# opus get (8000 + doc_id*31 % 40000, 1 + doc_id % 2); mp3 gets an
# MPEG-1-legal sample rate [44100,48000,32000][(doc_id//13)%3], aac an
# ADTS-table rate [...][(doc_id//13)%12]; all audio codecs share wav's
# channel rule.
ORACLE_DECODE = """
SELECT doc_id,
       ['png', 'gif', 'bmp', 'jpeg', 'wav', 'mp4', 'mp3', 'aac', 'flac',
        'opus', 'avi', 'y4m', 'gif-anim'][(doc_id % 13)::INT + 1] AS format,
       CASE WHEN doc_id % 13 IN (4, 6, 7, 8, 9) THEN 0
            WHEN doc_id % 13 = 12 THEN (6 + (doc_id // 13) % 10)::INT
            ELSE (16 + (doc_id * 7919) % 2000)::INT END AS width,
       CASE WHEN doc_id % 13 IN (4, 6, 7, 8, 9) THEN 0
            WHEN doc_id % 13 = 12 THEN (4 + (doc_id // 13) % 7)::INT
            ELSE (16 + (doc_id * 104729) % 2000)::INT END AS height,
       CASE WHEN doc_id % 13 IN (4, 8, 9)
            THEN (8000 + (doc_id * 31) % 40000)::INT
            WHEN doc_id % 13 = 6
            THEN [44100, 48000, 32000][((doc_id // 13) % 3)::INT + 1]
            WHEN doc_id % 13 = 7
            THEN [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
                  16000, 12000, 11025, 8000][((doc_id // 13) % 12)::INT + 1]
            ELSE 0 END AS sample_rate,
       CASE WHEN doc_id % 13 IN (4, 6, 7, 8, 9) THEN (1 + doc_id % 2)::INT
            ELSE 0 END AS channels
FROM documents
"""

# pixel_meta_for mirrored in SQL: w = 4 + doc_id%13, h = 4 + doc_id%11,
# base_c = doc_id*{37,59,83} % 128; every pixel in row y is base_c + y,
# so mean_c = base_c + (h-1)/2 exactly (no byte wrap: base<128, h<=14).
ORACLE_PIXELS = """
SELECT doc_id,
       ['png', 'ppm', 'gif'][(doc_id % 3)::INT + 1] AS format,
       (4 + doc_id % 13)::INT AS width,
       (4 + doc_id % 11)::INT AS height,
       round((doc_id * 37) % 128 + (4 + doc_id % 11 - 1) / 2.0, 6) AS mean_r,
       round((doc_id * 59) % 128 + (4 + doc_id % 11 - 1) / 2.0, 6) AS mean_g,
       round((doc_id * 83) % 128 + (4 + doc_id % 11 - 1) / 2.0, 6) AS mean_b
FROM documents
"""

# audio_meta_for mirrored in SQL: m = 4 + doc_id%9, base =
# -40 + doc_id*17 % 81, amp = 1 + doc_id%7, n_frames = m*(3+doc_id%5);
# flat sample k = base + amp*(k%m) and the sample count is a multiple
# of m, so mean/rms/peak have the closed forms below.
ORACLE_AUDIO = """
SELECT doc_id,
       ['pcm8', 'pcm16', 'pcm24', 'pcm32', 'f32'][(doc_id % 5)::INT + 1]
         AS codec,
       (8000 + (doc_id * 31) % 32000)::INT AS sample_rate,
       (1 + doc_id % 2)::INT AS channels,
       [8, 16, 24, 32, 32][(doc_id % 5)::INT + 1] AS bits,
       ((4 + doc_id % 9) * (3 + doc_id % 5))::BIGINT AS n_frames,
       round((4 + doc_id % 9) * (3 + doc_id % 5)
             / (8000.0 + (doc_id * 31) % 32000), 6) AS duration_sec,
       round((-40 + (doc_id * 17) % 81)
             + (1 + doc_id % 7) * (4 + doc_id % 9 - 1) / 2.0, 6) AS mean,
       round(sqrt(
         (-40 + (doc_id * 17) % 81) * (-40 + (doc_id * 17) % 81)
         + (-40 + (doc_id * 17) % 81) * (1 + doc_id % 7)
           * (4 + doc_id % 9 - 1)
         + (1 + doc_id % 7) * (1 + doc_id % 7) * (4 + doc_id % 9 - 1)
           * (2 * (4 + doc_id % 9) - 1) / 6.0), 6) AS rms,
       greatest(abs(-40 + (doc_id * 17) % 81),
                abs((-40 + (doc_id * 17) % 81)
                    + (1 + doc_id % 7) * (4 + doc_id % 9 - 1)))::DOUBLE
         AS peak
FROM documents
"""

# jpeg_meta_for mirrored in SQL: bw = 1 + doc_id%4, bh = 1 + doc_id%3,
# base = 16 + doc_id*13 % 64, step = 1 + doc_id%5; all nb = bw*bh
# blocks are equal-sized, so mean = base + step*(nb-1)/2 exactly.
# doc_id%8==4 (round 10) is the HIERARCHICAL residue class: a
# 16-aligned globally-flat image at value base (the only regime where
# the DHP pyramid round-trips exactly), so mean = base and the dims
# key off doc_id//8.
ORACLE_JPEG = """
SELECT doc_id,
       CASE WHEN doc_id % 8 = 2 THEN 'jpeg-lossless'
            WHEN doc_id % 8 = 4 THEN 'jpeg-hierarchical'
            ELSE 'jpeg' END AS format,
       CASE WHEN doc_id % 8 = 4 THEN (16 * (1 + (doc_id // 8) % 3))::INT
            ELSE (8 * (1 + doc_id % 4))::INT END AS width,
       CASE WHEN doc_id % 8 = 4 THEN (16 * (1 + (doc_id // 8) % 2))::INT
            ELSE (8 * (1 + doc_id % 3))::INT END AS height,
       round(CASE WHEN doc_id % 8 = 4 THEN 16 + (doc_id * 13) % 64
             ELSE 16 + (doc_id * 13) % 64
                  + (1 + doc_id % 5)
                    * ((1 + doc_id % 4) * (1 + doc_id % 3) - 1) / 2.0
             END, 6) AS mean_r,
       round(CASE WHEN doc_id % 8 = 4 THEN 16 + (doc_id * 13) % 64
             ELSE 16 + (doc_id * 13) % 64
                  + (1 + doc_id % 5)
                    * ((1 + doc_id % 4) * (1 + doc_id % 3) - 1) / 2.0
             END, 6) AS mean_g,
       round(CASE WHEN doc_id % 8 = 4 THEN 16 + (doc_id * 13) % 64
             ELSE 16 + (doc_id * 13) % 64
                  + (1 + doc_id % 5)
                    * ((1 + doc_id % 4) * (1 + doc_id % 3) - 1) / 2.0
             END, 6) AS mean_b
FROM documents
"""

def q_multimodal_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC round trip (round 9): per doc, ENCODE a real FLAC
    file — rice-coded fixed-predictor subframes, rotating stereo
    decorrelation (independent / left-side / right-side / mid-side),
    CRC-8 header + CRC-16 frame footers, STREAMINFO PCM MD5 — whose
    flat sample ``k`` holds ``100*(base + amp*(k % m))`` per
    `flac_meta_for`, then FULLY DECODE it (bit reader, coded frame
    numbers, rice/escape residuals, predictor reconstruction, channel
    recorrelation, every CRC and the MD5 verified) and report exact
    statistics. FLAC is LOSSLESS, so the oracle states every column in
    closed form — any bug on either side of the entropy coder, the
    predictors, or the stereo math shifts a statistic or trips a
    checksum and breaks equality."""
    docs = load_table(spark, sf_dir, "documents")
    out = extract_flac_stats(attach_flac_media(docs))
    return out.select(
        "doc_id",
        "codec",
        "sample_rate",
        "channels",
        "bits",
        "n_frames",
        "n_flac_frames",
        *[
            F.round(F.col(c), 6).alias(c)
            for c in ("duration_sec", "mean", "rms")
        ],
        "peak",
        "md5_ok",
    )


# flac_meta_for mirrored in SQL: m = 4 + doc_id%9, base/amp are the
# audio recipe x100, n_frames = m*(6 + doc_id%7), 48-sample FLAC
# blocks; lossless decode means the WAV-entry closed forms hold
# exactly and md5_ok is constitutionally TRUE (a corrupt stream raises
# in the engine instead of reporting FALSE).
ORACLE_FLAC = """
SELECT doc_id,
       'flac16' AS codec,
       (8000 + (doc_id * 31) % 32000)::INT AS sample_rate,
       (1 + doc_id % 2)::INT AS channels,
       16 AS bits,
       ((4 + doc_id % 9) * (6 + doc_id % 7))::BIGINT AS n_frames,
       (((4 + doc_id % 9) * (6 + doc_id % 7) + 47) // 48)::INT
         AS n_flac_frames,
       round((4 + doc_id % 9) * (6 + doc_id % 7)
             / (8000.0 + (doc_id * 31) % 32000), 6) AS duration_sec,
       round(100 * (-40 + (doc_id * 17) % 81)
             + 100 * (1 + doc_id % 7) * (4 + doc_id % 9 - 1) / 2.0, 6)
         AS mean,
       round(100 * sqrt(
         (-40 + (doc_id * 17) % 81) * (-40 + (doc_id * 17) % 81)
         + (-40 + (doc_id * 17) % 81) * (1 + doc_id % 7)
           * (4 + doc_id % 9 - 1)
         + (1 + doc_id % 7) * (1 + doc_id % 7) * (4 + doc_id % 9 - 1)
           * (2 * (4 + doc_id % 9) - 1) / 6.0), 6) AS rms,
       (100 * greatest(abs(-40 + (doc_id * 17) % 81),
                       abs((-40 + (doc_id * 17) % 81)
                           + (1 + doc_id % 7) * (4 + doc_id % 9 - 1))))::BIGINT
         AS peak,
       TRUE AS md5_ok
FROM documents
"""


def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL mixed-video round trip rotating THREE containers by
    doc_id % 3. (0) AVI/BI_RLE8: frame 0 a keyframe (with an
    absolute-mode ramp row), every later frame a DELTA that re-codes
    only the top half and leaves the bottom half to be INHERITED
    through the delta-escape skip; FULL decode (RIFF walk,
    strf/palette, idx1 keyframe flags, every RLE opcode, the
    persistent prior-frame surface). (1) Y4M: header tags, planar
    frames, nearest chroma upsample, BT.601 full-range with explicit
    floor(x+0.5). (2) animated GIF: frame 0 a full-canvas keyframe;
    every later frame an LZW-coded top-half sub-rectangle whose
    second row is TRANSPARENT and must inherit the canvas (still
    ``a``) — painting the transparent index, mis-placing the rect, or
    dropping the persistent canvas breaks the closed forms. All three
    codecs are exact, so the oracle states every statistic in closed
    form; ``row_moment`` is position-weighted so a mis-advanced delta
    or a dropped bottom-up flip breaks equality even when a bare mean
    would not."""
    docs = load_table(spark, sf_dir, "documents")
    out = extract_mixed_video_frames(attach_mixed_video_media(docs))
    return out.select(
        "doc_id",
        "format",
        "frame_idx",
        "width",
        "height",
        "keyframe",
        *[
            F.round(F.col(c), 6).alias(c)
            for c in ("mean_r", "mean_g", "mean_b", "row_moment")
        ],
    )


# mixed_video_meta_for mirrored in SQL, rotating by d%3 with q3=d//3.
# RLE8 (d%3=0): w=4*(1+d%5), s=2+d%4, h=2s; keyframe top = a (image
# row 0 an a..a+w-1 ramp), bottom = b; delta frame i's top =
# t_i = 14+(d*11+i*13)%60; palette r=j, g=2j, b=j+128 over the used
# index range, so channel means are integer-numerator / (w*h) forms.
# Y4M (d%3=1): flat planes (w keys off q3), BT.601 full-range restated
# with the identical floor(x+0.5) op order. GIF (d%3=2): w=3+q3%12,
# same s/h/a/b forms as RLE8; frame 0's top half is a, bottom b; frame
# i's top-half rect is t_i EXCEPT its transparent second row, which
# inherits the canvas (a) — so top indices are (s-1) rows of t_i plus
# one row of a, same palette forms. n_frames = 2+q3%3 for ALL kinds.
ORACLE_VIDEO = """
SELECT d.doc_id,
       CASE d.doc_id % 3 WHEN 0 THEN 'avi-rle8'
                         WHEN 1 THEN 'y4m'
                         ELSE 'gif-anim' END AS format,
       u.i::INT AS frame_idx,
       g.w::INT AS width,
       g.h::INT AS height,
       (d.doc_id % 3 = 1 OR u.i = 0) AS keyframe,
       CASE WHEN d.doc_id % 3 = 1
            THEN round(q.rr, 6)
            ELSE round(q.num_r / (g.w * g.h * 1.0), 6) END AS mean_r,
       CASE WHEN d.doc_id % 3 = 1
            THEN round(q.gg, 6)
            ELSE round((2 * q.num_r) / (g.w * g.h * 1.0), 6) END AS mean_g,
       CASE WHEN d.doc_id % 3 = 1
            THEN round(q.bb, 6)
            ELSE round((q.num_r + 128 * g.w * g.h) / (g.w * g.h * 1.0), 6)
            END AS mean_b,
       CASE WHEN d.doc_id % 3 = 1
            THEN round(q.rr * (g.h + 1) / 2.0, 6)
            ELSE round(q.num_m / (g.w * g.h * 1.0), 6) END AS row_moment
FROM documents d,
     LATERAL (
       SELECT UNNEST(generate_series(0, (1 + (d.doc_id // 3) % 3)::BIGINT))
              AS i
     ) u,
     LATERAL (
       SELECT CASE d.doc_id % 3
                   WHEN 0 THEN 4 * (1 + d.doc_id % 5)
                   WHEN 1 THEN 2 * (2 + (d.doc_id // 3) % 6)
                   ELSE 3 + (d.doc_id // 3) % 12 END AS w,
              CASE WHEN d.doc_id % 3 = 1 THEN 2 * (2 + d.doc_id % 5)
                   ELSE 2 * (2 + d.doc_id % 4) END AS h,
              2 + d.doc_id % 4 AS s,
              10 + (d.doc_id * 3) % 60 AS a,
              12 + (d.doc_id * 5) % 60 AS b
     ) g,
     LATERAL (
       SELECT CASE WHEN u.i = 0 THEN g.a
                   ELSE 14 + (d.doc_id * 11 + u.i * 13) % 60 END AS vtop,
              90 + (d.doc_id * 7 + u.i * 17) % 71 AS yv,
              (d.doc_id * 3 + u.i * 5) % 81 - 40 AS cbo,
              (d.doc_id * 11 + u.i * 7) % 81 - 40 AS cro
     ) p,
     LATERAL (
       SELECT CASE WHEN d.doc_id % 3 = 0
                   THEN g.w * p.vtop * g.s + g.w * g.b * g.s
                        + CASE WHEN u.i = 0
                               THEN (g.w * (g.w - 1)) // 2 ELSE 0 END
                   ELSE g.w * (p.vtop * (g.s - 1) + g.a) + g.w * g.b * g.s
                   END AS num_r,
              CASE WHEN d.doc_id % 3 = 0 THEN
                CASE WHEN u.i = 0
                     THEN g.w * g.a + (g.w * (g.w - 1)) // 2
                          + g.a * g.w * ((g.s * (g.s + 1)) // 2 - 1)
                          + g.b * g.w * (g.s * (2 * g.s + 1)
                                         - (g.s * (g.s + 1)) // 2)
                     ELSE p.vtop * g.w * ((g.s * (g.s + 1)) // 2)
                          + g.b * g.w * (g.s * (2 * g.s + 1)
                                         - (g.s * (g.s + 1)) // 2)
                     END
              ELSE g.w * (p.vtop * ((g.s * (g.s + 1)) // 2 - 2) + 2 * g.a)
                   + g.b * g.w * (g.s * (2 * g.s + 1)
                                  - (g.s * (g.s + 1)) // 2)
              END AS num_m,
              floor(p.yv + 1.402 * p.cro + 0.5) AS rr,
              floor(p.yv - 0.344136 * p.cbo - 0.714136 * p.cro + 0.5) AS gg,
              floor(p.yv + 1.772 * p.cbo + 0.5) AS bb
     ) q
"""


def q_multimodal_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF OPTION-MATRIX round trip (round 10): per doc, build one
    animation that exercises EVERY feature of the animated-GIF
    decoder — an interlaced full-canvas frame with a transparent row
    (must inherit the keyframe value), disposal 3 (the canvas must
    restore to the keyframe state), disposal 2 (the top row must
    restore to the background color), and a per-frame LOCAL color
    table whose channel mapping the global table cannot produce —
    then FULLY DECODE it via the shared container dispatch. Every
    composited canvas is stated in closed form by the oracle, so a
    decoder that paints transparency, mis-places interlaced rows,
    skips either restore, or drops the local table breaks equality
    (see `gif_meta_for` for the per-frame derivations)."""
    docs = load_table(spark, sf_dir, "documents")
    out = extract_mixed_video_frames(attach_gif_media(docs))
    return out.select(
        "doc_id",
        "format",
        "frame_idx",
        "width",
        "height",
        "keyframe",
        *[
            F.round(F.col(c), 6).alias(c)
            for c in ("mean_r", "mean_g", "mean_b", "row_moment")
        ],
    )


# gif_meta_for mirrored in SQL: w = 4 + d%5, h = 4 + d%3,
# a = 10+(d*7)%50, t = 20+(d*11)%50, u = 30+(d*13)%40, v = 5+d%20;
# palette r=j, g=2j, b=j+128 for global-table frames; the local table
# maps v -> (200-v, (3v)%100, v). W1 = h(h+1)/2 is the row-weight sum,
# KI = W1-1-h the interior-rows weight sum, inner = (w-2)(h-2).
# frame 0: flat a. frame 1: t everywhere except row 1 = a (transparent
# hole), THEN restored (disposal 3). frame 2: row 0 = u over flat a,
# THEN row 0 -> background (0,0,128) (disposal 2). frame 3: row 0 =
# background, interior = local rgb, border = a.
ORACLE_GIF = """
SELECT d.doc_id,
       'gif-anim' AS format,
       u.i::INT AS frame_idx,
       g.w::INT AS width,
       g.h::INT AS height,
       (u.i = 0) AS keyframe,
       round(CASE u.i
             WHEN 0 THEN g.a::DOUBLE
             WHEN 1 THEN (g.t * (g.h - 1) + g.a) / (g.h * 1.0)
             WHEN 2 THEN (g.u2 + g.a * (g.h - 1)) / (g.h * 1.0)
             ELSE (g.a * g.border + (200 - g.v) * g.inner)
                  / (g.w * g.h * 1.0)
             END, 6) AS mean_r,
       round(CASE u.i
             WHEN 0 THEN 2.0 * g.a
             WHEN 1 THEN 2.0 * (g.t * (g.h - 1) + g.a) / g.h
             WHEN 2 THEN 2.0 * (g.u2 + g.a * (g.h - 1)) / g.h
             ELSE (2 * g.a * g.border + ((3 * g.v) % 100) * g.inner)
                  / (g.w * g.h * 1.0)
             END, 6) AS mean_g,
       round(CASE u.i
             WHEN 0 THEN g.a + 128.0
             WHEN 1 THEN (g.t * (g.h - 1) + g.a) / (g.h * 1.0) + 128
             WHEN 2 THEN (g.u2 + g.a * (g.h - 1)) / (g.h * 1.0) + 128
             ELSE (128 * g.w + (g.a + 128) * g.border + g.v * g.inner)
                  / (g.w * g.h * 1.0)
             END, 6) AS mean_b,
       round(CASE u.i
             WHEN 0 THEN g.a * (g.h + 1) / 2.0
             WHEN 1 THEN (g.t * (g.w1 - 2) + 2 * g.a) / (g.h * 1.0)
             WHEN 2 THEN (g.u2 + g.a * (g.w1 - 1)) / (g.h * 1.0)
             ELSE (g.a * (g.w * (g.w1 - 1) - (g.w - 2) * g.ki)
                   + (200 - g.v) * (g.w - 2) * g.ki)
                  / (g.w * g.h * 1.0)
             END, 6) AS row_moment
FROM documents d,
     LATERAL (SELECT UNNEST(generate_series(0, 3)) AS i) u,
     LATERAL (
       SELECT w, h, a, t, u2, v,
              h * (h + 1) // 2 AS w1,
              h * (h + 1) // 2 - 1 - h AS ki,
              (w - 2) * (h - 2) AS inner,
              w * (h - 1) - (w - 2) * (h - 2) AS border
       FROM (SELECT 4 + d.doc_id % 5 AS w,
                    4 + d.doc_id % 3 AS h,
                    10 + (d.doc_id * 7) % 50 AS a,
                    20 + (d.doc_id * 11) % 50 AS t,
                    30 + (d.doc_id * 13) % 40 AS u2,
                    5 + d.doc_id % 20 AS v)
     ) g
"""


MM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_features": q_multimodal_features,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_pixels": q_multimodal_pixels,
    "multimodal_audio": q_multimodal_audio,
    "multimodal_jpeg": q_multimodal_jpeg,
    "multimodal_flac": q_multimodal_flac,
    "multimodal_video": q_multimodal_video,
    "multimodal_gif": q_multimodal_gif,
}

MM_ORACLES: dict[str, str] = {
    "multimodal_features": ORACLE_FEATURES,
    "multimodal_frames": ORACLE_FRAMES,
    "multimodal_decode": ORACLE_DECODE,
    "multimodal_pixels": ORACLE_PIXELS,
    "multimodal_audio": ORACLE_AUDIO,
    "multimodal_jpeg": ORACLE_JPEG,
    "multimodal_flac": ORACLE_FLAC,
    "multimodal_video": ORACLE_VIDEO,
    "multimodal_gif": ORACLE_GIF,
}
