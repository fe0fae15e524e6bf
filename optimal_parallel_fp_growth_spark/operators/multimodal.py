"""Multimodal-column plumbing (driver north star; SURVEY §7.2 M7).

Model: media lives in an opaque ``payload: binary`` column with a typed
metadata struct alongside. Decode/feature-extract runs as Arrow-batched
``mapInPandas`` — the Spark-side shape (schema, partitioning, batch
iteration, one-to-many expansion) is real and tested at scale semantics;
only the innermost byte-decode is a STUB.

CODEC STATUS: this container has no codec libraries (no PIL/
ffmpeg/librosa), but the pure-Python/stdlib decode surface now covers
(a) header metadata for PNG/GIF/BMP/JPEG/WAV (``decode_real``, round
5) and MP4/ISO-BMFF box-tree track dims (round 6), (b) FULL pixel decode for raw netpbm P5/P6 (round 5), for PNG
at EVERY legal depth/color combination (1/2/4/8/16-bit) in BOTH
interlace methods — real zlib inflate + all five scanline filters +
per-pass Adam7 unfiltering + MSB-first sub-byte unpacking
(``decode_png_pixels``, round 6) — for GIF, with a real
variable-width LZW decoder (CLEAR/EOI, KwKwK, 12-bit overflow;
``decode_gif_pixels``, round 6), and for JPEG — baseline AND progressive (SOF2 spectral selection +
DC successive approximation), grayscale through 4:2:0
(``decode_jpeg_pixels``, round 6; 12-bit extended-sequential SOF1
added round 7) — plus (c) FULL WAV
sample decode: unsigned-8 / signed-16/24/32 PCM, IEEE float32, and
G.711 mu-law/A-law, and IMA ADPCM frames parsed and reduced to
exact mean/rms/peak/duration (``decode_wav_samples``, round 6),
(d) compressed-audio FRAME WALKS (round 7): MPEG Layer III
(``decode_mp3_frames`` — ID3/Xing/VBR, duration + bitrate) and AAC
ADTS (``decode_aac_adts``), and (e) REAL VIDEO FRAME DECODE (round
7): AVI/MJPEG RIFF walk with every '00dc' chunk pixel-decoded
through the JPEG decoder (``decode_avi_frames``); round 9 adds the
TABLE-FREE slice of the inter-frame seam in operators/video.py —
BI_RLE8-in-AVI (compressed, delta frames inheriting the prior
surface through the 00 02 escape) and YUV4MPEG2 (planar frames,
BT.601 closed form), wired here as
``attach_mixed_video_media``/``extract_mixed_video_frames`` and as
the 'avi'/'y4m' header branches of the now-12-format
``decode_real`` rotation.
``NotImplementedError`` now marks only the genuinely library-bound
seam: arithmetic-coded JPEG, MP3/AAC SAMPLE decode,
and inter-frame video codecs (H.264 etc.). The MP3/AAC seam was
re-evaluated round 9 and is TABLE-bound, not effort-bound: every
MPEG-1 audio layer's PCM path ends in the polyphase synthesis
whose 512-tap prototype window is a normative spec TABLE (ISO
11172-3 Table B.3 — quantized by hand, no closed form), and AAC-LC
needs the 11 spectral huffman codebooks (13818-7 normative tables);
this container has no spec text, codec library, or network to source
them from, and re-deriving ~1500 published constants from memory
risks silently-wrong PCM — strictly worse than a loud seam. All
closed-form stages around the seam ARE real (frame walk, side-info
geometry, Xing cross-check); the moment a table source is available
the remaining work is requantize → IMDCT (closed-form cosines) →
windowed overlap-add.
``build_payload``/``build_png_pixels``/``build_gif_pixels``/
``build_wav_samples`` construct spec-valid files (the GIF twin runs
a real LZW ENCODER) so the build→parse round trips are
oracle-checked (`multimodal_decode`, `multimodal_pixels`,
`multimodal_audio`); ``_decode_stub`` (md5-derived fake features)
remains for the feature-extraction pipeline whose kernels genuinely
need codecs.

The test tables carry no media, so ``attach_payload`` manufactures the
binary column from ``documents.text`` (utf-8 bytes) — stand-in payloads
with realistic per-row sizes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODALITIES = ("image", "audio", "video")

FEATURES_SCHEMA = (
    "doc_id long, modality string, n_bytes long, width int, height int, "
    "f0 double, f1 double, f2 double, f3 double"
)

FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"



def _spread_for_codec(df: "DataFrame") -> "DataFrame":
    """Codec stages are COMPUTE-bound, not IO-bound: left on the scan's
    partitioning, a single parquet file pins the whole mapInPandas
    encode/decode to ONE core (measured at sf0.1: documents = 1 input
    partition → the AVI stage ran serial). A round-robin exchange of
    the tiny (doc_id[, text]) projection costs microseconds per row;
    serializing the codec costs the whole stage. Only widens — never
    shrinks — the partition count, so cluster-scale inputs with
    healthy partitioning pass through untouched."""
    if df.isStreaming:
        # .rdd is illegal on a stream, and micro-batch partitioning is
        # the source's concern (maxFilesPerTrigger etc.) — pass through
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, payload: binary, meta: struct<modality, n_bytes,
    content_md5>). The metadata struct is computed JVM-side. Spread
    across cores like every codec source (_spread_for_codec): the
    downstream Python feature/frame extractors are compute-bound."""
    payload = F.encode(F.col(text_col), "utf-8")
    docs = _spread_for_codec(docs)
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.element_at(
                F.array(*[F.lit(m) for m in MODALITIES]),
                (F.col("doc_id") % len(MODALITIES) + 1).cast("int"),
            ).alias("modality"),
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        ).alias("meta"),
    )


def _parse_guard(fn):
    """Decoder entry points promise exactly one failure mode for bytes
    they cannot handle: ``NotImplementedError`` naming the seam. A
    corrupt or truncated payload must not leak parser internals
    (IndexError off a short buffer, zlib/struct errors, int() on
    garbage) — inside a mapInPandas batch that distinction is the
    difference between a documented seam and an opaque task failure."""
    import functools

    @functools.wraps(fn)
    def wrapped(payload, *a, **kw):
        import struct
        import zlib

        try:
            return fn(payload, *a, **kw)
        except NotImplementedError:
            raise
        except (IndexError, KeyError, ValueError, OverflowError,
                ZeroDivisionError, StopIteration, struct.error,
                zlib.error) as e:
            # ZeroDivisionError: zero-dimension headers (0x0 PNG/GIF,
            # 'P6 0 0') reach the channel-mean divide if a decoder
            # misses its explicit zero-dim reject — quarantine, never
            # fail the whole mapInPandas task (ADVICE r6).
            raise NotImplementedError(
                f"corrupt or unsupported payload ({fn.__name__}: "
                f"{type(e).__name__}: {e})"
            ) from e

    return wrapped


@_parse_guard
def decode_real(payload: bytes) -> dict:
    """Real header decode across the thirteen supported container
    formats, parsed from the actual file bytes: PNG / GIF / BMP / JPEG
    image dimensions, WAV rate/channels, MP4 box-tree dims, AVI avih
    dims, Y4M stream-header dims, MP3/AAC frame walks, the FULL
    CRC+MD5-verified FLAC sample decode, the CRC-checked Ogg/Opus
    page walk, and animated-GIF detection (round 10: a strict block
    walk counts image descriptors whenever a global color table is
    present and reports ``gif-anim`` for multi-frame files). Only the
    table-bound codecs (MP3/AAC PCM, SILK/CELT, arithmetic JPEG) still
    raise ``NotImplementedError`` — the swap-in seam for a codec
    library.

    Returns ``{"format", "width", "height", "sample_rate",
    "channels"}`` with ``None`` for inapplicable fields.
    """
    out = {
        "format": None,
        "width": None,
        "height": None,
        "sample_rate": None,
        "channels": None,
    }
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # signature, then IHDR must be first chunk: len(4) 'IHDR' w(4BE) h(4BE)
        if payload[12:16] != b"IHDR" or len(payload) < 24:
            raise NotImplementedError("corrupt PNG: IHDR not first chunk")
        out["format"] = "png"
        out["width"] = int.from_bytes(payload[16:20], "big")
        out["height"] = int.from_bytes(payload[20:24], "big")
        return out
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        out["format"] = "gif"
        out["width"] = int.from_bytes(payload[6:8], "little")
        out["height"] = int.from_bytes(payload[8:10], "little")
        # Animation detection (round 10): a global color table means
        # the file claims self-contained rendering, so its block
        # structure must WALK — count image descriptors strictly and
        # report 'gif-anim' for a multi-frame file. Header-and-filler
        # GIFs (no GCT) keep the legacy header-only tier.
        if len(payload) > 10 and payload[10] & 0x80:
            pos = 13 + 3 * (2 << (payload[10] & 0x07))
            n_images = 0
            saw_trailer = False
            while pos < len(payload):
                b0 = payload[pos]
                if b0 == 0x21:  # extension: label + sub-blocks
                    pos += 2
                    while pos < len(payload) and payload[pos] != 0:
                        pos += 1 + payload[pos]
                    pos += 1
                elif b0 == 0x2C:  # image descriptor
                    if pos + 10 > len(payload):
                        raise NotImplementedError(
                            "truncated GIF image descriptor"
                        )
                    ip = payload[pos + 9]
                    pos += 10
                    if ip & 0x80:
                        pos += 3 * (2 << (ip & 0x07))
                    pos += 1  # LZW min code size
                    while pos < len(payload) and payload[pos] != 0:
                        pos += 1 + payload[pos]
                    pos += 1
                    n_images += 1
                elif b0 == 0x3B:
                    pos += 1
                    saw_trailer = True
                    break
                else:
                    raise NotImplementedError(
                        f"unknown GIF block 0x{b0:02x}"
                    )
            if pos > len(payload):
                raise NotImplementedError("truncated GIF block structure")
            if not saw_trailer:
                # a payload ending exactly at a block boundary with no
                # 0x3B is still structurally truncated — fail closed
                # like every other violation in this walk
                raise NotImplementedError("missing GIF trailer")
            if n_images >= 2:
                out["format"] = "gif-anim"
        return out
    if payload[:2] == b"BM" and len(payload) >= 26:
        # BITMAPINFOHEADER: signed little-endian dims at offsets 18/22
        # (negative height encodes top-down row order)
        out["format"] = "bmp"
        out["width"] = abs(
            int.from_bytes(payload[18:22], "little", signed=True)
        )
        out["height"] = abs(
            int.from_bytes(payload[22:26], "little", signed=True)
        )
        return out
    if payload[:2] == b"\xff\xd8":
        # walk marker segments to the first SOF (C0-CF minus C4/C8/CC);
        # dims live at +5 (height) / +7 (width), big-endian
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                break
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                out["format"] = "jpeg"
                out["height"] = int.from_bytes(
                    payload[pos + 5 : pos + 7], "big"
                )
                out["width"] = int.from_bytes(
                    payload[pos + 7 : pos + 9], "big"
                )
                return out
            pos += 2 + seg_len
        raise NotImplementedError("JPEG without SOF marker")
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        # AVI (round 9): the avih main header carries the container
        # dims; FULL frame decode lives in decode_avi_frames (MJPEG)
        # and operators/video.py::decode_avi_rle8_frames (BI_RLE8).
        from optimal_parallel_fp_growth_spark.operators.video import (
            _riff_walk,
        )

        for cid, s, e in _riff_walk(payload, 12, len(payload)):
            if cid == b"LIST" and payload[s : s + 4] == b"hdrl":
                for c2, s2, e2 in _riff_walk(payload, s + 4, e):
                    if c2 == b"avih" and e2 - s2 >= 40:
                        out["format"] = "avi"
                        out["width"] = int.from_bytes(
                            payload[s2 + 32 : s2 + 36], "little"
                        )
                        out["height"] = int.from_bytes(
                            payload[s2 + 36 : s2 + 40], "little"
                        )
                        return out
        raise NotImplementedError("AVI without avih main header")
    if payload.startswith(b"YUV4MPEG2"):
        # YUV4MPEG2 (round 9): plain-text stream header; FULL planar
        # frame decode lives in operators/video.py::decode_y4m_frames.
        from optimal_parallel_fp_growth_spark.operators.video import (
            decode_y4m_frames,
        )

        info = decode_y4m_frames(payload, header_only=True)
        out["format"] = "y4m"
        out["width"] = info["width"]
        out["height"] = info["height"]
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # 'fmt ' chunk: channels at +10 (2LE), sample rate at +12 (4LE)
        pos = 12
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            if cid == b"fmt ":
                out["format"] = "wav"
                out["channels"] = int.from_bytes(
                    payload[pos + 10 : pos + 12], "little"
                )
                out["sample_rate"] = int.from_bytes(
                    payload[pos + 12 : pos + 16], "little"
                )
                return out
            pos += 8 + clen + (clen % 2)
        raise NotImplementedError("WAV without fmt chunk")
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        # MP4/ISO-BMFF (round 6): the container is a pure box tree —
        # [size:4 BE][type:4][payload] — so track metadata is struct
        # walking, no codec. Video dims come from the first trak's
        # tkhd (16.16 fixed point); only the SAMPLE data (H.264 etc.)
        # genuinely needs codec libraries.
        def boxes(buf, pos, end):
            while pos + 8 <= end:
                size = int.from_bytes(buf[pos : pos + 4], "big")
                if size < 8 or pos + size > end:
                    raise NotImplementedError("corrupt MP4 box size")
                yield buf[pos + 4 : pos + 8], pos + 8, pos + size
                pos += size

        def find(buf, pos, end, name):
            for t, s, e in boxes(buf, pos, end):
                if t == name:
                    return s, e
            return None

        moov = find(payload, 0, len(payload), b"moov")
        if moov is None:
            raise NotImplementedError("MP4 without moov box")
        out["format"] = "mp4"
        for t, s, e in boxes(payload, *moov):
            if t == b"trak":
                tkhd = find(payload, s, e, b"tkhd")
                if tkhd is None:
                    continue
                ts = tkhd[0]
                # tkhd v0: ver/flags 4 + times 8 + id 4 + rsvd 4 +
                # duration 4 + rsvd 8 + layer/alt/vol/rsvd 8 +
                # matrix 36 → width at +76, height at +80 (16.16)
                w = int.from_bytes(payload[ts + 76 : ts + 80], "big") >> 16
                h = int.from_bytes(payload[ts + 80 : ts + 84], "big") >> 16
                if w and h:
                    out["width"] = w
                    out["height"] = h
                    return out
        return out  # audio-only / metadata-only MP4: format alone
    if payload[:4] == b"OggS":
        # Ogg/Opus (round 9): page walk with every CRC verified,
        # packets reassembled, OpusHead parsed. Opus AUDIO decode
        # (SILK/CELT) is the library-bound seam.
        info = decode_ogg_opus(payload)
        out["format"] = info["format"]
        out["sample_rate"] = info["sample_rate"]
        out["channels"] = info["channels"]
        return out
    if payload[:4] == b"fLaC":
        # FLAC (round 9): FULL sample decode — the codec is table-free
        # (operators/flac.py), so unlike MP3/AAC the real PCM path is
        # implementable here; header fields come from the verified
        # decode, not a shallow peek.
        from optimal_parallel_fp_growth_spark.operators.flac import (
            decode_flac_samples,
        )

        info = decode_flac_samples(payload)
        out["format"] = "flac"
        out["sample_rate"] = info["sample_rate"]
        out["channels"] = info["channels"]
        return out
    if payload[:3] == b"ID3" or _mp3_sync_at(payload, 0):
        # MPEG-1/2/2.5 Layer III (round 7): the frame-header walk is
        # pure byte layout — sample rate / channel mode live in every
        # 4-byte frame header. Sample DECODE (Huffman + IMDCT +
        # polyphase synthesis) genuinely needs a codec library; the
        # walk is the honest native tier (see decode_mp3_frames for
        # frame counts / duration / bitrate).
        info = decode_mp3_frames(payload)
        out["format"] = "mp3"
        out["sample_rate"] = info["sample_rate"]
        out["channels"] = info["channels"]
        return out
    if _adts_sync_at(payload, 0):
        # AAC in ADTS framing (round 7): layer bits 00 distinguish it
        # from the MPEG-audio sync handled above.
        info = decode_aac_adts(payload)
        out["format"] = "aac"
        out["sample_rate"] = info["sample_rate"]
        out["channels"] = info["channels"]
        return out
    raise NotImplementedError(
        "unsupported media format (PNG/GIF/BMP/JPEG/MP4/AVI/Y4M/MP3/AAC "
        "headers and WAV fmt are parsed natively; full pixel/sample decode "
        "of table-bound codecs requires codec libraries not present in "
        "this container)"
    )


# ---------------------------------------------------------------------------
# MP3 (MPEG audio Layer III) frame walk — round 7. Public spec byte
# layout (ISO/IEC 11172-3 §2.4.1 / 13818-3): every frame starts with a
# 4-byte header — 11-bit syncword, version, layer, bitrate index,
# sample-rate index, padding bit, channel mode — and its byte length is
# fully determined by (version, bitrate, sample rate, padding), so a
# strict walk yields frame count, duration, and average bitrate with no
# codec. Reference parity: the reference engine has no audio codecs at
# all; this extends the engine's media-metadata surface (SURVEY.md
# north-star), mirroring decode_real's other container walks.
# ---------------------------------------------------------------------------

# bitrate tables (kbps) for Layer III; index 0 = "free format" (frame
# length not derivable from the header alone → documented seam),
# index 15 invalid.
_MP3_BITRATES_KBPS = {
    # version key: 1 = MPEG-1; 2 = MPEG-2 and MPEG-2.5 (shared table)
    1: (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    2: (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_SAMPLERATES = {
    # header version bits (b1>>3)&3 → sample-rate table (index 3 invalid)
    0: (11025, 12000, 8000),   # MPEG-2.5
    2: (22050, 24000, 16000),  # MPEG-2
    3: (44100, 48000, 32000),  # MPEG-1
}


def _mp3_sync_at(payload: bytes, pos: int) -> bool:
    """11 set bits + a non-reserved version + Layer III at ``pos``?"""
    if pos + 4 > len(payload):
        return False
    b1 = payload[pos + 1]
    return (
        payload[pos] == 0xFF
        and (b1 & 0xE0) == 0xE0
        and ((b1 >> 3) & 3) != 1  # version 1 = reserved
        and ((b1 >> 1) & 3) == 1  # layer bits 01 = Layer III
    )


def _mp3_frame_at(payload: bytes, pos: int) -> dict:
    """Parse the 4-byte frame header at ``pos`` → dict with
    sample_rate, channels, bitrate_kbps, samples (per frame), and the
    full frame byte length. Raises NotImplementedError for reserved /
    free-format / invalid field values."""
    if not _mp3_sync_at(payload, pos):
        raise NotImplementedError(f"MP3 sync lost at byte {pos}")
    b1, b2, b3 = payload[pos + 1], payload[pos + 2], payload[pos + 3]
    vbits = (b1 >> 3) & 3
    vkey = 1 if vbits == 3 else 2
    br_idx = (b2 >> 4) & 0xF
    if br_idx == 15:
        raise NotImplementedError("MP3 bitrate index 15 is invalid")
    bitrate = _MP3_BITRATES_KBPS[vkey][br_idx]
    if bitrate is None:
        raise NotImplementedError(
            "MP3 free-format bitrate (index 0) not supported: frame "
            "length is not derivable from the header alone"
        )
    sr_idx = (b2 >> 2) & 3
    if sr_idx == 3:
        raise NotImplementedError("MP3 sample-rate index 3 is reserved")
    sample_rate = _MP3_SAMPLERATES[vbits][sr_idx]
    padding = (b2 >> 1) & 1
    mode = (b3 >> 6) & 3
    samples = 1152 if vkey == 1 else 576  # Layer III per-frame samples
    length = (samples // 8) * bitrate * 1000 // sample_rate + padding
    return {
        "version": "1" if vbits == 3 else ("2" if vbits == 2 else "2.5"),
        "sample_rate": sample_rate,
        "channels": 1 if mode == 3 else 2,
        "bitrate_kbps": bitrate,
        "samples": samples,
        "length": length,
    }


def _skip_id3v2(payload: bytes) -> int:
    """Byte offset of the first audio frame past an ID3v2 tag (0 if
    none): 'ID3' + version(2) + flags(1) + synchsafe size(4), plus a
    10-byte footer when flag bit 4 is set."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    flags = payload[5]
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            raise NotImplementedError("ID3v2 size bytes must be synchsafe")
        size = (size << 7) | b
    return 10 + size + (10 if flags & 0x10 else 0)


@_parse_guard
def decode_mp3_frames(payload: bytes) -> dict:
    """Strict whole-stream MP3 frame walk: skip any leading ID3v2 tag,
    then require back-to-back valid Layer III frames until end of
    buffer (a trailing 128-byte ID3v1 'TAG' block is allowed). Every
    frame's (version, sample rate, channel mode) must agree — a
    mid-stream change means a corrupt or concatenated file. Returns
    ``{"format", "version", "sample_rate", "channels", "n_frames",
    "duration_ms", "bitrate_kbps", "vbr", "xing_frames"}``: duration
    is frames x samples-per-frame / rate; bitrate_kbps is the
    byte-weighted average (== the constant rate for CBR); vbr is True
    when frame bitrates vary OR the first frame carries a 'Xing' (as
    opposed to 'Info') header, whose frame count — when present — is
    cross-checked against the walked count."""
    pos = _skip_id3v2(payload)
    end = len(payload)
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    first = _mp3_frame_at(payload, pos)
    n_frames = 0
    audio_bytes = 0
    rates = set()
    xing_frames = None
    vbr_magic = False
    while pos < end:
        fr = _mp3_frame_at(payload, pos)
        if (fr["version"], fr["sample_rate"], fr["channels"]) != (
            first["version"], first["sample_rate"], first["channels"]
        ):
            raise NotImplementedError(
                "MP3 stream parameters change mid-stream (corrupt or "
                "concatenated file)"
            )
        if pos + fr["length"] > end:
            raise NotImplementedError("truncated final MP3 frame")
        if n_frames == 0:
            # Xing/Info header sits after the side-info block: 32 bytes
            # for MPEG-1 stereo, 17 mono; MPEG-2/2.5 halve to 17/9.
            side = (
                (17 if fr["channels"] == 1 else 32)
                if fr["version"] == "1"
                else (9 if fr["channels"] == 1 else 17)
            )
            tag_at = pos + 4 + side
            magic = payload[tag_at : tag_at + 4]
            if magic in (b"Xing", b"Info"):
                vbr_magic = magic == b"Xing"
                flags = int.from_bytes(
                    payload[tag_at + 4 : tag_at + 8], "big"
                )
                if flags & 1:
                    xing_frames = int.from_bytes(
                        payload[tag_at + 8 : tag_at + 12], "big"
                    )
        rates.add(fr["bitrate_kbps"])
        audio_bytes += fr["length"]
        n_frames += 1
        pos += fr["length"]
    if n_frames == 0:
        raise NotImplementedError("no MP3 frames found")
    if xing_frames is not None and xing_frames != n_frames:
        raise NotImplementedError(
            f"Xing frame count {xing_frames} != walked {n_frames}"
        )
    duration_s = n_frames * first["samples"] / first["sample_rate"]
    return {
        "format": "mp3",
        "version": first["version"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "duration_ms": int(round(duration_s * 1000)),
        "bitrate_kbps": round(audio_bytes * 8 / duration_s / 1000, 3),
        "vbr": len(rates) > 1 or vbr_magic,
        "xing_frames": xing_frames,
    }


def build_mp3_frames(
    n_frames: int,
    sample_rate: int = 44100,
    bitrate_kbps: int | list[int] = 128,
    channels: int = 2,
    padding: list[int] | None = None,
    id3_text: bytes = b"",
    xing: bool = False,
    filler: bytes = b"\x00",
) -> bytes:
    """Builder twin for :func:`decode_mp3_frames`: spec-valid MPEG
    Layer III frame sequences with exact header-derived lengths (frame
    bodies are filler bytes — a header walk never reads them), an
    optional ID3v2 wrapper around ``id3_text``, per-frame padding
    bits, per-frame bitrates (pass a list for VBR), and an optional
    Xing header carrying the frame count."""
    if n_frames <= 0:
        raise ValueError("n_frames must be positive")
    for tbl_key, srs in _MP3_SAMPLERATES.items():
        if sample_rate in srs:
            vbits = tbl_key
            break
    else:
        raise ValueError(f"no MPEG version has sample rate {sample_rate}")
    vkey = 1 if vbits == 3 else 2
    rates = (
        list(bitrate_kbps)
        if isinstance(bitrate_kbps, (list, tuple))
        else [bitrate_kbps] * n_frames
    )
    if len(rates) != n_frames:
        raise ValueError("bitrate list length must equal n_frames")
    pads = padding or [0] * n_frames
    out = bytearray()
    if id3_text:
        body = b"TXXX" + id3_text
        size = len(body)
        ss = bytes(
            (size >> s) & 0x7F for s in (21, 14, 7, 0)
        )
        out += b"ID3\x04\x00\x00" + ss + body
    samples = 1152 if vkey == 1 else 576
    for i in range(n_frames):
        br_idx = _MP3_BITRATES_KBPS[vkey].index(rates[i])
        sr_idx = _MP3_SAMPLERATES[vbits].index(sample_rate)
        b1 = 0xE0 | (vbits << 3) | (1 << 1) | 1  # sync|ver|layer III|no CRC
        b2 = (br_idx << 4) | (sr_idx << 2) | (pads[i] << 1)
        b3 = (0xC0 if channels == 1 else 0x00)
        header = bytes((0xFF, b1, b2, b3))
        length = (samples // 8) * rates[i] * 1000 // sample_rate + pads[i]
        body = bytearray(
            filler[j % len(filler)] for j in range(length - 4)
        )
        if i == 0 and xing:
            side = (
                (17 if channels == 1 else 32)
                if vkey == 1
                else (9 if channels == 1 else 17)
            )
            at = side  # offset within body (header already excluded)
            tag = b"Xing" + (1).to_bytes(4, "big") + n_frames.to_bytes(4, "big")
            if at + len(tag) > len(body):
                # slice assignment would EXTEND the body and corrupt
                # every frame boundary after it — fail loudly instead
                raise ValueError(
                    "first frame too small to hold a Xing header at "
                    f"{rates[0]} kbps / {sample_rate} Hz"
                )
            body[at : at + len(tag)] = tag
        out += header + bytes(body)
    return bytes(out)


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3) — round 7. The predictor-based process from the
# original spec (ITU T.81 Annex H): no DCT, no quantization — each
# sample's difference from one of seven neighbor predictions is
# Huffman-coded with DC-style magnitude categories, modulo-2^16
# arithmetic. Still used by DICOM and camera raws; decodes bit-exact
# with stdlib only, closing the "lossless" entry of the JPEG seam.
# ---------------------------------------------------------------------------

# DC-category table covering 0..16 (category 16 is the special
# no-extra-bits 32768 diff that lossless needs); canonical lengths
# 2..14, Annex-K prefix extended one value per deeper level.
_JPEG_DCL_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0)
_JPEG_DCL_VALS = tuple(range(17))


def _lossless_predict(recon, y, x, c, ncomp, width, P, Al, predictor):
    """Prediction Px per spec H.1.2.1 — Ra = left, Rb = above,
    Rc = above-left; first sample 2^(P-1-Al), first line uses Ra
    after the first sample, first column uses Rb."""
    row = y * width * ncomp
    prow = (y - 1) * width * ncomp
    if y == 0 and x == 0:
        return 1 << (P - 1 - Al)
    if y == 0:
        return recon[row + (x - 1) * ncomp + c]
    if x == 0:
        return recon[prow + c]
    ra = recon[row + (x - 1) * ncomp + c]
    rb = recon[prow + x * ncomp + c]
    rc = recon[prow + (x - 1) * ncomp + c]
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    if predictor == 7:
        return (ra + rb) >> 1
    raise NotImplementedError(f"lossless predictor {predictor} invalid")


@_parse_guard
def decode_jpeg_lossless(payload: bytes) -> dict:
    """Decode a lossless (SOF3) JPEG: marker walk, DHT, then the
    predictor/difference scan per Annex H — modulo-2^16 sample
    reconstruction, category-16 handling, restart-interval prediction
    resets. Components must be 1x1-sampled (sample-interleaved);
    returns the same mean_r/g/b shape as the DCT decoder, with means
    over the native 0..2^P-1 domain (grayscale repeats its mean;
    3-component lossless is direct RGB per common practice)."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload (no SOI)")
    huff: dict = {}
    sof = None
    restart_interval = 0
    pos = 2
    out_samples = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("JPEG marker stream out of sync")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = {
                    (ln, code): v
                    for ln, code, v in _jpeg_canonical(bits, vals)
                }
                i += 17 + n
        elif marker == 0xC3:
            P, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if not 2 <= P <= 16:
                raise NotImplementedError(f"lossless precision {P} invalid")
            if w == 0 or h == 0:
                raise NotImplementedError("zero-dimension JPEG frame")
            comps = []
            for k in range(ncomp):
                cid, samp, _tq = body[6 + 3 * k : 9 + 3 * k]
                if samp != 0x11:
                    raise NotImplementedError(
                        "lossless decode supports 1x1 sampling only"
                    )
                comps.append(cid)
            sof = (P, h, w, comps)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "not a lossless (SOF3) JPEG — use decode_jpeg_pixels"
            )
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if sof is None:
                raise NotImplementedError("JPEG SOS before SOF3")
            P, h, w, comps = sof
            ns = body[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "lossless decode requires a single interleaved scan"
                )
            tabs = [body[2 + 2 * k] >> 4 for k in range(ns)]
            predictor = body[1 + 2 * ns]
            al = body[3 + 2 * ns] & 0xF
            if not 1 <= predictor <= 7:
                raise NotImplementedError(
                    f"lossless predictor {predictor} out of range"
                )
            ncomp = len(comps)
            recon = [0] * (w * h * ncomp)
            reader = _JpegBitReader(payload, pos + 2 + seg_len)
            tables = [huff.get((0, t)) for t in tabs]
            if any(t is None for t in tables):
                raise NotImplementedError("lossless scan references missing DHT")
            if restart_interval:
                raise NotImplementedError(
                    "restart intervals in lossless JPEG not supported "
                    "(documented seam; the builder twin never emits DRI)"
                )
            idx = 0
            for y in range(h):
                for x in range(w):
                    for c in range(ncomp):
                        ssss = reader.read_huffman(tables[c])
                        if ssss == 16:
                            diff = 32768
                        elif ssss == 0:
                            diff = 0
                        else:
                            v = reader.receive(ssss)
                            diff = (
                                v
                                if v >= (1 << (ssss - 1))
                                else v - (1 << ssss) + 1
                            )
                        if idx == 0:
                            px = 1 << (P - 1 - al)
                        else:
                            px = _lossless_predict(
                                recon, y, x, c, ncomp, w, P, al, predictor
                            )
                        recon[idx] = (px + diff) & 0xFFFF
                        idx += 1
            out_samples = (P, h, w, ncomp, al, recon)
            break
        pos += 2 + seg_len
    if out_samples is None:
        raise NotImplementedError("lossless JPEG without a decoded scan")
    P, h, w, ncomp, al, recon = out_samples
    n = w * h
    if ncomp == 1:
        m = sum(v << al for v in recon) / n
        means = (m, m, m)
    elif ncomp == 3:
        means = tuple(
            sum(recon[i * 3 + c] << al for i in range(n)) / n
            for c in range(3)
        )
    else:
        raise NotImplementedError(
            f"lossless JPEG with {ncomp} components not supported"
        )
    return {
        "format": "jpeg-lossless",
        "width": w,
        "height": h,
        "mean_r": means[0],
        "mean_g": means[1],
        "mean_b": means[2],
    }


def build_jpeg_lossless(
    width: int,
    height: int,
    pixels: bytes,
    precision: int = 8,
    channels: int = 1,
    predictor: int = 1,
) -> bytes:
    """Encoder twin for :func:`decode_jpeg_lossless`: SOF3 frame, the
    0..16-category DC Huffman table, and the predictor/difference scan
    with modulo-2^16 arithmetic. ``pixels`` is uint8 for precision 8,
    uint16 LE otherwise; the round trip is BIT-EXACT by construction
    (the process is lossless), which the tests assert sample-for-
    sample via the decoded means."""
    import struct

    import numpy as np

    if not 2 <= precision <= 16:
        raise ValueError("precision must be in 2..16")
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    dtype = np.uint8 if precision == 8 else "<u2"
    arr = np.frombuffer(bytes(pixels), dtype=dtype)
    if arr.size != width * height * channels:
        raise ValueError("pixel buffer does not match dims")
    if arr.max(initial=0) >= (1 << precision):
        raise ValueError(f"samples must be < 2^{precision}")
    flat = [int(v) for v in arr]

    enc = {
        v: (code, ln)
        for ln, code, v in _jpeg_canonical(_JPEG_DCL_BITS, _JPEG_DCL_VALS)
    }
    writer = _JpegBitWriter()
    idx = 0
    for y in range(height):
        for x in range(width):
            for c in range(channels):
                if idx == 0:
                    px = 1 << (precision - 1)
                else:
                    px = _lossless_predict(
                        flat, y, x, c, channels, width, precision, 0, predictor
                    )
                diff = (flat[idx] - px) & 0xFFFF
                if diff > 32768:
                    diff -= 65536
                if diff == 32768:
                    code, ln = enc[16]
                    writer.write(code, ln)
                else:
                    t = abs(diff).bit_length()
                    r = diff if diff >= 0 else diff + (1 << t) - 1
                    code, ln = enc[t]
                    writer.write(code, ln)
                    if t:
                        writer.write(r, t)
                idx += 1

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    comp_ids = (1, 2, 3)[:channels]
    sof_body = struct.pack(
        ">BHHB", precision, height, width, channels
    ) + b"".join(bytes([cid, 0x11, 0]) for cid in comp_ids)
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DCL_BITS) + bytes(_JPEG_DCL_VALS),
    )
    sos_body = bytes([channels]) + b"".join(
        bytes([cid, 0x00]) for cid in comp_ids
    ) + bytes([predictor, 0, 0])
    return (
        b"\xff\xd8"
        + seg(0xC3, sof_body)
        + dht
        + seg(0xDA, sos_body)
        + writer.flush()
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# AAC ADTS frame walk — round 7. ADTS (the streaming AAC container,
# ISO/IEC 13818-7 §6.2) is a sequence of frames each led by a 7- or
# 9-byte header whose 13-bit frame-length field frames the walk; each
# frame carries (raw_data_blocks) x 1024 samples. Like MP3, the walk
# yields frame count / duration / bitrate with no codec; actual sample
# decode (the AAC filterbank) genuinely needs a codec library and
# remains the documented seam.
# ---------------------------------------------------------------------------

_ADTS_SAMPLERATES = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)
_AAC_PROFILES = ("main", "lc", "ssr", "ltp")


def _adts_sync_at(payload: bytes, pos: int) -> bool:
    """12-bit ADTS syncword with layer bits 00 (what distinguishes an
    ADTS header from an MPEG-audio one, whose Layer III bits are 01)."""
    return (
        pos + 7 <= len(payload)
        and payload[pos] == 0xFF
        and (payload[pos + 1] & 0xF6) == 0xF0
    )


@_parse_guard
def decode_aac_adts(payload: bytes) -> dict:
    """Strict ADTS frame walk: back-to-back valid headers to end of
    buffer, constant (profile, sample rate, channel configuration)
    across frames. Returns ``{"format", "profile", "sample_rate",
    "channels", "n_frames", "n_samples", "duration_ms",
    "bitrate_kbps"}`` — duration counts 1024 samples per raw data
    block (an ADTS frame may carry up to 4 blocks)."""
    pos = 0
    first = None
    n_frames = 0
    n_blocks = 0
    total = len(payload)
    while pos < total:
        if not _adts_sync_at(payload, pos):
            raise NotImplementedError(f"ADTS sync lost at byte {pos}")
        b = payload[pos : pos + 7]
        profile_idx = b[2] >> 6
        sr_idx = (b[2] >> 2) & 0xF
        if sr_idx >= len(_ADTS_SAMPLERATES):
            raise NotImplementedError(
                f"ADTS sampling-frequency index {sr_idx} is reserved"
            )
        channels = ((b[2] & 1) << 2) | (b[3] >> 6)
        if channels == 0:
            raise NotImplementedError(
                "ADTS channel configuration 0 (PCE-defined) not supported"
            )
        frame_len = ((b[3] & 0x03) << 11) | (b[4] << 3) | (b[5] >> 5)
        header_len = 7 if (b[1] & 1) else 9  # CRC adds 2 bytes
        if frame_len < header_len:
            raise NotImplementedError("ADTS frame length below header size")
        if pos + frame_len > total:
            raise NotImplementedError("truncated final ADTS frame")
        blocks = (b[6] & 0x03) + 1
        params = (profile_idx, sr_idx, channels)
        if first is None:
            first = params
        elif params != first:
            raise NotImplementedError(
                "ADTS stream parameters change mid-stream (corrupt or "
                "concatenated file)"
            )
        n_frames += 1
        n_blocks += blocks
        pos += frame_len
    if first is None:
        raise NotImplementedError("no ADTS frames found")
    profile_idx, sr_idx, channels = first
    sample_rate = _ADTS_SAMPLERATES[sr_idx]
    n_samples = n_blocks * 1024
    duration_s = n_samples / sample_rate
    return {
        "format": "aac-adts",
        "profile": _AAC_PROFILES[profile_idx],
        "sample_rate": sample_rate,
        "channels": channels,
        "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_ms": int(round(duration_s * 1000)),
        "bitrate_kbps": round(total * 8 / duration_s / 1000, 3),
    }


def build_aac_adts(
    n_frames: int,
    sample_rate: int = 44100,
    channels: int = 2,
    profile: str = "lc",
    frame_payload: int = 200,
    crc: bool = False,
    blocks_per_frame: int = 1,
    filler: bytes = b"\x00",
) -> bytes:
    """Builder twin for :func:`decode_aac_adts`: spec-valid ADTS
    headers framing ``frame_payload`` junk bytes each (a header walk
    never reads the raw data blocks)."""
    if n_frames <= 0:
        raise ValueError("n_frames must be positive")
    if sample_rate not in _ADTS_SAMPLERATES:
        raise ValueError(f"sample rate {sample_rate} not in the ADTS table")
    if not 1 <= channels <= 7:
        raise ValueError("channel configuration must be 1..7")
    if not 1 <= blocks_per_frame <= 4:
        raise ValueError("blocks_per_frame must be 1..4")
    sr_idx = _ADTS_SAMPLERATES.index(sample_rate)
    profile_idx = _AAC_PROFILES.index(profile)
    header_len = 9 if crc else 7
    frame_len = header_len + frame_payload
    if frame_len >= 1 << 13:
        raise ValueError("frame length exceeds the 13-bit ADTS field")
    out = bytearray()
    for _ in range(n_frames):
        b1 = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc else 1)
        b2 = (profile_idx << 6) | (sr_idx << 2) | ((channels >> 2) & 1)
        b3 = ((channels & 3) << 6) | ((frame_len >> 11) & 3)
        b4 = (frame_len >> 3) & 0xFF
        b5 = ((frame_len & 7) << 5) | 0x1F  # buffer fullness hi bits
        b6 = (0x3F << 2) | (blocks_per_frame - 1)
        out += bytes((0xFF, b1, b2, b3, b4, b5, b6))
        if crc:
            out += b"\x00\x00"
        out += bytes(
            filler[j % len(filler)] for j in range(frame_payload)
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# Ogg/Opus container walk — round 9. Ogg (RFC 3533) + Opus-in-Ogg
# (RFC 7845) are pure structure: page framing, the non-reflected
# CRC-32 (poly 0x04C11DB7, closed form), lacing-value packet
# reassembly, and the OpusHead identification header. Opus AUDIO
# decode (SILK/CELT) is genuinely library-bound and stays behind the
# seam; the walk verifies every page CRC, the BOS/EOS framing, page
# sequence continuity, and reassembles packets across page boundaries
# — the honest native tier for the OTHER codec speech corpora ship in.
# ---------------------------------------------------------------------------


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF
                if crc & 0x80000000
                else (crc << 1) & 0xFFFFFFFF
            )
    return crc


def _ogg_page(
    payload: bytes,
    serial: int,
    seq: int,
    granule: int,
    header_type: int,
    continued_tail: bool = False,
) -> bytes:
    """One spec-valid Ogg page. ``continued_tail`` ends the page with a
    255 lacing value (the packet continues on the next page)."""
    import struct

    lacing = []
    n = len(payload)
    while n >= 255:
        lacing.append(255)
        n -= 255
    if not continued_tail or n > 0:
        lacing.append(n)  # terminating lacing value (may be 0)
    if len(lacing) > 255:
        raise ValueError("payload needs more than 255 lacing values")
    head = (
        b"OggS\x00"
        + bytes((header_type,))
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes((len(lacing),))
        + bytes(lacing)
    )
    page = head + payload
    crc = _ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def build_ogg_opus(
    n_audio_packets: int,
    sample_rate: int = 48000,
    channels: int = 2,
    pre_skip: int = 312,
    packet_bytes: int = 120,
    serial: int = 0x5061726B,
    frame_ms: int = 20,
    filler: bytes = b"\x00",
) -> bytes:
    """Builder twin for :func:`decode_ogg_opus`: a real Ogg stream —
    BOS page carrying OpusHead, a comment page carrying OpusTags, then
    audio packets (junk bodies behind a valid TOC byte; a container
    walk never decodes SILK/CELT) with 48 kHz granule positions, the
    final page flagged EOS. Packets larger than 255 bytes exercise
    multi-lacing reassembly."""
    import struct

    if n_audio_packets <= 0:
        raise ValueError("n_audio_packets must be positive")
    if not 1 <= channels <= 2:
        raise ValueError("channel_count must be 1 or 2 (mapping family 0)")
    if frame_ms not in (10, 20, 40, 60):
        raise ValueError("frame_ms must be a SILK frame duration")
    head = (
        b"OpusHead\x01"
        + bytes((channels,))
        + struct.pack("<H", pre_skip)
        + struct.pack("<I", sample_rate)
        + struct.pack("<h", 0)  # output gain
        + b"\x00"  # mapping family 0
    )
    tags = (
        b"OpusTags"
        + struct.pack("<I", 4) + b"r9_0"
        + struct.pack("<I", 0)
    )
    out = bytearray()
    out += _ogg_page(head, serial, 0, 0, 0x02)  # BOS
    out += _ogg_page(tags, serial, 1, 0, 0x00)
    samples_per_packet = 48 * frame_ms  # granules are ALWAYS 48 kHz
    # TOC: config 4 (SILK WB 20 ms? — irrelevant to the walk, kept
    # constant), stereo flag, code 0 (one frame)
    toc = (4 << 3) | ((1 if channels == 2 else 0) << 2) | 0
    granule = pre_skip
    for i in range(n_audio_packets):
        body = bytes((toc,)) + bytes(
            filler[j % len(filler)] for j in range(packet_bytes - 1)
        )
        granule += samples_per_packet
        last = i == n_audio_packets - 1
        out += _ogg_page(
            body, serial, 2 + i, granule, 0x04 if last else 0x00
        )
    return bytes(out)


@_parse_guard
def decode_ogg_opus(payload: bytes) -> dict:
    """Strict Ogg/Opus container walk: every page CRC re-computed and
    verified, version/BOS/EOS framing enforced, page sequence numbers
    contiguous, packets reassembled across lacing values and page
    boundaries, OpusHead parsed (version 1, mapping family 0). →
    ``{"format", "sample_rate", "channels", "pre_skip", "n_pages",
    "n_packets", "duration_ms"}`` — duration from the final granule
    position minus pre-skip at the canonical 48 kHz granule rate."""
    import struct

    if payload[:4] != b"OggS":
        raise NotImplementedError("not an Ogg payload")
    pos = 0
    n_pages = 0
    packets: list[bytes] = []
    partial = b""
    expect_seq: int | None = None
    serial0: int | None = None
    last_granule = 0
    saw_eos = False
    while pos < len(payload):
        if saw_eos:
            raise NotImplementedError("Ogg data after the EOS page")
        if payload[pos : pos + 4] != b"OggS":
            raise NotImplementedError("Ogg page sync lost")
        if payload[pos + 4] != 0:
            raise NotImplementedError("unsupported Ogg version")
        header_type = payload[pos + 5]
        granule = struct.unpack("<q", payload[pos + 6 : pos + 14])[0]
        serial, seq = struct.unpack("<II", payload[pos + 14 : pos + 22])
        crc = int.from_bytes(payload[pos + 22 : pos + 26], "little")
        nseg = payload[pos + 26]
        lacing = payload[pos + 27 : pos + 27 + nseg]
        if len(lacing) < nseg:
            raise NotImplementedError("truncated Ogg segment table")
        body_len = sum(lacing)
        page_end = pos + 27 + nseg + body_len
        if page_end > len(payload):
            raise NotImplementedError("truncated Ogg page body")
        page = bytearray(payload[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise NotImplementedError("Ogg page CRC mismatch")
        if serial0 is None:
            serial0 = serial
            if not header_type & 0x02:
                raise NotImplementedError("first Ogg page is not BOS")
        elif serial != serial0:
            raise NotImplementedError("multiplexed Ogg streams unsupported")
        elif header_type & 0x02:
            raise NotImplementedError("BOS flag on a non-first page")
        if expect_seq is not None and seq != expect_seq:
            raise NotImplementedError("Ogg page sequence discontinuity")
        expect_seq = seq + 1
        if (header_type & 0x01) and not partial:
            raise NotImplementedError(
                "continued-packet flag with no packet in flight"
            )
        if not (header_type & 0x01) and partial:
            raise NotImplementedError(
                "packet left unfinished at a fresh page"
            )
        body = payload[pos + 27 + nseg : page_end]
        at = 0
        for lv in lacing:
            partial += body[at : at + lv]
            at += lv
            if lv < 255:
                packets.append(partial)
                partial = b""
        if granule >= 0:
            last_granule = granule
        if header_type & 0x04:
            saw_eos = True
        n_pages += 1
        pos = page_end
    if partial:
        raise NotImplementedError("Ogg stream ends mid-packet")
    if not saw_eos:
        raise NotImplementedError("Ogg stream has no EOS page")
    if len(packets) < 2:
        raise NotImplementedError("Ogg/Opus needs OpusHead + OpusTags")
    head = packets[0]
    if head[:8] != b"OpusHead":
        raise NotImplementedError("first Ogg packet is not OpusHead")
    if head[8] != 1:
        raise NotImplementedError("unsupported OpusHead version")
    channels = head[9]
    pre_skip = struct.unpack("<H", head[10:12])[0]
    sample_rate = struct.unpack("<I", head[12:16])[0]
    if head[18] != 0:
        raise NotImplementedError("OpusHead mapping family != 0")
    if not 1 <= channels <= 2:
        raise NotImplementedError("mapping family 0 allows 1-2 channels")
    if packets[1][:8] != b"OpusTags":
        raise NotImplementedError("second Ogg packet is not OpusTags")
    return {
        "format": "opus",
        "sample_rate": sample_rate,
        "channels": channels,
        "pre_skip": pre_skip,
        "n_pages": n_pages,
        "n_packets": len(packets) - 2,
        "duration_ms": max(0, (last_granule - pre_skip)) * 1000 // 48000,
    }


# ---------------------------------------------------------------------------
# AVI/MJPEG video frame decode — round 7. Motion JPEG in an AVI (RIFF)
# container is the one video format whose PIXELS decode with what this
# container already has: the RIFF walk is pure byte layout and every
# '00dc' chunk is a complete baseline JPEG, which decode_jpeg_pixels
# (round 6) fully decodes. This closes the "video is metadata-only"
# seam for one honest format; inter-frame codecs (H.264 etc.) remain
# the documented NotImplementedError seam.
# ---------------------------------------------------------------------------


def build_avi_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
    with_index: bool = True,
) -> bytes:
    """Builder twin for :func:`decode_avi_frames`: a spec-valid AVI
    RIFF container — LIST hdrl (avih + LIST strl(strh 'vids'/'MJPG' +
    strf BITMAPINFOHEADER)) + LIST movi of '00dc' chunks (one complete
    JPEG each, word-aligned) + an idx1 index. ``frames`` are encoded
    JPEG byte strings (see build_jpeg_pixels)."""
    import struct

    if not frames:
        raise ValueError("at least one frame required")

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # microseconds per frame
        0, 0,
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, 0,
        width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        # flags, priority, language, initialFrames, scale, rate (fps =
        # rate/scale), start, length, suggestedBuffer, quality,
        # sampleSize, then the 8-byte rcFrame rect → 56 bytes total
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset from 'movi' fourcc
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    idx = b""
    if with_index:
        entries = b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))
            for off, f in zip(offsets, frames)
        )
        idx = chunk(b"idx1", entries)
    riff_body = b"AVI " + hdrl + movi + idx
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


@_parse_guard
def decode_avi_frames(payload: bytes) -> dict:
    """REAL video frame decode: walk the AVI RIFF tree, validate the
    avih main header against the stream, and fully pixel-decode every
    MJPEG '00dc'/'00db' chunk with :func:`decode_jpeg_pixels`. Strict:
    the declared frame count must equal the walked count, every
    frame's JPEG dims must equal the container dims, and an idx1
    index — when present — must have one entry per frame. Non-MJPEG
    streams raise NotImplementedError (inter-frame codecs genuinely
    need ffmpeg — the documented seam). Returns ``{"format", "width",
    "height", "fps", "n_frames", "frames": [{"frame_idx", "mean_r",
    "mean_g", "mean_b"}, ...]}``."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError("not an AVI (RIFF/'AVI ') container")

    def walk(buf, pos, end):
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            clen = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            if pos + 8 + clen > end:
                raise NotImplementedError("truncated AVI chunk")
            yield cid, pos + 8, pos + 8 + clen
            pos += 8 + clen + (clen % 2)

    avih = None
    handler = None
    movi = None
    idx_entries = None
    for cid, s, e in walk(payload, 12, len(payload)):
        if cid == b"LIST":
            kind = payload[s : s + 4]
            if kind == b"hdrl":
                for c2, s2, e2 in walk(payload, s + 4, e):
                    if c2 == b"avih":
                        avih = struct.unpack("<10I", payload[s2 : s2 + 40])
                    elif c2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                        for c3, s3, e3 in walk(payload, s2 + 4, e2):
                            if c3 == b"strh" and payload[s3 : s3 + 4] == b"vids":
                                handler = payload[s3 + 4 : s3 + 8]
            elif kind == b"movi":
                movi = (s + 4, e)
        elif cid == b"idx1":
            idx_entries = (e - s) // 16
    if avih is None:
        raise NotImplementedError("AVI without avih main header")
    if movi is None:
        raise NotImplementedError("AVI without movi LIST")
    if handler is not None and handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI video handler {handler!r} needs a codec library; only "
            "MJPG decodes natively"
        )
    us_per_frame, _, _, _, total_frames, _, _, _, width, height = avih
    frames = []
    for cid, s, e in walk(payload, *movi):
        if cid[2:4] not in (b"dc", b"db"):
            continue  # non-video chunks (audio '01wb', subtitles) skip
        d = decode_jpeg_pixels(payload[s:e])
        if (d["width"], d["height"]) != (width, height):
            raise NotImplementedError(
                f"frame {len(frames)} dims {d['width']}x{d['height']} != "
                f"container {width}x{height}"
            )
        frames.append(
            {
                "frame_idx": len(frames),
                "mean_r": d["mean_r"],
                "mean_g": d["mean_g"],
                "mean_b": d["mean_b"],
            }
        )
    if total_frames != len(frames):
        raise NotImplementedError(
            f"avih declares {total_frames} frames, movi holds {len(frames)}"
        )
    if idx_entries is not None and idx_entries != len(frames):
        raise NotImplementedError(
            f"idx1 holds {idx_entries} entries for {len(frames)} frames"
        )
    if not frames:
        raise NotImplementedError("AVI with no video frames")
    return {
        "format": "avi-mjpeg",
        "width": width,
        "height": height,
        "fps": round(1_000_000 / us_per_frame, 3) if us_per_frame else None,
        "n_frames": len(frames),
        "frames": frames,
    }


def video_meta_for(doc_id: int) -> dict:
    """Deterministic AVI/MJPEG recipe for the oracle-gated frame
    query: 1 + doc_id%4 flat-gray frames (value ``16 + (doc_id*7 +
    i*19) % 200`` for frame i — flat blocks with dc_quant=8 JPEG-
    round-trip EXACTLY), dims 8*(1+doc_id%3) x 8*(1+doc_id%2)."""
    return {
        "n_frames": 1 + doc_id % 4,
        "width": 8 * (1 + doc_id % 3),
        "height": 8 * (1 + doc_id % 2),
        "fps": 5 + doc_id % 26,
    }


def _video_frame_value(doc_id: int, i: int) -> int:
    return 16 + (doc_id * 7 + i * 19) % 200


def attach_video_media(docs: DataFrame) -> DataFrame:
    """→ (doc_id, payload: binary) where payload is a real AVI/MJPEG
    file following `video_meta_for` — every frame a genuine baseline
    JPEG from the round-6 encoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                m = video_meta_for(int(doc_id))
                w, h = m["width"], m["height"]
                frames = [
                    build_jpeg_pixels(
                        w, h,
                        bytes([_video_frame_value(int(doc_id), i)]) * (w * h),
                        channels=1,
                    )
                    for i in range(m["n_frames"])
                ]
                payloads.append(build_avi_mjpeg(frames, w, h, fps=m["fps"]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_for_codec(docs.select("doc_id")).mapInPandas(
        run, "doc_id long, payload binary"
    )


VIDEO_FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def extract_video_frames(
    with_payload: DataFrame, on_error: str = "raise"
) -> DataFrame:
    """Arrow-batched one-to-many video expansion: each payload row
    fans out to one row per DECODED frame (the real-codec successor
    of the md5-fake ``sample_frames`` shape). ``on_error='null'``
    quarantines undecodable payloads as a single null-stat row, as
    extract_pixel_stats does."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_avi_frames(bytes(payload))
                except NotImplementedError:
                    if on_error == "raise":
                        raise
                    rows.append((doc_id, None, None, None, None, None, None))
                    continue
                for fr in d["frames"]:
                    rows.append(
                        (
                            doc_id, fr["frame_idx"], d["width"], d["height"],
                            fr["mean_r"], fr["mean_g"], fr["mean_b"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return with_payload.mapInPandas(run, VIDEO_FRAMES_SCHEMA)


MEDIA_FORMATS = (
    "png", "gif", "bmp", "jpeg", "wav", "mp4", "mp3", "aac", "flac",
    "opus", "avi", "y4m", "gif-anim",
)

DECODE_SCHEMA = (
    "doc_id long, format string, width int, height int, "
    "sample_rate int, channels int"
)


def build_payload(
    fmt: str,
    width: int = 0,
    height: int = 0,
    sample_rate: int = 0,
    channels: int = 1,
    filler: bytes = b"",
) -> bytes:
    """Construct REAL (spec-valid header) media bytes for the given
    format — the independent twin of ``decode_real``'s parsers, used to
    manufacture test payloads with known metadata. ``filler`` pads the
    body so payload sizes are realistic."""
    import struct
    import zlib

    if fmt == "png":
        ihdr = struct.pack(">II5B", width, height, 8, 6, 0, 0, 0)
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
            + filler
            + b"\x00\x00\x00\x00IEND\xaeB`\x82"
        )
    if fmt == "gif":
        return (
            b"GIF89a"
            + struct.pack("<HH", width, height)
            + b"\x00\x00\x00"
            + filler
            + b"\x3b"
        )
    if fmt == "gif-anim":
        # a REAL two-frame animation (round 10): full-canvas keyframe
        # plus a top-row sub-rectangle — the global color table plus
        # second image descriptor is what decode_real's structural
        # walk detects as animation
        from optimal_parallel_fp_growth_spark.operators.video import (
            build_gif_anim,
        )

        palette = bytes(
            c for j in range(16) for c in (16 * j, 255 - 16 * j, j)
        )
        return build_gif_anim(
            [
                (0, 0, width, height, [1] * (width * height)),
                (0, 0, width, 1, [2] * width),
            ],
            width,
            height,
            palette,
        )
    if fmt == "bmp":
        body = filler
        header_len = 14 + 40
        return (
            b"BM"
            + struct.pack("<IHHI", header_len + len(body), 0, 0, header_len)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                          len(body), 2835, 2835, 0, 0)
            + body
        )
    if fmt == "jpeg":
        sof0 = struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
        return (
            b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + b"\x00\x01\x00\x01\x00\x00"
            + b"\xff\xc0" + sof0
            + filler
            + b"\xff\xd9"
        )
    if fmt == "wav":
        byte_rate = sample_rate * channels * 2
        fmt_chunk = struct.pack(
            "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
        )
        data = filler if len(filler) % 2 == 0 else filler + b"\x00"
        return (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt_chunk) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + b"data" + struct.pack("<I", len(data)) + data
        )
    if fmt == "mp4":
        # minimal spec-valid ISO-BMFF: ftyp + moov(mvhd + trak(tkhd))
        # + mdat filler; tkhd carries the 16.16 fixed-point dims
        def box(t: bytes, body: bytes) -> bytes:
            return struct.pack(">I", 8 + len(body)) + t + body

        mvhd = box(
            b"mvhd",
            bytes(4)                      # version/flags
            + bytes(8)                    # creation/modification
            + struct.pack(">II", 1000, 0)  # timescale, duration
            + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + bytes(10)                   # rate, volume, reserved
            + bytes(36)                   # matrix
            + bytes(24)                   # predefined
            + struct.pack(">I", 2),       # next track id
        )
        tkhd = box(
            b"tkhd",
            bytes(4) + bytes(8)           # version/flags, times
            + struct.pack(">I", 1)        # track id
            + bytes(4)                    # reserved
            + struct.pack(">I", 0)        # duration
            + bytes(8) + bytes(8)         # reserved, layer/alt/vol/rsvd
            + bytes(36)                   # matrix
            + struct.pack(">II", width << 16, height << 16),
        )
        moov = box(b"moov", mvhd + box(b"trak", tkhd))
        ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
        return ftyp + moov + box(b"mdat", filler)
    if fmt == "mp3":
        # CBR 128 kbps MPEG-1 Layer III (sample_rate must be from the
        # MPEG-1 table); the filler rides in an ID3v2 tag so payload
        # sizes stay text-proportional like the other formats.
        return build_mp3_frames(
            n_frames=2 + len(filler) % 4,
            sample_rate=sample_rate,
            bitrate_kbps=128,
            channels=channels,
            id3_text=filler,
        )
    if fmt == "aac":
        return build_aac_adts(
            n_frames=2 + len(filler) % 4,
            sample_rate=sample_rate,
            channels=channels,
            frame_payload=50 + len(filler) % 200,
        )
    if fmt == "flac":
        # a REAL (fully decodable, CRC+MD5-verified) FLAC stream; the
        # filler sets the sample count so payload sizes stay
        # text-proportional like the other formats
        from optimal_parallel_fp_growth_spark.operators.flac import (
            build_flac_samples,
        )

        n = (64 + len(filler) % 256) * channels
        return build_flac_samples(
            [100 * (k % 9) for k in range(n)],
            sample_rate,
            channels=channels,
            block_size=48,
        )
    if fmt == "opus":
        return build_ogg_opus(
            n_audio_packets=2 + len(filler) % 6,
            sample_rate=sample_rate,
            channels=channels,
            packet_bytes=60 + len(filler) % 300,
            filler=filler or b"\x00",
        )
    if fmt == "avi":
        # header-tier AVI (same honesty level as the png/gif/bmp/mp4
        # branches: real headers, no frame data — the recipe dims run
        # to 2016x2016, far past what a per-row python RLE encode
        # should build per doc). avih + a BI_RLE8 strl so the file
        # self-describes as the codec the FULL tier
        # (operators/video.py) decodes; movi declares zero frames.
        def chunk(cid: bytes, body: bytes) -> bytes:
            pad = b"\x00" if len(body) % 2 else b""
            return cid + struct.pack("<I", len(body)) + body + pad

        avih = struct.pack(
            "<IIIIIIIIII4I",
            66_666, 0, 0, 0x10, 0, 0, 1, 0, width, height, 0, 0, 0, 0,
        )
        strh = (
            b"vids" + b"mrle"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 15, 0, 0, 0,
                          0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height)
        )
        strf = struct.pack(
            "<IiiHHIIiiII",
            40, width, height, 1, 8, 1, width * height, 0, 0, 256, 0,
        ) + bytes(4 * 256)
        hdrl = chunk(
            b"LIST",
            b"hdrl" + chunk(b"avih", avih)
            + chunk(b"LIST", b"strl" + chunk(b"strh", strh)
                    + chunk(b"strf", strf)),
        )
        junk = chunk(b"JUNK", filler)  # filler rides in a JUNK chunk
        movi = chunk(b"LIST", b"movi")
        body = b"AVI " + hdrl + junk + movi
        return b"RIFF" + struct.pack("<I", len(body)) + body
    if fmt == "y4m":
        # header-tier Y4M: a spec-valid stream header with zero FRAME
        # records; the filler rides in an ignorable X-parameter (hex,
        # no whitespace) so payload sizes stay text-proportional.
        # C444 keeps any dim parity legal.
        xparam = f" Xf{filler.hex()}" if filler else ""
        return (
            f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 "
            f"C444{xparam}\n".encode()
        )
    raise ValueError(f"unknown format {fmt!r}")


def media_meta_for(doc_id: int) -> dict:
    """The deterministic metadata recipe ``attach_media`` bakes into
    each synthetic payload — mirrored by the DuckDB oracle SQL so the
    build→parse round trip is checked value-by-value."""
    fmt = MEDIA_FORMATS[doc_id % len(MEDIA_FORMATS)]
    if fmt == "wav":
        return {
            "format": fmt,
            "width": None,
            "height": None,
            "sample_rate": 8000 + (doc_id * 31) % 40000,
            "channels": 1 + doc_id % 2,
        }
    if fmt == "mp3":
        return {
            "format": fmt,
            "width": None,
            "height": None,
            # must come from the MPEG-1 sample-rate table; indexed by
            # doc_id//13 so it varies within the %13 format rotation's
            # mp3 residue class (rounds 9/10)
            "sample_rate": (44100, 48000, 32000)[(doc_id // 13) % 3],
            "channels": 1 + doc_id % 2,
        }
    if fmt == "aac":
        return {
            "format": fmt,
            "width": None,
            "height": None,
            # must come from the ADTS sampling-frequency table;
            # doc_id//13 for the same residue-class reason as mp3
            "sample_rate": _ADTS_SAMPLERATES[(doc_id // 13) % 12],
            "channels": 1 + doc_id % 2,
        }
    if fmt == "flac":
        return {
            "format": fmt,
            "width": None,
            "height": None,
            # free-form, but must fit the 16-bit-Hz frame-header code
            "sample_rate": 8000 + (doc_id * 31) % 40000,
            "channels": 1 + doc_id % 2,
        }
    if fmt == "opus":
        return {
            "format": fmt,
            "width": None,
            "height": None,
            # OpusHead input_sample_rate is informational free-form
            "sample_rate": 8000 + (doc_id * 31) % 40000,
            "channels": 1 + doc_id % 2,
        }
    if fmt == "gif-anim":
        return {
            # small dims on purpose: this class carries a REAL
            # animation (full-canvas keyframe + sub-rect frame), not a
            # header-and-filler file, so the payload is w*h-pixel real
            "format": fmt,
            "width": 6 + (doc_id // 13) % 10,
            "height": 4 + (doc_id // 13) % 7,
            "sample_rate": None,
            "channels": None,
        }
    return {
        "format": fmt,
        "width": 16 + (doc_id * 7919) % 2000,
        "height": 16 + (doc_id * 104729) % 2000,
        "sample_rate": None,
        "channels": None,
    }


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, payload: binary) where payload is a spec-valid media
    file (format rotating by doc_id, metadata from `media_meta_for`,
    the doc's utf-8 text as body filler). Arrow-batched construction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                m = media_meta_for(int(doc_id))
                payloads.append(
                    build_payload(
                        m["format"],
                        width=m["width"] or 0,
                        height=m["height"] or 0,
                        sample_rate=m["sample_rate"] or 0,
                        channels=m["channels"] or 1,
                        filler=str(text).encode("utf-8"),
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return _spread_for_codec(
        docs.select("doc_id", F.col(text_col).alias("text"))
    ).mapInPandas(
        run, "doc_id long, payload binary"
    )


def decode_media(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched REAL header decode: one metadata row per payload
    via ``decode_real`` — the formerly-stubbed seam, now live for the
    five natively-parsed container formats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_real(bytes(payload))
                rows.append(
                    (
                        doc_id,
                        d["format"],
                        d["width"],
                        d["height"],
                        d["sample_rate"],
                        d["channels"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "format", "width", "height",
                    "sample_rate", "channels",
                ],
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        run, DECODE_SCHEMA
    )


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: dims + 4 features from md5(payload)."""
    hx = hashlib.md5(payload).hexdigest()
    h8 = int(hx[:8], 16)
    width = 16 + h8 % 1008
    height = 16 + (h8 // 1008) % 1008
    feats = [round(int(hx[4 * j : 4 * j + 4], 16) / 65535.0, 6) for j in range(4)]
    return width, height, feats


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction. One output row per
    input row; batches stay columnar (pandas in, pandas out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                w, h, f = _decode_stub(bytes(payload))
                rows.append(
                    (doc_id, meta["modality"], meta["n_bytes"], w, h, *f)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "modality", "n_bytes", "width", "height",
                    "f0", "f1", "f2", "f3",
                ],
            )

    return with_payload.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(with_payload: DataFrame) -> DataFrame:
    """One-to-many expansion ('video' frame sampling): 1 + md5%4 frames
    per payload, each fingerprinted — the mapInPandas fan-out shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = 1 + int(hashlib.md5(b).hexdigest()[:8], 16) % 4
                for i in range(n_frames):
                    rows.append(
                        (doc_id, i, hashlib.md5(b + str(i).encode()).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"])

    return with_payload.select("doc_id", "payload").mapInPandas(run, FRAMES_SCHEMA)


PIXEL_SCHEMA = (
    "doc_id long, format string, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


@_parse_guard
def decode_pixels(payload: bytes) -> dict:
    """FULL pixel decode for the binary netpbm family — P5 (raw
    grayscale) and P6 (raw RGB) — the one image family decodable with
    ZERO codec libraries: a whitespace/comment-tolerant ASCII header
    (magic, width, height, maxval) followed by raw samples. Returns
    ``{"format", "width", "height", "mean_r", "mean_g", "mean_b"}``
    (grayscale reports its mean on all three channels). PNG payloads
    dispatch to :func:`decode_png_pixels` (real zlib inflate +
    unfiltering), GIF to :func:`decode_gif_pixels` (real LZW), JPEG
    to :func:`decode_jpeg_pixels` (real Huffman + IDCT, baseline).
    Every other format still raises ``NotImplementedError`` — the
    documented codec seam (see :func:`decode_real` for header-only
    parsing)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg_pixels(payload)
    if payload[:2] not in (b"P5", b"P6"):
        raise NotImplementedError(
            "pixel decode supports raw netpbm (P5/P6), 8/16-bit PNG, GIF, "
            "and baseline JPEG; other codecs need PIL/ffmpeg (the "
            "documented seam)"
        )
    # header tokenizer: fields separated by whitespace, '#' comments
    # run to end-of-line; the single whitespace byte after maxval is
    # the pixel-data delimiter
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise NotImplementedError("truncated netpbm header")
        fields.append(int(payload[start:pos]))
    pos += 1  # the single delimiter byte
    width, height, maxval = fields
    if width == 0 or height == 0:
        raise NotImplementedError("zero-dimension netpbm image")
    if maxval >= 256:
        raise NotImplementedError("16-bit netpbm samples not supported")
    ch = 3 if payload[:2] == b"P6" else 1
    need = width * height * ch
    data = payload[pos : pos + need]
    if len(data) != need:
        raise NotImplementedError(
            f"truncated netpbm pixel data: want {need}, have {len(data)}"
        )
    if ch == 3:
        means = [
            sum(data[c::3]) / (width * height) for c in range(3)
        ]
    else:
        m = sum(data) / (width * height)
        means = [m, m, m]
    return {
        "format": "ppm" if ch == 3 else "pgm",
        "width": width,
        "height": height,
        "mean_r": means[0],
        "mean_g": means[1],
        "mean_b": means[2],
    }


# Adam7 pass grid (spec §8.2): (x0, y0, dx, dy) per pass
_ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9 Filtering): pick whichever of
    left/up/up-left is closest to a + b - c, ties a > b > c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


@_parse_guard
def decode_png_pixels(payload: bytes) -> dict:
    """FULL PNG pixel decode with ZERO codec libraries: chunk walk,
    stdlib ``zlib`` inflate of the concatenated IDAT stream, and
    per-scanline unfiltering (all five PNG filter types: None/Sub/Up/
    Average/Paeth). Supports EVERY legal depth/color combination:
    1/2/4/8/16-bit for color types 0 (gray) and 3 (palette —
    1/2/4/8 per spec), 8/16-bit for 2 (RGB), 4 (gray+alpha), 6
    (RGBA); and BOTH interlace methods — Adam7's seven passes are
    each unfiltered independently per spec §8.2, which is all a
    channel MEAN needs (pixel position is irrelevant to a sum).
    Sub-byte scanlines unpack MSB-first with pad bits dropped, and
    gray samples scale to 0–255 by the exact 255/(2^d−1) factor.
    Returns the same shape as :func:`decode_pixels`; alpha is
    ignored for the channel means, grayscale reports its mean on all
    three channels; 16-bit means are over the 0–65535 sample range
    (no 8-bit downscale)."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG signature")
    pos = 8
    ihdr = None
    plte = b""
    idat = bytearray()
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    if ihdr is None or len(ihdr) < 13:
        raise NotImplementedError("corrupt PNG: missing IHDR")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    if width == 0 or height == 0:
        raise NotImplementedError("zero-dimension PNG (spec requires > 0)")
    depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    if depth not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"PNG bit depth {depth} invalid")
    if depth < 8 and color_type not in (0, 3):
        raise NotImplementedError(
            f"PNG depth {depth} is only legal for gray/palette (spec 11.2.2)"
        )
    if interlace not in (0, 1):
        raise NotImplementedError(f"PNG interlace method {interlace} invalid")
    if depth == 16 and color_type == 3:
        raise NotImplementedError("16-bit palette PNG is not valid per spec")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type} not supported")
    if not idat:
        raise NotImplementedError("corrupt PNG: no IDAT data")
    sample_bytes = depth // 8
    raw = zlib.decompress(bytes(idat))
    # Region plan: a non-interlaced image is ONE filtered region; an
    # Adam7 image is up to SEVEN (each pass filtered independently,
    # spec §8.2). Channel MEANS are order-independent, so summing the
    # passes' reconstructed samples equals summing the deinterlaced
    # image — no pixel rearrangement needed.
    if interlace == 0:
        regions = [(width, height)]
    else:
        regions = []
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw > 0 and ph > 0:
                regions.append((pw, ph))
    def _stride(w_: int) -> int:
        return (w_ * channels * depth + 7) // 8  # spec: pad bits per line

    want = sum((_stride(w_) + 1) * h_ for w_, h_ in regions)
    if len(raw) != want:
        raise NotImplementedError(
            f"PNG pixel data length mismatch: want {want}, have {len(raw)}"
        )
    bpp = max(channels * sample_bytes, 1)  # filters see >=1 byte/pixel
    sum_r = sum_g = sum_b = 0
    off = 0
    for rw, rh in regions:
        stride = _stride(rw)
        prior = bytearray(stride)
        for _y in range(rh):
            ftype = raw[off]
            line = bytearray(raw[off + 1 : off + 1 + stride])
            off += 1 + stride
            if ftype == 1:  # Sub
                for x in range(bpp, stride):
                    line[x] = (line[x] + line[x - bpp]) & 0xFF
            elif ftype == 2:  # Up
                for x in range(stride):
                    line[x] = (line[x] + prior[x]) & 0xFF
            elif ftype == 3:  # Average
                for x in range(stride):
                    left = line[x - bpp] if x >= bpp else 0
                    line[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(stride):
                    left = line[x - bpp] if x >= bpp else 0
                    ul = prior[x - bpp] if x >= bpp else 0
                    line[x] = (line[x] + _paeth(left, prior[x], ul)) & 0xFF
            elif ftype != 0:
                raise NotImplementedError(f"PNG filter type {ftype} invalid")
            # accumulate channel sums from the reconstructed scanline;
            # 16-bit samples are big-endian byte pairs (spec §7.1),
            # sub-byte samples unpack MSB-first with pad bits dropped
            if depth == 16:
                vals: list[int] | bytearray = [
                    (line[i] << 8) | line[i + 1] for i in range(0, stride, 2)
                ]
            elif depth < 8:
                per = 8 // depth
                mask = (1 << depth) - 1
                vals = [
                    (b >> ((per - 1 - k) * depth)) & mask
                    for b in line
                    for k in range(per)
                ][:rw]
                if color_type == 0:
                    # exact gray scaling: 255/(2^d - 1) is an integer
                    scale = 255 // mask
                    vals = [v * scale for v in vals]
            else:
                vals = line
            if color_type == 2 or color_type == 6:
                sum_r += sum(vals[0::channels])
                sum_g += sum(vals[1::channels])
                sum_b += sum(vals[2::channels])
            elif color_type == 3:
                for idx in vals:
                    base = idx * 3
                    sum_r += plte[base]
                    sum_g += plte[base + 1]
                    sum_b += plte[base + 2]
            else:  # 0 or 4: grayscale (+alpha)
                g = sum(vals[0::channels])
                sum_r += g
                sum_g += g
                sum_b += g
            prior = line
    n = width * height
    return {
        "format": "png",
        "width": width,
        "height": height,
        "mean_r": sum_r / n,
        "mean_g": sum_g / n,
        "mean_b": sum_b / n,
    }


def build_png_pixels(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    palette: bytes = b"",
    depth: int = 8,
    interlace: bool = False,
) -> bytes:
    """Construct a REAL PNG from raw pixel bytes (row-major,
    ``channels`` interleaved; for ``depth=16`` each sample is a
    big-endian byte pair; for sub-byte depths 1/2/4 one INPUT byte
    per sample holding 0..2^d−1, packed MSB-first into scanlines
    here) — the independent build twin of :func:`decode_png_pixels`.
    Each scanline gets filter type ``y % 5``, so a round trip
    exercises ALL FIVE filters; the deflate stream is real stdlib
    zlib. ``interlace=True`` writes a genuine Adam7 layout: pixels
    rearranged into the seven passes, each pass filtered
    independently."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    if depth < 8 and color_type not in (0, 3):
        raise ValueError("sub-byte depth is only legal for gray/palette")
    sub = depth < 8
    px_b = 1 if sub else channels * (depth // 8)
    stride = width * px_b
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dims")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    def pack_row(row: bytes) -> bytes:
        """Sub-byte: one input byte per sample → MSB-first bit packing
        with zero pad bits (spec 7.2)."""
        if not sub:
            return bytes(row)
        per = 8 // depth
        out = bytearray((len(row) + per - 1) // per)
        for i, v in enumerate(row):
            out[i // per] |= (v & ((1 << depth) - 1)) << (
                (per - 1 - i % per) * depth
            )
        return bytes(out)

    # regions: list of row-lists; each region is filtered independently
    # (prior resets at a region start — exactly how the decoder resets
    # per pass)
    if interlace:
        regions: list[list[bytes]] = []
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw <= 0 or ph <= 0:
                continue
            rows: list[bytes] = []
            for j in range(ph):
                y = y0 + j * dy
                row = bytearray()
                for i in range(pw):
                    x = x0 + i * dx
                    base = y * stride + x * px_b
                    row.extend(pixels[base : base + px_b])
                rows.append(pack_row(bytes(row)))
            regions.append(rows)
    else:
        regions = [
            [
                pack_row(pixels[y * stride : (y + 1) * stride])
                for y in range(height)
            ]
        ]

    bpp = px_b
    raw = bytearray()
    for region in regions:
        prior = bytes(len(region[0]))
        for y, line in enumerate(region):
            ftype = y % 5
            raw.append(ftype)
            stride = len(line)
            if ftype == 0:
                raw.extend(line)
            elif ftype == 1:  # Sub
                raw.extend(
                    (line[x] - (line[x - bpp] if x >= bpp else 0)) & 0xFF
                    for x in range(stride)
                )
            elif ftype == 2:  # Up
                raw.extend((line[x] - prior[x]) & 0xFF for x in range(stride))
            elif ftype == 3:  # Average
                raw.extend(
                    (
                        line[x]
                        - (((line[x - bpp] if x >= bpp else 0) + prior[x]) >> 1)
                    )
                    & 0xFF
                    for x in range(stride)
                )
            else:  # Paeth
                raw.extend(
                    (
                        line[x]
                        - _paeth(
                            line[x - bpp] if x >= bpp else 0,
                            prior[x],
                            prior[x - bpp] if x >= bpp else 0,
                        )
                    )
                    & 0xFF
                    for x in range(stride)
                )
            prior = line
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += chunk(b"PLTE", palette)
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + chunk(b"IEND", b"")


# Absolute per-frame pixel ceiling for GIF decode (policy cap, not a
# spec limit): 16.7 Mpx is beyond any real logical screen, and bounds
# the index-list / RGB-canvas materialization for a hostile payload to
# ~200 MB transient even when the stream-theoretic check passes.
_GIF_MAX_FRAME_PX = 1 << 24


def _lzw_frame_guard(n_px: int, lzw_len: int, min_code_size: int) -> None:
    """Reject a declared frame size the LZW stream could never fill,
    BEFORE decoding. The cap passed to _lzw_decode is relative to the
    DECLARED size, so on its own it does not protect against forged
    16-bit dims (65535x65535 → a ~4.3e9 cap that never fires while the
    stream's quadratic expansion materializes gigabytes). Bound the
    emission by the stream itself: n codes emit at most
    min(n(n+1)/2, 4095n) symbols (each dictionary string grows by one
    per code and never exceeds 4096), with n ≤ bits // (min_code_size
    + 1) since code width only grows."""
    if n_px > _GIF_MAX_FRAME_PX:
        raise NotImplementedError(
            f"GIF frame of {n_px} px exceeds the {_GIF_MAX_FRAME_PX} px "
            "decode ceiling"
        )
    n_codes = (lzw_len * 8) // (min_code_size + 1) + 1
    max_emit = min(n_codes * (n_codes + 1) // 2, n_codes * 4095)
    if n_px > max_emit:
        raise NotImplementedError(
            f"GIF frame data ({lzw_len} bytes) cannot encode the "
            f"declared {n_px}-px rect"
        )


def _lzw_decode(
    data: bytes, min_code_size: int, max_symbols: int | None = None
) -> list[int]:
    """GIF-flavor LZW decode (variable-width codes growing
    ``min_code_size+1`` → 12 bits, CLEAR resets the dictionary, EOI
    terminates; LSB-first bit packing per GIF spec appendix F).
    Returns the index stream. ``max_symbols`` caps the OUTPUT length —
    LZW legally expands quadratically in the input (each code can emit
    a string one longer than the last), so a corrupt stream whose
    descriptor promises a small frame could otherwise make the decoder
    materialize gigabytes before the length check; callers that know
    the expected pixel count pass it and the decode fails closed the
    moment the stream overruns it."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader state
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            if byte >> ((bitpos + i) & 7) & 1:
                v |= 1 << i
        bitpos += width
        return v

    def fresh_table() -> dict[int, list[int]]:
        return {i: [i] for i in range(clear)}

    table = fresh_table()
    width = min_code_size + 1
    next_code = eoi + 1
    prev: list[int] | None = None
    while True:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise NotImplementedError("corrupt GIF LZW stream")
        out.extend(entry)
        if max_symbols is not None and len(out) > max_symbols:
            raise NotImplementedError(
                f"GIF LZW stream overruns the declared frame size "
                f"({len(out)} > {max_symbols} symbols)"
            )
        if prev is not None:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Real GIF LZW encoder (the build twin of :func:`_lzw_decode`):
    dictionary of index tuples, variable width growing to 12 bits,
    CLEAR emitted when the table fills. LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits: list[int] = []

    def emit(code: int, width: int) -> None:
        for i in range(width):
            bits.append((code >> i) & 1)

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    cur: tuple[int, ...] = ()
    for idx in indices:
        cand = cur + (idx,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        if next_code == (1 << 12):
            # table full: CLEAR (at the current width) and restart
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        else:
            table[cand] = next_code
            next_code += 1
            # the decoder adds its matching entry one code LATER, so
            # its next_code lags ours by one: it hits 2^width (and
            # widens) exactly when ours hits 2^width + 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        cur = (idx,)
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    # pack LSB-first into bytes
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        out.append(b)
    return bytes(out)


@_parse_guard
def decode_gif_pixels(payload: bytes) -> dict:
    """FULL GIF pixel decode with ZERO codec libraries: logical-screen
    / image-descriptor walk, global or local color table, and a real
    variable-width LZW decode of the first image's index stream
    (CLEAR/EOI, KwKwK case, 12-bit cap). Channel means come from the
    color-table lookup of every decoded index; row order is
    irrelevant to a mean, so interlaced images decode correctly too.
    Animated GIFs report the FIRST frame."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF signature")
    width = int.from_bytes(payload[6:8], "little")
    height = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = payload[pos : pos + n]
        pos += n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
            if iw == 0 or ih == 0:
                raise NotImplementedError("zero-dimension GIF image descriptor")
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 3 * (2 << (ipacked & 0x07))
                ct = payload[pos : pos + n]
                pos += n
            if not ct:
                raise NotImplementedError("GIF image without a color table")
            min_code_size = payload[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                n = payload[pos]
                lzw.extend(payload[pos + 1 : pos + 1 + n])
                pos += 1 + n
            # +4096 slack: the final LZW entry may legally overshoot
            # the frame by up to one max-length dictionary string;
            # the guard first rejects dims the stream could never fill
            _lzw_frame_guard(iw * ih, len(lzw), min_code_size)
            indices = _lzw_decode(
                bytes(lzw), min_code_size, max_symbols=iw * ih + 4096
            )
            if len(indices) < iw * ih:
                raise NotImplementedError(
                    f"truncated GIF pixel data: want {iw * ih}, "
                    f"have {len(indices)}"
                )
            indices = indices[: iw * ih]
            sr = sg = sb = 0
            for idx in indices:
                base = idx * 3
                sr += ct[base]
                sg += ct[base + 1]
                sb += ct[base + 2]
            n_px = iw * ih
            return {
                "format": "gif",
                "width": width or iw,
                "height": height or ih,
                "mean_r": sr / n_px,
                "mean_g": sg / n_px,
                "mean_b": sb / n_px,
            }
        elif b == 0x3B:  # trailer
            break
        else:
            raise NotImplementedError(f"unknown GIF block 0x{b:02x}")
    raise NotImplementedError("GIF without an image block")


def build_gif_pixels(
    width: int, height: int, indices: list[int], palette: bytes
) -> bytes:
    """Construct a REAL single-frame GIF from palette indices — the
    build twin of :func:`decode_gif_pixels`, with a genuine LZW
    stream (dictionary growth, width escalation, CLEAR on overflow)."""
    import struct

    n_colors = len(palette) // 3
    size_field = max(1, (n_colors - 1).bit_length()) - 1
    table_n = 2 << size_field
    pal = palette + bytes(3 * (table_n - n_colors))
    min_code_size = max(2, (table_n - 1).bit_length())
    lzw = _lzw_encode(indices, min_code_size)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0x80 | size_field, 0, 0])
        + pal
        + b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        + bytes([min_code_size])
        + bytes(blocks)
        + b"\x3b"
    )


def pixel_meta_for(doc_id: int) -> dict:
    """Deterministic pixel recipe for `attach_pixel_media`, chosen so
    the channel means have a CLOSED FORM a SQL oracle can recompute:
    every pixel in row ``y`` has channel value ``base_c + y`` (no
    byte wraparound: base < 128, h ≤ 14), so
    ``mean_c = base_c + (h - 1) / 2`` exactly. Formats rotate by
    doc_id % 3: PNG (exercising inflate + unfiltering), raw P6
    netpbm, and GIF (exercising the LZW codec pair — row ``y`` maps
    to palette entry ``y`` holding exactly (base_r+y, base_g+y,
    base_b+y))."""
    w = 4 + doc_id % 13
    h = 4 + doc_id % 11
    return {
        "format": ("png", "ppm", "gif")[doc_id % 3],
        "width": w,
        "height": h,
        "base": (
            (doc_id * 37) % 128,
            (doc_id * 59) % 128,
            (doc_id * 83) % 128,
        ),
    }


def attach_pixel_media(docs: DataFrame) -> DataFrame:
    """→ (doc_id, payload: binary) where payload is a real decodable
    image (PNG with per-row filters 0-4, or raw P6 netpbm) whose pixel
    data follows `pixel_meta_for`. Arrow-batched construction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                m = pixel_meta_for(int(doc_id))
                w, h = m["width"], m["height"]
                br, bg, bb = m["base"]
                if m["format"] == "gif":
                    palette = bytes(
                        v for y in range(h) for v in (br + y, bg + y, bb + y)
                    )
                    indices = [y for y in range(h) for _x in range(w)]
                    payloads.append(build_gif_pixels(w, h, indices, palette))
                    continue
                pixels = bytes(
                    v
                    for y in range(h)
                    for _x in range(w)
                    for v in (br + y, bg + y, bb + y)
                )
                if m["format"] == "png":
                    payloads.append(build_png_pixels(w, h, pixels, color_type=2))
                else:
                    payloads.append(
                        b"P6\n" + f"{w} {h}\n255\n".encode() + pixels
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_for_codec(docs.select("doc_id")).mapInPandas(
        run, "doc_id long, payload binary"
    )


def extract_pixel_stats(
    with_payload: DataFrame, on_error: str = "raise"
) -> DataFrame:
    """Arrow-batched REAL pixel statistics over image payloads
    (columns: doc_id, payload). → PIXEL_SCHEMA rows. ``on_error``:
    "raise" (default — an undecodable payload fails the task, the
    right mode when payloads are expected-valid) or "null" — the row
    survives with null stats, the mode a 100 TB ingest needs where
    one corrupt file among billions must not kill the job (the seam
    fails CLOSED either way; "null" just quarantines per row)."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_pixels(bytes(payload))
                except NotImplementedError:
                    if on_error == "raise":
                        raise
                    rows.append((doc_id, None, None, None, None, None, None))
                    continue
                rows.append(
                    (
                        doc_id, d["format"], d["width"], d["height"],
                        d["mean_r"], d["mean_g"], d["mean_b"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "format", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return with_payload.mapInPandas(run, PIXEL_SCHEMA)


# ---------------------------------------------------------------------
# REAL audio sample decode (round 6) — raw PCM needs no codec library:
# a WAV data chunk is struct-parseable integers (or IEEE floats), so
# the "audio samples" half of the codec seam closes for every
# uncompressed fmt tag. The seam now holds only genuinely compressed
# audio (ADPCM/MP3/AAC) and video streams.
# ---------------------------------------------------------------------

AUDIO_SCHEMA = (
    "doc_id long, format string, codec string, sample_rate int, "
    "channels int, bits int, n_frames long, duration_sec double, "
    "mean double, rms double, peak double"
)

_WAV_CODECS = {(1, 8): "pcm8", (1, 16): "pcm16", (1, 24): "pcm24",
               (1, 32): "pcm32", (3, 32): "f32",
               (6, 8): "alaw", (7, 8): "ulaw",
               (0x11, 4): "ima_adpcm"}


def ulaw_to_linear(b: int) -> int:
    """G.711 mu-law byte → 14-bit linear sample (pure table math —
    the ITU formula, no codec library): complement, then
    ``((mantissa << 3) + 0x84) << exponent`` re-biased by 0x84."""
    b = ~b & 0xFF
    t = (((b & 0x0F) << 3) + 0x84) << ((b >> 4) & 7)
    return 0x84 - t if b & 0x80 else t - 0x84


def linear_to_ulaw(v: int) -> int:
    """G.711 mu-law encoder twin at 16-bit input scale — the classic
    sndlib/CPython-audioop formulation: arithmetic >>2 to the 14-bit
    domain (this, not a sign-magnitude shift, decides the boundary
    codes on negatives), clip at 8159, bias 33, segment search."""
    v >>= 2  # arithmetic: 16-bit → 14-bit domain
    if v < 0:
        v = -v
        mask = 0x7F
    else:
        mask = 0xFF
    v = min(v, 8159) + 33
    exp = max(v.bit_length() - 6, 0)  # segment: 0 while v <= 0x3F
    if exp > 7:
        return 0x7F ^ mask
    mant = (v >> (exp + 1)) & 0x0F
    return ((exp << 4) | mant) ^ mask


def alaw_to_linear(b: int) -> int:
    """G.711 A-law byte → 13-bit linear sample (ITU formula; even
    bits inverted on the wire, sign bit SET means positive)."""
    b ^= 0x55
    exp = (b >> 4) & 7
    mant = b & 0x0F
    t = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << (exp - 1)
    return t if b & 0x80 else -t


def linear_to_alaw(v: int) -> int:
    """G.711 A-law encoder twin (16-bit input scale; the classic
    sndlib segment search over the 13-bit magnitude)."""
    v >>= 3  # 16-bit → 13-bit magnitude domain
    if v >= 0:
        mask = 0xD5  # sign bit set (positive) + even-bit inversion
    else:
        mask = 0x55
        v = -v - 1
    v = min(v, 0xFFF)
    exp = max(v.bit_length() - 5, 0)  # segment: 0 while v < 0x20
    mant = (v >> 1) & 0x0F if exp < 2 else (v >> exp) & 0x0F
    return ((exp << 4) | mant) ^ mask


@_parse_guard
def decode_wav_samples(payload: bytes) -> dict:
    """FULL WAV sample decode — RIFF chunk walk, then every PCM frame
    parsed from the data chunk: unsigned 8-bit (offset-binary per
    spec), signed 16/24/32-bit little-endian, IEEE float32 (fmt
    tag 3), and the G.711 companded pair — mu-law (tag 7) and A-law
    (tag 6) expanded through the ITU formulas (pure table math, no
    codec library). Returns sample statistics computed EXACTLY —
    integer sums (or exact small-int floats) divided once at the
    end — so a closed-form oracle can reproduce them bit-for-bit:
    ``mean``, ``rms`` (sqrt of mean square), ``peak`` (max |sample|),
    ``n_frames`` (per channel), ``duration_sec``.
    ``NotImplementedError`` marks the remaining genuinely-compressed
    seam: ADPCM/MP3/AAC fmt tags."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise NotImplementedError("truncated WAV fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) < clen:
                raise NotImplementedError("truncated WAV data chunk")
            data = body
        pos += 8 + clen + (clen % 2)
    if fmt is None or data is None:
        raise NotImplementedError("WAV without fmt/data chunks")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    codec = _WAV_CODECS.get((tag, bits))
    if codec is None:
        raise NotImplementedError(
            f"WAV fmt tag {tag}/{bits}-bit not supported (PCM 8/16/24/32, "
            "float32, G.711, and IMA ADPCM decode natively; MP3/AAC "
            "need libraries)"
        )
    if channels <= 0:
        raise NotImplementedError("WAV with no channels")
    if codec == "ima_adpcm":
        if block_align <= 4 * channels or len(data) % block_align:
            raise NotImplementedError("WAV IMA ADPCM blocks not aligned")
        ima_vals = decode_ima_adpcm_wav(data, channels, block_align)
        n = len(ima_vals)
        total = sum(ima_vals)
        total_sq = sum(v * v for v in ima_vals)
        peak = max((abs(v) for v in ima_vals), default=0)
        n_frames = n // channels
        return {
            "format": "wav",
            "codec": codec,
            "sample_rate": rate,
            "channels": channels,
            "bits": bits,
            "n_frames": n_frames,
            "duration_sec": n_frames / rate if rate else 0.0,
            "mean": total / n if n else 0.0,
            "rms": (total_sq / n) ** 0.5 if n else 0.0,
            "peak": float(peak),
        }
    step = bits // 8
    if len(data) % (step * channels):
        raise NotImplementedError("WAV data chunk not frame-aligned")
    n = len(data) // step
    if codec == "f32":
        vals = list(struct.unpack(f"<{n}f", data))
        total = sum(vals)
        total_sq = sum(v * v for v in vals)
        peak = max((abs(v) for v in vals), default=0.0)
    else:
        total = 0
        total_sq = 0
        peak = 0
        if codec in ("pcm8", "ulaw", "alaw"):
            expand = {
                "pcm8": lambda b: b - 128,  # offset-binary per spec
                "ulaw": ulaw_to_linear,
                "alaw": alaw_to_linear,
            }[codec]
            for b in data:
                v = expand(b)
                total += v
                total_sq += v * v
                if v > peak or -v > peak:
                    peak = abs(v)
        else:
            for i in range(0, len(data), step):
                v = int.from_bytes(data[i : i + step], "little", signed=True)
                total += v
                total_sq += v * v
                if v > peak or -v > peak:
                    peak = abs(v)
    n_frames = n // channels
    return {
        "format": "wav",
        "codec": codec,
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames,
        "duration_sec": n_frames / rate if rate else 0.0,
        "mean": total / n if n else 0.0,
        "rms": (total_sq / n) ** 0.5 if n else 0.0,
        "peak": float(peak),
    }


def build_wav_samples(
    samples: list,
    sample_rate: int,
    channels: int = 1,
    bits: int = 16,
    float32: bool = False,
    codec: str | None = None,
) -> bytes:
    """Construct a REAL WAV from a flat interleaved sample list — the
    independent build twin of :func:`decode_wav_samples`. Integer PCM
    at 8 (offset-binary), 16, 24, or 32 bits, IEEE float32 when
    ``float32=True``, or G.711 companded bytes when ``codec`` is
    "ulaw"/"alaw" (samples are LINEAR values run through the real
    encoder)."""
    import struct

    if len(samples) % channels:
        raise ValueError("sample count not divisible by channels")
    if codec == "ima_adpcm":
        if bits != 4:
            raise ValueError("IMA ADPCM WAV is 4-bit")
        n_frames = len(samples) // channels
        if (n_frames - 1) % 8:
            raise ValueError(
                "IMA ADPCM frame count must be 1 + multiple of 8"
            )
        data, block_align = encode_ima_adpcm_wav(samples, channels, n_frames)
        fmt_chunk = struct.pack(
            "<HHIIHHHH", 0x11, channels, sample_rate,
            sample_rate * block_align // n_frames, block_align, 4,
            2, n_frames,  # cbSize=2 + samples_per_block extension
        )
        fact = b"fact" + struct.pack("<II", 4, n_frames)
        pad = b"\x00" if len(data) % 2 else b""
        return (
            b"RIFF"
            + struct.pack(
                "<I",
                4 + 8 + len(fmt_chunk) + len(fact) + 8 + len(data) + len(pad),
            )
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + fact
            + b"data" + struct.pack("<I", len(data)) + data + pad
        )
    if codec in ("ulaw", "alaw"):
        if bits != 8:
            raise ValueError("G.711 WAV is 8-bit")
        tag = 7 if codec == "ulaw" else 6
        enc = linear_to_ulaw if codec == "ulaw" else linear_to_alaw
        data = bytes(enc(int(v)) for v in samples)
    elif float32:
        if bits != 32:
            raise ValueError("float32 WAV is 32-bit")
        tag = 3
        data = struct.pack(f"<{len(samples)}f", *samples)
    else:
        tag = 1
        step = bits // 8
        if bits == 8:
            data = bytes(int(v) + 128 for v in samples)
        else:
            data = b"".join(
                int(v).to_bytes(step, "little", signed=True) for v in samples
            )
    block_align = channels * bits // 8
    fmt_chunk = struct.pack(
        "<HHIIHH", tag, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    # RIFF word alignment: an odd-length data chunk is followed by one
    # pad byte that is NOT counted in the chunk length
    pad = b"\x00" if len(data) % 2 else b""
    return (
        b"RIFF"
        + struct.pack(
            "<I", 4 + 8 + len(fmt_chunk) + 8 + len(data) + len(pad)
        )
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )


def audio_meta_for(doc_id: int) -> dict:
    """Deterministic sample recipe for `attach_audio_media`, chosen so
    every statistic has a CLOSED FORM a SQL oracle can recompute:
    flat (interleaved) sample ``k`` holds ``base + amp * (k % m)``,
    and the total sample count is a multiple of ``m``, so over the
    whole file
    ``mean    = base + amp*(m-1)/2``
    ``rms     = sqrt(base^2 + base*amp*(m-1) + amp^2*(m-1)*(2m-1)/6)``
    ``peak    = max(|base|, |base + amp*(m-1)|)``
    exactly (integer sums, one division — both engines do the same
    double ops). Codec rotates doc_id % 5 over all five uncompressed
    encodings; |sample| ≤ 40 + 7*11 = 117 fits 8-bit PCM."""
    m = 4 + doc_id % 9
    return {
        "codec": ("pcm8", "pcm16", "pcm24", "pcm32", "f32")[doc_id % 5],
        "sample_rate": 8000 + (doc_id * 31) % 32000,
        "channels": 1 + doc_id % 2,
        "m": m,
        "base": -40 + (doc_id * 17) % 81,
        "amp": 1 + doc_id % 7,
        "n_frames": m * (3 + doc_id % 5),
    }


_AUDIO_BITS = {"pcm8": 8, "pcm16": 16, "pcm24": 24, "pcm32": 32, "f32": 32}


def attach_audio_media(docs: DataFrame) -> DataFrame:
    """→ (doc_id, payload: binary) where payload is a real decodable
    WAV whose samples follow `audio_meta_for`. Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                a = audio_meta_for(int(doc_id))
                n = a["n_frames"] * a["channels"]
                samples = [a["base"] + a["amp"] * (k % a["m"]) for k in range(n)]
                payloads.append(
                    build_wav_samples(
                        samples,
                        a["sample_rate"],
                        channels=a["channels"],
                        bits=_AUDIO_BITS[a["codec"]],
                        float32=a["codec"] == "f32",
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_for_codec(docs.select("doc_id")).mapInPandas(
        run, "doc_id long, payload binary"
    )


def extract_audio_stats(
    with_payload: DataFrame, on_error: str = "raise"
) -> DataFrame:
    """Arrow-batched REAL audio statistics over WAV payloads (columns:
    doc_id, payload). → AUDIO_SCHEMA rows; ``on_error`` as in
    :func:`extract_pixel_stats` ("null" quarantines undecodable rows
    instead of failing the task)."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_wav_samples(bytes(payload))
                except NotImplementedError:
                    if on_error == "raise":
                        raise
                    rows.append((doc_id,) + (None,) * 10)
                    continue
                rows.append(
                    (
                        doc_id, d["format"], d["codec"], d["sample_rate"],
                        d["channels"], d["bits"], d["n_frames"],
                        d["duration_sec"], d["mean"], d["rms"], d["peak"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "format", "codec", "sample_rate", "channels",
                    "bits", "n_frames", "duration_sec", "mean", "rms", "peak",
                ],
            )

    return with_payload.mapInPandas(run, AUDIO_SCHEMA)


# ---------------------------------------------------------------------
# REAL FLAC round trip (round 9) — compressed audio with FULL sample
# decode. Codec core in operators/flac.py; this section is the recipe
# + Spark plumbing, mirroring the WAV entry above.

FLAC_SCHEMA = (
    "doc_id long, codec string, sample_rate int, channels int, "
    "bits int, n_frames long, n_flac_frames int, duration_sec double, "
    "mean double, rms double, peak long, md5_ok boolean"
)

_FLAC_BLOCK = 48  # small enough that most docs span several frames


def flac_meta_for(doc_id: int) -> dict:
    """Deterministic FLAC recipe with the `audio_meta_for` closed
    forms, amplified x100 so residuals exercise non-trivial rice
    params: flat interleaved sample ``k`` holds
    ``100*(base + amp*(k % m))`` and the total count is a multiple of
    ``m``, so mean/rms/peak scale the WAV-entry forms by 100 exactly.
    Stereo docs rotate the three decorrelation modes; peak ≤ 11700
    fits 16-bit PCM."""
    m = 4 + doc_id % 9
    return {
        "sample_rate": 8000 + (doc_id * 31) % 32000,
        "channels": 1 + doc_id % 2,
        "m": m,
        "base": 100 * (-40 + (doc_id * 17) % 81),
        "amp": 100 * (1 + doc_id % 7),
        "n_frames": m * (6 + doc_id % 7),
        "stereo_mode": (
            "independent"
            if doc_id % 2 == 0
            else ("left_side", "right_side", "mid_side")[doc_id % 3]
        ),
    }


def attach_flac_media(docs: DataFrame) -> DataFrame:
    """→ (doc_id, payload: binary) where payload is a REAL FLAC file
    (rice-coded fixed-predictor frames, stereo decorrelation, CRC-8/16,
    PCM MD5) whose samples follow `flac_meta_for`. Arrow-batched."""
    from optimal_parallel_fp_growth_spark.operators.flac import (
        build_flac_samples,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                a = flac_meta_for(int(doc_id))
                n = a["n_frames"] * a["channels"]
                samples = [a["base"] + a["amp"] * (k % a["m"]) for k in range(n)]
                payloads.append(
                    build_flac_samples(
                        samples,
                        a["sample_rate"],
                        channels=a["channels"],
                        block_size=_FLAC_BLOCK,
                        stereo_mode=a["stereo_mode"],
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_for_codec(docs.select("doc_id")).mapInPandas(
        run, "doc_id long, payload binary"
    )


def extract_flac_stats(
    with_payload: DataFrame, on_error: str = "raise"
) -> DataFrame:
    """Arrow-batched FULL FLAC decode over payload rows → FLAC_SCHEMA
    (exact integer-sum statistics plus the CRC/MD5 verification
    verdict); ``on_error`` as in :func:`extract_pixel_stats`."""
    from optimal_parallel_fp_growth_spark.operators.flac import (
        decode_flac_samples,
    )

    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_flac_samples(bytes(payload))
                except NotImplementedError:
                    if on_error == "raise":
                        raise
                    rows.append((doc_id,) + (None,) * 11)
                    continue
                rows.append(
                    (
                        doc_id, d["codec"], d["sample_rate"], d["channels"],
                        d["bits"], d["n_frames"], d["n_flac_frames"],
                        d["duration_sec"], d["mean"], d["rms"], d["peak"],
                        d["md5_ok"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "codec", "sample_rate", "channels", "bits",
                    "n_frames", "n_flac_frames", "duration_sec", "mean",
                    "rms", "peak", "md5_ok",
                ],
            )

    return with_payload.mapInPandas(run, FLAC_SCHEMA)


# ---------------------------------------------------------------------
# REAL baseline JPEG decode (round 6) — the last image codec behind
# the seam. Pure Python/numpy: marker walk, DQT/DHT/SOF0/SOS parsing,
# canonical Huffman decode with byte unstuffing and restart markers,
# dequantize + dezigzag, separable float IDCT, YCbCr→RGB. The build
# twin is a REAL encoder (FDCT, quantize, zigzag, Huffman with the
# spec Annex K luminance tables) so round trips are self-contained.
# Scope: baseline sequential (SOF0), 8-bit, grayscale or 4:4:4 color —
# progressive and chroma-subsampled files stay behind
# ``NotImplementedError`` (with arithmetic coding and 12-bit depth).
# ---------------------------------------------------------------------


def _jpeg_zigzag() -> list:
    """Spec zigzag order as flat y*8+x indices, generated (not
    transcribed): diagonals s = x + y; even diagonals walk row-
    decreasing, odd ones row-increasing."""
    out = []
    for s in range(15):
        ys = range(min(s, 7), max(0, s - 7) - 1, -1)
        out.extend(
            (y * 8 + (s - y)) for y in (ys if s % 2 == 0 else reversed(list(ys)))
        )
    return out


_JPEG_ZZ = _jpeg_zigzag()

# Annex K (spec Table K.3/K.5) luminance Huffman tables — used for
# every component we emit; the decoder never assumes them (it reads
# whatever DHT declares).
_JPEG_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
# 12-bit variant: Annex-K DC lengths with categories 12..15 appended
# one per code length 10..13 (canonically feasible — each deeper level
# inherits free code space). The decoder never assumes this table; it
# reads whatever the DHT declares.
_JPEG_DC12_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0)
_JPEG_DC12_VALS = tuple(range(16))
_JPEG_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)


# AC table for refinement scans: Annex K has no EOBn (n>=1) symbols —
# progressive refinement needs them, so we declare our own table in
# DHT (as any table must be): the 32 symbols refinement can emit, all
# at 6 bits (a valid canonical set: 32 < 2^6, no shorter codes).
_JPEG_ACR_BITS = (0, 0, 0, 0, 0, 32, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
_JPEG_ACR_VALS = tuple(
    [0x00, 0xF0]
    + [r << 4 for r in range(1, 15)]
    + [(run << 4) | 1 for run in range(16)]
)


def _jpeg_canonical(bits, vals):
    """Canonical Huffman walk shared by both directions: yields
    (length, code, value) in code order; raises if the counts overflow
    the code space (a corrupt DHT)."""
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise NotImplementedError("corrupt JPEG Huffman table")
            yield length, code, vals[k]
            code += 1
            k += 1
        code <<= 1


def _idct_matrix():
    import numpy as np

    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    c[0, :] /= np.sqrt(2.0)
    return c  # C[u, x]; spatial = C.T @ coeff @ C


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; restart markers surface as events (the MCU loop resets
    DC predictors), anything else 0xFFxx ends or rejects the scan."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _JpegRestart(self.pos)
            else:
                raise NotImplementedError(
                    f"unexpected marker 0xFF{nxt:02X} inside JPEG scan"
                )
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huffman(self, table: dict) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            v = table.get((length, code))
            if v is not None:
                return v
        raise NotImplementedError("invalid JPEG Huffman code in scan")

    def align_after_restart(self) -> None:
        # byte-align and step over the 2-byte RST marker
        self.nbits = 0
        while self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


class _JpegRestart(Exception):
    def __init__(self, pos):
        self.pos = pos


def _jpeg_extend(r: int, t: int) -> int:
    return r - (1 << t) + 1 if t and r < (1 << (t - 1)) else r


@_parse_guard
def decode_jpeg_pixels(payload: bytes) -> dict:
    """FULL JPEG decode, baseline AND progressive: marker walk,
    quant/Huffman tables from DQT/DHT (never assumed), any integer
    sampling-factor grid (4:4:4, 4:2:2, 4:2:0, …; chroma upsamples by
    block replication), restart intervals, multi-scan SOF2 with
    spectral selection (interleaved DC scans, per-component AC scans
    with EOBRUN block skipping) and DC successive approximation
    (point transform + refinement bits). Every scan accumulates into
    per-component coefficient buffers; dequantize + IDCT + BT.601
    color run once at the end. Returns the same shape as
    :func:`decode_pixels`. AC successive-approximation refinement decodes too (newly-visible
    coefficients, correction bits, EOB runs that still carry
    correction bits); 12-bit SOF1/SOF2 decodes (round 7), lossless
    SOF3 and hierarchical DHP pyramids dispatch to their decoders
    (rounds 7/9). The remaining seam: arithmetic coding raises
    ``NotImplementedError``."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload (no SOI)")
    quant: dict[int, list] = {}
    huff: dict[tuple, dict] = {}  # (class, id) -> {(len, code): val}
    sof = None
    restart_interval = 0
    coeffs: list = []  # per comp: {(by, bx): list[64] in zigzag order}
    geom = None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("JPEG marker stream out of sync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                i += 1
                if prec == 0:
                    quant[tid] = list(body[i : i + 64])
                    i += 64
                else:
                    quant[tid] = [
                        struct.unpack(">H", body[i + 2 * k : i + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = {
                    (ln, code): v for ln, code, v in _jpeg_canonical(bits, vals)
                }
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential / SOF2
            # progressive — all Huffman-coded; SOF1/SOF2 may carry
            # 12-bit precision (round 7), SOF0 is 8-bit by spec.
            depth, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if depth not in (8, 12):
                raise NotImplementedError(f"JPEG bit depth {depth} not supported")
            if depth == 12 and marker == 0xC0:
                raise NotImplementedError(
                    "12-bit precision is not legal in baseline SOF0 "
                    "(spec B.2.2); use SOF1/SOF2"
                )
            if w == 0 or h == 0:
                raise NotImplementedError("zero-dimension JPEG frame")
            comps = []
            for k in range(ncomp):
                cid, samp, tq = body[6 + 3 * k : 9 + 3 * k]
                hs, vs = samp >> 4, samp & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hs}x{vs} out of range"
                    )
                comps.append({"id": cid, "tq": tq, "h": hs, "v": vs})
            sof = (w, h, comps, marker == 0xC2)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            geom = {
                "hmax": hmax,
                "vmax": vmax,
                "mcux": (w + 8 * hmax - 1) // (8 * hmax),
                "mcuy": (h + 8 * vmax - 1) // (8 * vmax),
                "depth": depth,
            }
            for c in comps:
                # non-interleaved block grid (spec A.2.2): over the
                # component's own sample rectangle
                cw = (w * c["h"] + hmax - 1) // hmax
                ch = (h * c["v"] + vmax - 1) // vmax
                c["nbw"] = (cw + 7) // 8
                c["nbh"] = (ch + 7) // 8
            coeffs = [dict() for _ in comps]
        elif marker == 0xC3:  # lossless (predictor) process — round 7
            return decode_jpeg_lossless(payload)
        elif marker == 0xDE:  # DHP: hierarchical pyramid — round 9
            return decode_jpeg_hierarchical(payload)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF type 0xFF{marker:02X} not supported (Huffman "
                "SOF0/SOF1/SOF2 + lossless SOF3 + hierarchical "
                "DHP/SOF5 decode, incl. 12-bit; a differential SOF "
                "outside a DHP pyramid is invalid, and arithmetic "
                "coding is the table-bound seam)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise NotImplementedError("JPEG SOS before SOF")
            w, h, comps, progressive = sof
            ns = body[0]
            scan = []
            for k in range(ns):
                cs, tables = body[1 + 2 * k : 3 + 2 * k]
                ci = next(
                    (i for i, c in enumerate(comps) if c["id"] == cs), None
                )
                if ci is None:
                    raise NotImplementedError(
                        f"JPEG scan references unknown component id {cs}"
                    )
                scan.append((ci, tables >> 4, tables & 0xF))
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _jpeg_decode_scan_into(
                payload, pos + 2 + seg_len, comps, geom, huff, coeffs,
                scan, ss, se, ah, al, restart_interval,
            )
            continue
        pos += 2 + seg_len
    if sof is None or not coeffs or not any(coeffs):
        raise NotImplementedError("JPEG without a decoded scan")
    w, h, comps, _prog = sof
    return _jpeg_reconstruct(w, h, comps, geom, quant, coeffs, np)


def _jpeg_decode_scan_into(
    payload, start, comps, geom, huff, coeffs, scan, ss, se, ah, al,
    restart_interval,
):
    """Decode ONE entropy-coded scan into the coefficient buffers and
    return the payload offset of the next marker. Handles interleaved
    (multi-component) and non-interleaved (single-component) MCU
    geometry, progressive spectral windows [ss, se], DC point
    transform/refinement (ah, al), EOBRUN block skipping, and restart
    markers."""
    reader = _JpegBitReader(payload, start)
    preds = {ci: 0 for ci, _, _ in scan}
    state = {"eobrun": 0}

    def block_coef(ci, by, bx):
        c = coeffs[ci].get((by, bx))
        if c is None:
            c = [0] * 64
            coeffs[ci][(by, bx)] = c
        return c

    def correct(coef, k, p1):
        """One AC correction bit (spec G.1.2.3): a set bit nudges an
        already-nonzero coefficient one quantum away from zero at the
        current bit position — unless that bit is already set."""
        if reader.read_bit() and (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else -p1

    def decode_block_ac_refine(ac_tab, coef):
        p1 = 1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.read_huffman(ac_tab)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:  # EOBn: correction-only from here on
                        state["eobrun"] = (1 << r) + (
                            reader.receive(r) if r else 0
                        )
                        break
                    new = 0  # ZRL: skip 16 zero-history positions
                elif s == 1:
                    new = p1 if reader.read_bit() else -p1
                else:
                    raise NotImplementedError(
                        "JPEG refinement coefficient magnitude > 1"
                    )
                # advance past r zero-history positions, correcting
                # every nonzero-history coefficient on the way
                while k <= se:
                    if coef[k] != 0:
                        correct(coef, k, p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s == 1:
                    if k > se:
                        raise NotImplementedError(
                            "JPEG refinement AC index overflow"
                        )
                    coef[k] = new
                k += 1
        if state["eobrun"] > 0:
            # blocks inside an EOB run still carry correction bits for
            # their nonzero-history coefficients in the window
            while k <= se:
                if coef[k] != 0:
                    correct(coef, k, p1)
                k += 1
            state["eobrun"] -= 1

    def decode_block(ci, dc_tab, ac_tab, coef):
        if ss > 0 and ah != 0:
            decode_block_ac_refine(ac_tab, coef)
            return
        if ss == 0:
            if ah == 0:
                t = reader.read_huffman(dc_tab)
                preds[ci] += _jpeg_extend(reader.receive(t), t)
                coef[0] = preds[ci] << al
            else:  # DC refinement: one correction bit at al
                if reader.read_bit():
                    coef[0] |= 1 << al
            if se == 0:
                return
            k = 1
        else:
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            k = ss
        while k <= se:
            rs = reader.read_huffman(ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                # EOBn: run of (2^r - 1 + extra) blocks ends here
                # (baseline's EOB is the r == 0 case of the same rule)
                state["eobrun"] = (1 << r) - 1 + (
                    reader.receive(r) if r else 0
                )
                break
            k += r
            if k > se:
                raise NotImplementedError("JPEG AC index overflow")
            coef[k] = _jpeg_extend(reader.receive(s), s) << al
            k += 1

    tabs = {
        ci: (huff.get((0, td)), huff.get((1, ta))) for ci, td, ta in scan
    }
    if len(scan) > 1:  # interleaved: the full MCU grid
        n_units = geom["mcux"] * geom["mcuy"]

        def unit_blocks(u):
            my, mx = divmod(u, geom["mcux"])
            for ci, _td, _ta in scan:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        yield ci, my * c["v"] + by, mx * c["h"] + bx
    else:  # non-interleaved: the component's own block grid
        ci0 = scan[0][0]
        c0 = comps[ci0]
        n_units = c0["nbw"] * c0["nbh"]

        def unit_blocks(u):
            yield ci0, u // c0["nbw"], u % c0["nbw"]

    done = 0
    for u in range(n_units):
        if restart_interval and done == restart_interval:
            reader.align_after_restart()
            preds.update({ci: 0 for ci in preds})
            state["eobrun"] = 0
            done = 0
        try:
            for ci, by, bx in unit_blocks(u):
                dc_tab, ac_tab = tabs[ci]
                decode_block(ci, dc_tab, ac_tab, block_coef(ci, by, bx))
        except _JpegRestart:
            raise NotImplementedError("JPEG restart interval mismatch")
        done += 1
    # step to the next marker (skip pad bits / stuffed bytes)
    p = reader.pos
    d = payload
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] != 0x00 and not (
            0xD0 <= d[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return len(d) - 2


def _jpeg_reconstruct(w, h, comps, geom, quant, coeffs, np):
    C = _idct_matrix()
    planes = []
    for ci, c in enumerate(comps):
        bw = geom["mcux"] * c["h"]
        bh = geom["mcuy"] * c["v"]
        plane = np.zeros((bh * 8, bw * 8))
        q = quant[c["tq"]]
        for (by, bx), zz in coeffs[ci].items():
            nat = np.zeros(64)
            for i, idx in enumerate(_JPEG_ZZ):
                nat[idx] = zz[i] * q[i]
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                C.T @ nat.reshape(8, 8) @ C
            )
        planes.append(plane)
    hmax, vmax = geom["hmax"], geom["vmax"]
    up = []
    for c, p in zip(comps, planes):
        fx, fy = hmax // c["h"], vmax // c["v"]
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                "non-integer JPEG upsampling ratio not supported"
            )
        if fx > 1:
            p = np.repeat(p, fx, axis=1)
        if fy > 1:
            p = np.repeat(p, fy, axis=0)
        up.append(p)
    # sample domain follows the SOF precision: level shift 2^(P-1),
    # clamp to 0..2^P-1; 12-bit means are reported over 0..4095, the
    # same native-range convention as 16-bit PNG.
    level = float(1 << (geom.get("depth", 8) - 1))
    maxv = 2 * level - 1
    planes = [np.clip(np.rint(p[:h, :w] + level), 0, maxv) for p in up]
    if len(planes) == 1:
        m = float(planes[0].mean())
        means = (m, m, m)
    elif len(planes) == 3:
        y, cb, cr = planes
        r = np.clip(np.rint(y + 1.402 * (cr - level)), 0, maxv)
        g = np.clip(
            np.rint(y - 0.344136 * (cb - level) - 0.714136 * (cr - level)),
            0, maxv,
        )
        b = np.clip(np.rint(y + 1.772 * (cb - level)), 0, maxv)
        means = (float(r.mean()), float(g.mean()), float(b.mean()))
    else:
        raise NotImplementedError(
            f"JPEG with {len(planes)} components not supported"
        )
    return {
        "format": "jpeg",
        "width": w,
        "height": h,
        "mean_r": means[0],
        "mean_g": means[1],
        "mean_b": means[2],
    }


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> bytes:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def build_jpeg_pixels(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    dc_quant: int = 8,
    ac_quant: int = 16,
    subsampling: str = "444",
    progressive: bool = False,
    dc_split: bool = False,
    ac_split: bool = False,
    precision: int = 8,
) -> bytes:
    """Construct a REAL JPEG — the independent encoder twin of
    :func:`decode_jpeg_pixels`: float FDCT, rounding quantization
    (DC step ``dc_quant``, AC step ``ac_quant``), zigzag, DPCM DC,
    and Huffman entropy coding with the Annex K luminance tables
    (declared in DHT, as any table must be). ``channels=1`` encodes
    grayscale; ``channels=3`` takes interleaved RGB and encodes
    YCbCr (BT.601) at ``subsampling`` "444", "422", or "420"
    (chroma mean-downsampled, Y at 2x1/2x2 sampling factors).
    ``progressive=True`` emits a genuine SOF2 multi-scan file:
    an interleaved DC scan (Ss=Se=0) followed by one NON-interleaved
    AC scan per component (Ss=1, Se=63) over its own block grid —
    spectral selection, the structural core of progressive JPEG.
    Images whose 8x8 blocks are FLAT and whose values satisfy
    ``dc_quant | 8*(v-128)`` round-trip EXACTLY — the property the
    closed-form oracle recipe uses."""
    import struct

    import numpy as np

    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if precision == 12:
        # 12-bit (round 7): extended-sequential SOF1, grayscale; the
        # sample domain is 0..4095 (uint16 LE input), level shift
        # 2048, and the DC Huffman table is the Annex-K table extended
        # with categories 12..15 (a 12-bit DC diff spans up to 2^13).
        if channels != 1:
            raise ValueError("12-bit encode supports grayscale only")
        if progressive or dc_split or ac_split:
            raise ValueError("12-bit encode emits sequential SOF1 only")
        if len(pixels) != width * height * 2:
            raise ValueError("pixel buffer does not match dims (uint16 LE)")
        arr = np.frombuffer(bytes(pixels), dtype="<u2").astype(np.float64)
        if arr.max(initial=0) > 4095:
            raise ValueError("12-bit samples must be <= 4095")
    elif len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dims")
    else:
        arr = np.frombuffer(bytes(pixels), dtype=np.uint8).astype(np.float64)
    level = float(1 << (precision - 1))
    if channels == 1:
        planes = [arr.reshape(height, width)]
        comp_ids = [1]
    elif channels == 3:
        rgb = arr.reshape(height, width, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [np.clip(np.rint(p), 0, 255) for p in (y, cb, cr)]
        comp_ids = [1, 2, 3]
    else:
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")

    samp = {
        "444": [(1, 1), (1, 1), (1, 1)],
        "422": [(2, 1), (1, 1), (1, 1)],
        "420": [(2, 2), (1, 1), (1, 1)],
    }.get(subsampling)
    if samp is None:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    samp = samp[: len(planes)]
    if channels == 1:
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    def _pad_to(p, ph, pw):
        hh, ww = p.shape
        pp = np.empty((ph, pw))
        pp[:hh, :ww] = p
        pp[hh:, :ww] = p[-1:, :]
        pp[:, ww:] = pp[:, ww - 1 : ww]
        return pp

    padded = []
    for (hs, vs), p in zip(samp, planes):
        fx, fy = hmax // hs, vmax // vs
        if fx > 1 or fy > 1:
            # chroma downsample: mean over fx x fy cells (pad to a
            # cell multiple first so edges average real samples)
            p = _pad_to(
                p,
                (p.shape[0] + fy - 1) // fy * fy,
                (p.shape[1] + fx - 1) // fx * fx,
            )
            p = p.reshape(
                p.shape[0] // fy, fy, p.shape[1] // fx, fx
            ).mean(axis=(1, 3))
            p = np.clip(np.rint(p), 0, 255)
        padded.append(_pad_to(p, mcuy * vs * 8, mcux * hs * 8))

    q = [dc_quant] + [ac_quant] * 63
    C = _idct_matrix()
    dc_bits, dc_vals = (
        (_JPEG_DC12_BITS, _JPEG_DC12_VALS)
        if precision == 12
        else (_JPEG_DC_BITS, _JPEG_DC_VALS)
    )
    dc_enc = {
        v: (code, ln)
        for ln, code, v in _jpeg_canonical(dc_bits, dc_vals)
    }
    ac_enc = {
        v: (code, ln)
        for ln, code, v in _jpeg_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)
    }
    acr_enc = {
        v: (code, ln)
        for ln, code, v in _jpeg_canonical(_JPEG_ACR_BITS, _JPEG_ACR_VALS)
    }
    def emit_mag(v: int) -> tuple:
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        r = v if v >= 0 else v + (1 << t) - 1
        return t, r

    def block_zz(p, y0, x0):
        block = p[y0 : y0 + 8, x0 : x0 + 8] - level
        coeff = C @ block @ C.T
        return [
            int(np.rint(coeff.flat[idx] / q[i]))
            for i, idx in enumerate(_JPEG_ZZ)
        ]

    def write_dc(writer, zz, preds, ci):
        diff = zz[0] - preds[ci]
        preds[ci] = zz[0]
        t, r = emit_mag(diff)
        code, ln = dc_enc[t]
        writer.write(code, ln)
        if t:
            writer.write(r, t)

    def write_ac(writer, zz):
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]
                writer.write(code, ln)
                run -= 16
            t, r = emit_mag(zz[k])
            code, ln = ac_enc[(run << 4) | t]
            writer.write(code, ln)
            writer.write(r, t)
            run = 0
        if last_nz < 63:
            code, ln = ac_enc[0x00]  # EOB (== EOB0 in progressive)
            writer.write(code, ln)

    # every block's quantized coefficients, computed once
    zz_store = [
        {
            (by, bx): block_zz(p, by * 8, bx * 8)
            for by in range(mcuy * vs)
            for bx in range(mcux * hs)
        }
        for (hs, vs), p in zip(samp, padded)
    ]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos_seg(comp_idx, ss, se, ah=0, al=0, tables=0x00):
        body = bytes([len(comp_idx)]) + b"".join(
            bytes([comp_ids[ci], tables]) for ci in comp_idx
        ) + bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    scans = []
    if not progressive:
        writer = _JpegBitWriter()
        preds = [0] * len(padded)
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hs, vs) in enumerate(samp):
                    for by in range(vs):
                        for bx in range(hs):
                            zz = zz_store[ci][(my * vs + by, mx * hs + bx)]
                            write_dc(writer, zz, preds, ci)
                            write_ac(writer, zz)
        scans.append(sos_seg(range(len(padded)), 0, 63) + writer.flush())
    else:
        # DC with successive approximation when dc_split: a first scan
        # of (dc >> 1) DPCM diffs at Al=1, then a refinement scan of
        # one low bit per block (spec G.1.2.1) — exercising the
        # decoder's point-transform and refinement paths for real
        def dc_scan(al):
            writer = _JpegBitWriter()
            preds = [0] * len(padded)
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (hs, vs) in enumerate(samp):
                        for by in range(vs):
                            for bx in range(hs):
                                zz = zz_store[ci][
                                    (my * vs + by, mx * hs + bx)
                                ]
                                write_dc(
                                    writer,
                                    [zz[0] >> al] + zz[1:],
                                    preds,
                                    ci,
                                )
            return writer

        if dc_split:
            scans.append(
                sos_seg(range(len(padded)), 0, 0, 0, 1) + dc_scan(1).flush()
            )
            writer = _JpegBitWriter()
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (hs, vs) in enumerate(samp):
                        for by in range(vs):
                            for bx in range(hs):
                                zz = zz_store[ci][
                                    (my * vs + by, mx * hs + bx)
                                ]
                                writer.write(zz[0] & 1, 1)
            scans.append(
                sos_seg(range(len(padded)), 0, 0, 1, 0) + writer.flush()
            )
        else:
            scans.append(
                sos_seg(range(len(padded)), 0, 0) + dc_scan(0).flush()
            )
        # per-component AC scans (Ss=1..Se=63, NON-interleaved: the
        # component's own block grid per spec A.2.2). With ac_split,
        # each component gets TWO scans: the top bits at Al=1
        # (magnitudes integer-divided toward zero, spec G.1.2.2),
        # then a refinement scan at Ah=1/Al=0 — newly-visible
        # coefficients as (run, 1)+sign, already-sent ones as
        # correction bits buffered and flushed after each symbol,
        # fully-silent blocks accumulated into EOBn runs.
        def flush_eobrun(writer, pending):
            # EOBn with symbol r covers runs in [2^r, 2^(r+1)-1];
            # longer runs split across symbols
            while pending[0] > 0:
                n = pending[0]
                r = min(n.bit_length() - 1, 14)
                run = min(n, (1 << (r + 1)) - 1)
                code, ln = acr_enc[r << 4]
                writer.write(code, ln)
                if r:
                    writer.write(run - (1 << r), r)
                pending[0] -= run

        def write_ac_refinement(writer, zz, pending):
            mag = [abs(v) for v in zz]
            eobpos = max((k for k in range(1, 64) if mag[k] == 1), default=0)
            hist_after = [k for k in range(eobpos + 1, 64) if mag[k] > 1]
            if eobpos == 0 and not any(mag[k] > 1 for k in range(1, 64)):
                pending[0] += 1  # nothing to say: join the EOB run
                return
            flush_eobrun(writer, pending)
            run = 0
            br: list = []
            for k in range(1, eobpos + 1):
                if mag[k] == 0:
                    run += 1
                elif mag[k] > 1:
                    br.append(mag[k] & 1)  # correction bit (Al = 0)
                else:  # newly visible at this bit position
                    while run > 15:
                        code, ln = acr_enc[0xF0]
                        writer.write(code, ln)
                        for b in br:
                            writer.write(b, 1)
                        br = []
                        run -= 16
                    code, ln = acr_enc[(run << 4) | 1]
                    writer.write(code, ln)
                    writer.write(1 if zz[k] > 0 else 0, 1)
                    for b in br:
                        writer.write(b, 1)
                    br = []
                    run = 0
            if eobpos < 63:
                code, ln = acr_enc[0x00]  # EOB0: remainder is
                writer.write(code, ln)  # correction-only
                for k in hist_after:
                    writer.write(mag[k] & 1, 1)

        for ci, (hs, vs) in enumerate(samp):
            cw = (width * hs + hmax - 1) // hmax
            ch = (height * vs + vmax - 1) // vmax
            nbw, nbh = (cw + 7) // 8, (ch + 7) // 8
            blocks = [
                zz_store[ci][(by, bx)]
                for by in range(nbh)
                for bx in range(nbw)
            ]
            if not ac_split:
                writer = _JpegBitWriter()
                for zz in blocks:
                    write_ac(writer, zz)
                scans.append(sos_seg([ci], 1, 63) + writer.flush())
                continue
            # scan A: magnitudes >> 1, sign preserved (toward zero)
            writer = _JpegBitWriter()
            for zz in blocks:
                shifted = [zz[0]] + [
                    (abs(v) >> 1) * (1 if v >= 0 else -1) for v in zz[1:]
                ]
                write_ac(writer, shifted)
            scans.append(sos_seg([ci], 1, 63, 0, 1) + writer.flush())
            # scan B: the low bit, refinement-coded
            writer = _JpegBitWriter()
            pending = [0]
            for zz in blocks:
                write_ac_refinement(writer, zz, pending)
            # trailing silent blocks: flush the EOB run
            flush_eobrun(writer, pending)
            scans.append(
                sos_seg([ci], 1, 63, 1, 0, tables=0x01) + writer.flush()
            )

    dqt = seg(0xDB, bytes([0x00]) + bytes(q))
    sof_body = struct.pack(
        ">BHHB", precision, height, width, len(padded)
    ) + b"".join(
        bytes([cid, (hs << 4) | vs, 0])
        for cid, (hs, vs) in zip(comp_ids, samp)
    )
    sof_marker = 0xC2 if progressive else (0xC1 if precision == 12 else 0xC0)
    sof = seg(sof_marker, sof_body)
    dht_body = (
        bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    )
    if progressive and ac_split:
        dht_body += (
            bytes([0x11]) + bytes(_JPEG_ACR_BITS) + bytes(_JPEG_ACR_VALS)
        )
    dht = seg(0xC4, dht_body)
    return b"\xff\xd8" + dqt + sof + dht + b"".join(scans) + b"\xff\xd9"


# ---------------------------------------------------------------------
# Hierarchical JPEG (T.81 Annex J) — round 9. The pyramid process is
# pure STRUCTURE over the round-6 machinery: DHP declares the final
# frame geometry, each pyramid level is an ordinary Huffman DCT frame
# (non-differential SOF0 first, differential SOF5 after), EXP doubles
# the reference with the spec's (a+b+1)>>1 interpolation, and a
# differential frame's IDCT output is ADDED to the reference (no level
# shift) with the final clamp at output. Scope: grayscale, Huffman
# sequential levels — the honest subset this container can verify
# end-to-end; arithmetic coding remains the table-bound seam.


def _jpeg_expand_ref(ref, eh: int, ev: int, np):
    """T.81 J.1.1.2 reference expansion: output(2i) = input(i),
    output(2i+1) = (input(i) + input(i+1) + 1) >> 1, last sample
    replicated; applied per axis when the EXP nibble is 1."""
    out = ref
    if eh:
        left = out
        right = np.concatenate([out[:, 1:], out[:, -1:]], axis=1)
        odd = (left + right + 1) // 2
        inter = np.empty((out.shape[0], out.shape[1] * 2), dtype=out.dtype)
        inter[:, 0::2] = left
        inter[:, 1::2] = odd
        out = inter
    if ev:
        top = out
        bot = np.concatenate([out[1:, :], out[-1:, :]], axis=0)
        odd = (top + bot + 1) // 2
        inter = np.empty((out.shape[0] * 2, out.shape[1]), dtype=out.dtype)
        inter[0::2, :] = top
        inter[1::2, :] = odd
        out = inter
    return out


def _hier_frame_geom(w: int, h: int) -> tuple[list, dict]:
    comps = [{"id": 1, "tq": 0, "h": 1, "v": 1,
              "nbw": (w + 7) // 8, "nbh": (h + 7) // 8}]
    geom = {"hmax": 1, "vmax": 1, "mcux": (w + 7) // 8,
            "mcuy": (h + 7) // 8, "depth": 8}
    return comps, geom


@_parse_guard
def decode_jpeg_hierarchical(payload: bytes) -> dict:
    """Decode a hierarchical (DHP) JPEG: tables-misc accumulation
    across frames, the initial non-differential SOF0 level, EXP
    reference expansion, and differential SOF5 levels whose decoded
    difference adds to the reference. Returns the
    :func:`decode_pixels` shape (grayscale: mean_r == mean_g ==
    mean_b) plus ``n_levels``."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload (no SOI)")
    quant: dict[int, list] = {}
    huff: dict[tuple, dict] = {}
    dhp = None
    ref = None
    pending_exp = (0, 0)
    n_levels = 0
    restart_interval = 0
    frame = None  # (comps, geom, coeffs, differential)
    C = _idct_matrix()

    def finish_frame():
        nonlocal ref, n_levels, frame, pending_exp
        comps, geom, coeffs, differential = frame
        w, h = frame_dims
        q = quant[comps[0]["tq"]]
        plane = np.zeros((geom["mcuy"] * 8, geom["mcux"] * 8))
        for (by, bx), zz in coeffs[0].items():
            nat = np.zeros(64)
            for i, idx in enumerate(_JPEG_ZZ):
                nat[idx] = zz[i] * q[i]
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                C.T @ nat.reshape(8, 8) @ C
            )
        plane = np.rint(plane[:h, :w]).astype(np.int64)
        if not differential:
            ref = np.clip(plane + 128, 0, 255)
        else:
            base = _jpeg_expand_ref(ref, *pending_exp, np)
            if base.shape != (h, w):
                raise NotImplementedError(
                    "differential JPEG frame dims do not match the "
                    "(expanded) reference"
                )
            ref = np.clip(base + plane, 0, 255)
        pending_exp = (0, 0)
        n_levels += 1
        frame = None

    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("JPEG marker stream out of sync")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                i += 1
                if prec:
                    raise NotImplementedError(
                        "16-bit DQT in hierarchical frame not supported"
                    )
                quant[tid] = list(body[i : i + 64])
                i += 64
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = {
                    (ln, code): v
                    for ln, code, v in _jpeg_canonical(bits, vals)
                }
                i += 17 + n
        elif marker == 0xDE:  # DHP — declares the FINAL geometry
            if dhp is not None:
                raise NotImplementedError("multiple DHP segments")
            depth, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if depth != 8 or ncomp != 1:
                raise NotImplementedError(
                    "hierarchical decode supports 8-bit grayscale"
                )
            dhp = (fw, fh)
        elif marker == 0xDF:  # EXP — expand reference for next frame
            if ref is None:
                raise NotImplementedError("EXP before any decoded frame")
            pending_exp = (body[0] >> 4, body[0] & 0xF)
            if pending_exp[0] > 1 or pending_exp[1] > 1:
                raise NotImplementedError("EXP nibbles must be 0 or 1")
        elif marker in (0xC0, 0xC5):
            if dhp is None:
                raise NotImplementedError(
                    "hierarchical frame before DHP (use decode_jpeg_pixels)"
                )
            if frame is not None:
                raise NotImplementedError("nested JPEG frames")
            differential = marker == 0xC5
            if differential and ref is None:
                raise NotImplementedError(
                    "differential frame before the initial frame"
                )
            if not differential and ref is not None:
                raise NotImplementedError(
                    "second non-differential frame in a hierarchical file"
                )
            depth, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if depth != 8 or ncomp != 1:
                raise NotImplementedError(
                    "hierarchical decode supports 8-bit grayscale"
                )
            comps, geom = _hier_frame_geom(w, h)
            comps[0]["id"] = body[6]
            comps[0]["tq"] = body[8]
            frame_dims = (w, h)
            frame = (comps, geom, [dict()], differential)
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise NotImplementedError("JPEG SOS outside a frame")
            comps, geom, coeffs, _diff = frame
            ns = body[0]
            scan = []
            for k in range(ns):
                cs, tables = body[1 + 2 * k : 3 + 2 * k]
                if cs != comps[0]["id"]:
                    raise NotImplementedError(
                        "scan references unknown component"
                    )
                scan.append((0, tables >> 4, tables & 0xF))
            pos = _jpeg_decode_scan_into(
                payload, pos + 2 + seg_len, comps, geom, huff, coeffs,
                scan, 0, 63, 0, 0, restart_interval,
            )
            finish_frame()
            continue
        pos += 2 + seg_len
    if ref is None:
        raise NotImplementedError("hierarchical JPEG without frames")
    if dhp is not None and ref.shape != (dhp[1], dhp[0]):
        raise NotImplementedError(
            "final reference does not reach the DHP geometry"
        )
    m = float(ref.mean())
    h, w = ref.shape
    return {
        "format": "jpeg-hierarchical",
        "width": w,
        "height": h,
        "mean_r": round(m, 6),
        "mean_g": round(m, 6),
        "mean_b": round(m, 6),
        "n_levels": n_levels,
        "pixels": ref,
    }


def build_jpeg_hierarchical(
    width: int,
    height: int,
    pixels,
    dc_quant: int = 1,
    ac_quant: int = 1,
) -> bytes:
    """Encoder twin for :func:`decode_jpeg_hierarchical`: a two-level
    grayscale pyramid — DHP, a half-resolution SOF0 initial frame
    (2x2-decimated source), EXP(1,1), and a full-resolution SOF5
    differential frame coding ``source - expand(reconstructed level
    1)`` with a float FDCT. With ``dc_quant == ac_quant == 1`` the
    per-pixel error is bounded by FDCT/IDCT rounding (|err| <= 2),
    and flat-per-8x8-block sources round-trip EXACTLY when the
    half-res image is globally flat."""
    import struct

    import numpy as np

    if width % 16 or height % 16:
        raise ValueError("hierarchical builder needs 16-aligned dims")
    src = np.asarray(pixels, dtype=np.int64).reshape(height, width)
    if src.min() < 0 or src.max() > 255:
        raise ValueError("pixels out of 8-bit range")
    C = _idct_matrix()

    dc_enc = {
        v: (ln, code)
        for ln, code, v in _jpeg_canonical(
            list(_JPEG_DC_BITS), list(_JPEG_DC_VALS)
        )
    }
    ac_enc = {
        v: (ln, code)
        for ln, code, v in _jpeg_canonical(
            list(_JPEG_AC_BITS), list(_JPEG_AC_VALS)
        )
    }
    q = [dc_quant] + [ac_quant] * 63

    def encode_frame(plane, differential):
        """plane: level-shifted (or difference) sample grid; returns
        (entropy bytes, reconstructed sample grid)."""
        h, w = plane.shape
        bw_ = _JpegBitWriter()
        pred = 0
        recon = np.zeros_like(plane)
        for by in range(h // 8):
            for bx in range(w // 8):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = C @ blk.astype(float) @ C.T
                zz = [
                    int(np.rint(coef.flat[idx] / q[i]))
                    for i, idx in enumerate(_JPEG_ZZ)
                ]
                diff = zz[0] - pred
                pred = zz[0]
                t = abs(diff).bit_length()
                ln, code = dc_enc[t]
                bw_.write(code, ln)
                if t:
                    bw_.write(diff if diff >= 0 else diff - 1 + (1 << t), t)
                run = 0
                for k in range(1, 64):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_enc[0xF0]
                        bw_.write(code, ln)
                        run -= 16
                    s = abs(zz[k]).bit_length()
                    ln, code = ac_enc[(run << 4) | s]
                    bw_.write(code, ln)
                    v = zz[k]
                    bw_.write(v if v >= 0 else v - 1 + (1 << s), s)
                    run = 0
                if run:
                    ln, code = ac_enc[0x00]
                    bw_.write(code, ln)
                nat = np.zeros(64)
                for i, idx in enumerate(_JPEG_ZZ):
                    nat[idx] = zz[i] * q[i]
                recon[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.rint(
                    C.T @ nat.reshape(8, 8) @ C
                ).astype(np.int64)
        return bw_.flush(), recon

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    def sof_body(w, h):
        return struct.pack(">BHHB", 8, h, w, 1) + bytes((1, 0x11, 0))

    sos = seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))
    dqt = seg(0xDB, bytes([0]) + bytes(q))
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    half = src[0::2, 0::2]
    ent1, rec1 = encode_frame(half - 128, differential=False)
    level1 = np.clip(rec1 + 128, 0, 255)
    base = _jpeg_expand_ref(level1, 1, 1, np)
    ent2, _rec2 = encode_frame(src - base, differential=True)
    return (
        b"\xff\xd8"
        + seg(0xDE, sof_body(width, height))  # DHP: final geometry
        + dqt
        + dht
        + seg(0xC0, sof_body(width // 2, height // 2))
        + sos
        + ent1
        + seg(0xDF, bytes((0x11,)))  # EXP: expand 2x both axes
        + seg(0xC5, sof_body(width, height))
        + sos
        + ent2
        + b"\xff\xd9"
    )


def jpeg_meta_for(doc_id: int) -> dict:
    """Deterministic JPEG recipe for `attach_jpeg_media`, built so the
    LOSSY codec still round-trips EXACTLY and a SQL oracle can state
    the answer in closed form: every 8x8 block is FLAT (block ``k``
    in raster order holds ``base + s*k``), so only the DC coefficient
    survives the FDCT, and with the encoder's DC step of 8 the value
    ``8*(v-128)`` quantizes without remainder — the decoded image IS
    the input, and ``mean = base + s*(nb-1)/2`` over ``nb`` equal-
    sized blocks."""
    bw = 1 + doc_id % 4
    bh = 1 + doc_id % 3
    return {
        "width": 8 * bw,
        "height": 8 * bh,
        "base": 16 + (doc_id * 13) % 64,
        "step": 1 + doc_id % 5,
        "n_blocks": bw * bh,
    }


def attach_jpeg_media(docs: DataFrame) -> DataFrame:
    """→ (doc_id, payload: binary) where payload is a real JPEG whose
    flat-block pixels follow `jpeg_meta_for`. Framing rotates so the
    driver gate exercises every decode path: odd doc_ids get
    PROGRESSIVE files (SOF2 spectral selection; doc_id % 4 == 3 also
    splits the DC scan into a successive-approximation pair, and
    doc_id % 8 == 5 splits the AC scans into top-bits + refinement
    passes with the dedicated EOBn Huffman table); doc_id % 8 == 6
    gets a 12-BIT extended-sequential SOF1 file (round 7) and
    doc_id % 8 == 2 a LOSSLESS SOF3 file (round 7, predictor
    1 + doc_id % 7) — both carry the SAME sample values, so those
    framings decode to the identical closed-form means and the
    oracle stays framing-invariant. doc_id % 8 == 4 gets a
    HIERARCHICAL pyramid (round 10: T.81 Annex J DHP + half-res SOF0
    + EXP + differential SOF5) — the pyramid is only EXACT on a
    globally flat source, so these docs carry a 16-aligned flat image
    at value ``base`` (w = 16*(1 + (doc_id//8) % 3),
    h = 16*(1 + (doc_id//8) % 2)) and the oracle special-cases the
    residue class."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                m = jpeg_meta_for(int(doc_id))
                w, h = m["width"], m["height"]
                bw = w // 8
                vals = [
                    m["base"] + m["step"] * ((y // 8) * bw + (x // 8))
                    for y in range(h)
                    for x in range(w)
                ]
                if doc_id % 8 == 4:
                    hw = 16 * (1 + (int(doc_id) // 8) % 3)
                    hh = 16 * (1 + (int(doc_id) // 8) % 2)
                    payloads.append(
                        build_jpeg_hierarchical(
                            hw, hh, [m["base"]] * (hw * hh)
                        )
                    )
                elif doc_id % 8 == 6:
                    px12 = b"".join(v.to_bytes(2, "little") for v in vals)
                    payloads.append(
                        build_jpeg_pixels(
                            w, h, px12, channels=1, precision=12
                        )
                    )
                elif doc_id % 8 == 2:
                    payloads.append(
                        build_jpeg_lossless(
                            w, h, bytes(vals),
                            predictor=1 + int(doc_id) % 7,
                        )
                    )
                else:
                    payloads.append(
                        build_jpeg_pixels(
                            w, h, bytes(vals), channels=1,
                            progressive=doc_id % 2 == 1,
                            dc_split=doc_id % 4 == 3,
                            ac_split=doc_id % 8 == 5,
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_for_codec(docs.select("doc_id")).mapInPandas(
        run, "doc_id long, payload binary"
    )


# IMA/DVI ADPCM step tables (public IMA spec; identical tables in
# every implementation incl. CPython's audioop)
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def _ima_decode_nibble(nib: int, pred: int, index: int) -> tuple:
    """One IMA ADPCM step: nibble + (predictor, step index) → new
    (sample, index). The shift cascade computes
    ``step*(mantissa)/4 + step/8`` exactly as the spec's integer
    flowchart does (order matters for the truncation)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nib & 4:
        diff += step
    if nib & 2:
        diff += step >> 1
    if nib & 1:
        diff += step >> 2
    if nib & 8:
        pred -= diff
    else:
        pred += diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX[nib]))
    return pred, index


def _ima_encode_sample(v: int, pred: int, index: int) -> tuple:
    """One IMA ADPCM encode step → (nibble, new predictor, new
    index); the predictor update REPLAYS the decoder so both sides
    stay in lockstep (the property the round-trip tests pin)."""
    step = _IMA_STEPS[index]
    diff = v - pred
    nib = 8 if diff < 0 else 0
    if diff < 0:
        diff = -diff
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    pred, index = _ima_decode_nibble(nib, pred, index)
    return nib, pred, index


def decode_ima_adpcm_wav(
    data: bytes, channels: int, block_align: int
) -> list:
    """Expand a WAV IMA-ADPCM (fmt tag 0x11) data chunk to linear
    samples (flat, interleaved). Block layout per spec: a 4-byte
    per-channel header (int16 predictor, step index, reserved), then
    channel-interleaved 4-byte nibble groups, LOW nibble first."""
    out: list = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4 * channels:
            raise NotImplementedError("truncated IMA ADPCM block")
        preds = []
        idxs = []
        for c in range(channels):
            p = int.from_bytes(block[4 * c : 4 * c + 2], "little", signed=True)
            ix = block[4 * c + 2]
            if ix > 88:
                raise NotImplementedError("corrupt IMA ADPCM step index")
            preds.append(p)
            idxs.append(ix)
        # the header predictor IS the block's first sample per channel
        out.extend(preds)
        body = block[4 * channels :]
        # walk channel-interleaved 4-byte groups
        chans: list[list] = [[] for _ in range(channels)]
        for g0 in range(0, len(body), 4 * channels):
            for c in range(channels):
                for byte in body[g0 + 4 * c : g0 + 4 * c + 4]:
                    for nib in (byte & 0xF, byte >> 4):  # LOW first
                        preds[c], idxs[c] = _ima_decode_nibble(
                            nib, preds[c], idxs[c]
                        )
                        chans[c].append(preds[c])
        for frame in zip(*chans) if channels > 1 else [(v,) for v in chans[0]]:
            out.extend(frame)
    return out


def encode_ima_adpcm_wav(
    samples: list, channels: int, samples_per_block: int
) -> tuple:
    """Encode linear samples (flat, interleaved) as WAV IMA-ADPCM
    blocks — the build twin of :func:`decode_ima_adpcm_wav`. Returns
    (data bytes, block_align). ``samples_per_block`` must be
    1 + a multiple of 8 (whole 4-byte nibble groups)."""
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + multiple of 8")
    n_frames = len(samples) // channels
    if n_frames % samples_per_block:
        raise ValueError("sample count must fill whole blocks")
    block_align = 4 * channels + (samples_per_block - 1) // 2 * channels
    data = bytearray()
    idxs = [0] * channels
    for f0 in range(0, n_frames, samples_per_block):
        preds = [
            int(samples[(f0 * channels) + c]) for c in range(channels)
        ]
        for c in range(channels):
            data += preds[c].to_bytes(2, "little", signed=True)
            data += bytes([idxs[c], 0])
        nibs: list[list] = [[] for _ in range(channels)]
        for j in range(1, samples_per_block):
            for c in range(channels):
                v = int(samples[(f0 + j) * channels + c])
                nib, preds[c], idxs[c] = _ima_encode_sample(
                    v, preds[c], idxs[c]
                )
                nibs[c].append(nib)
        for g0 in range(0, len(nibs[0]), 8):
            for c in range(channels):
                grp = nibs[c][g0 : g0 + 8]
                for k in range(0, 8, 2):
                    data.append(grp[k] | (grp[k + 1] << 4))  # LOW first
    return bytes(data), block_align


# ---------------------------------------------------------------------
# REAL mixed video round trip (round 9) — compressed inter-frame RLE8
# and raw Y4M, FULL pixel decode. Codec cores in operators/video.py;
# this section is the recipe + Spark plumbing, mirroring the FLAC
# section above.

MIXED_VIDEO_SCHEMA = (
    "doc_id long, format string, frame_idx int, width int, height int, "
    "keyframe boolean, mean_r double, mean_g double, mean_b double, "
    "row_moment double"
)

# palette for the RLE8 recipe: linear per channel over the index range
# the recipe uses (indices stay <= 92, so g = 2j and b = j + 128 never
# wrap and the oracle's channel forms stay linear)
_RLE8_PALETTE = [(j, (2 * j) % 256, (j + 128) % 256) for j in range(256)]

# transparent index for the gif-anim recipe: far outside the used
# value range, so a decoder that PAINTS it (instead of inheriting the
# canvas) shifts every channel mean and breaks the oracle
_GIF_TRANSPARENT = 255


def mixed_video_meta_for(doc_id: int) -> dict:
    """Deterministic mixed-video recipe, mirrored by the DuckDB oracle.
    Formats rotate by doc_id % 3; parameters that would be constant on
    a single residue class (any modulus sharing a factor with 3) key
    off ``doc_id // 3`` instead.

    ``avi-rle8`` (doc_id%3==0): frame 0 is a keyframe whose image-top
    half is flat ``a`` EXCEPT image row 0, an incrementing ramp
    ``a..a+w-1`` (forces an absolute-mode segment through the
    encoder), and whose bottom half is flat ``b``; every later frame
    is a DELTA that rewrites only the top half to ``t_i`` — the
    bottom half is never re-coded and must be INHERITED through the
    delta-escape skip, so a decoder that drops the prior frame,
    mis-advances on delta, or flips the bottom-up row order breaks
    the closed forms (the ``row_moment`` column is position-weighted
    precisely so positional bugs shift it).

    ``y4m`` (doc_id%3==1): flat planes (colorspace rotating
    420jpeg/422/444) whose BT.601 full-range conversion the oracle
    restates with the identical ``floor(x + 0.5)`` op order.

    ``gif-anim`` (doc_id%3==2): frame 0 a full-canvas keyframe (top
    half ``a``, bottom ``b``); every later frame an LZW-coded
    SUB-RECTANGLE covering only the top half, drawn ``t_i`` except
    its second row which is TRANSPARENT — those pixels must inherit
    the canvas (still ``a``), so a decoder that paints the
    transparent index or mis-places the rect breaks the closed
    forms; the bottom half is never re-drawn (container-level
    inheritance, like the RLE8 delta skip).
    """
    q3 = doc_id // 3
    if doc_id % 3 == 0:
        return {
            "kind": "avi-rle8",
            "width": 4 * (1 + doc_id % 5),
            "height": 2 * (2 + doc_id % 4),
            "n_frames": 2 + q3 % 3,
            "a": 10 + (doc_id * 3) % 60,
            "b": 12 + (doc_id * 5) % 60,
            "fps": 10 + doc_id % 21,
        }
    if doc_id % 3 == 1:
        return {
            "kind": "y4m",
            "width": 2 * (2 + q3 % 6),
            "height": 2 * (2 + doc_id % 5),
            "n_frames": 2 + q3 % 3,
            "colorspace": ("420jpeg", "422", "444")[q3 % 3],
            "fps": 10 + doc_id % 21,
        }
    return {
        "kind": "gif-anim",
        "width": 3 + q3 % 12,
        "height": 2 * (2 + doc_id % 4),
        "n_frames": 2 + q3 % 3,
        "a": 10 + (doc_id * 3) % 60,
        "b": 12 + (doc_id * 5) % 60,
        "fps": 10 + doc_id % 21,
    }


def _rle8_top_value(doc_id: int, i: int) -> int:
    return 14 + (doc_id * 11 + i * 13) % 60


def _y4m_flat_yuv(doc_id: int, i: int) -> tuple[int, int, int]:
    y = 90 + (doc_id * 7 + i * 17) % 71
    cb = 128 + (doc_id * 3 + i * 5) % 81 - 40
    cr = 128 + (doc_id * 11 + i * 7) % 81 - 40
    return y, cb, cr


def _build_mixed_video(doc_id: int) -> bytes:
    from optimal_parallel_fp_growth_spark.operators.video import (
        build_avi_rle8,
        build_gif_anim,
        build_y4m,
    )

    m = mixed_video_meta_for(doc_id)
    w, h, n = m["width"], m["height"], m["n_frames"]
    if m["kind"] == "avi-rle8":
        s = h // 2
        a, b = m["a"], m["b"]
        frames = []
        key = bytearray()
        key += bytes(a + x for x in range(w))       # image row 0: ramp
        key += bytes([a]) * (w * (s - 1))           # rest of the top
        key += bytes([b]) * (w * s)                 # bottom half
        frames.append(bytes(key))
        for i in range(1, n):
            t = _rle8_top_value(doc_id, i)
            frames.append(bytes([t]) * (w * s) + bytes([b]) * (w * s))
        return build_avi_rle8(frames, _RLE8_PALETTE, w, h, fps=m["fps"])
    if m["kind"] == "gif-anim":
        s = h // 2
        a, b = m["a"], m["b"]
        pal = b"".join(bytes(c) for c in _RLE8_PALETTE)
        frames = [
            (0, 0, w, h, [a] * (w * s) + [b] * (w * s))  # keyframe
        ]
        for i in range(1, n):
            t = _rle8_top_value(doc_id, i)
            # top-half rect; its second row transparent (inherits 'a')
            rect = [t] * w + [_GIF_TRANSPARENT] * w + [t] * (w * (s - 2))
            frames.append((0, 0, w, s, rect))
        return build_gif_anim(
            frames, w, h, pal, transparent=_GIF_TRANSPARENT
        )
    cs = m["colorspace"]
    xd, yd = {"420jpeg": (2, 2), "422": (2, 1), "444": (1, 1)}[cs]
    cw, ch = w // xd, h // yd
    planes = []
    for i in range(n):
        y, cb, cr = _y4m_flat_yuv(doc_id, i)
        planes.append(
            (bytes([y]) * (w * h), bytes([cb]) * (cw * ch),
             bytes([cr]) * (cw * ch))
        )
    return build_y4m(planes, w, h, fps_num=m["fps"], colorspace=cs)


def attach_mixed_video_media(docs: DataFrame) -> DataFrame:
    """→ (doc_id, payload: binary) where payload is a REAL video clip
    following `mixed_video_meta_for` — rotating by doc_id % 3 between
    AVI/BI_RLE8 (delta-coded by the content-adaptive encoder), Y4M,
    and an animated GIF whose later frames are transparent-holed
    sub-rectangles. Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _build_mixed_video(int(doc_id)) for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_for_codec(docs.select("doc_id")).mapInPandas(
        run, "doc_id long, payload binary"
    )


def extract_mixed_video_frames(
    with_payload: DataFrame, on_error: str = "raise"
) -> DataFrame:
    """Arrow-batched one-to-many video expansion over the container
    codecs: each payload fans out to one row per FULLY-decoded frame,
    dispatching on the container magic (RIFF → AVI/BI_RLE8,
    YUV4MPEG2 → Y4M, GIF87a/GIF89a → animated GIF with persistent-
    canvas compositing). ``on_error='null'`` quarantines undecodable
    payloads as a single null-stat row, like extract_video_frames."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    from optimal_parallel_fp_growth_spark.operators.video import (
        decode_avi_rle8_frames,
        decode_gif_frames,
        decode_y4m_frames,
    )

    cols = [
        "doc_id", "format", "frame_idx", "width", "height", "keyframe",
        "mean_r", "mean_g", "mean_b", "row_moment",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                try:
                    if raw[:4] == b"RIFF":
                        d = decode_avi_rle8_frames(raw)
                    elif raw.startswith(b"YUV4MPEG2"):
                        d = decode_y4m_frames(raw)
                    elif raw[:6] in (b"GIF87a", b"GIF89a"):
                        d = decode_gif_frames(raw)
                    else:
                        raise NotImplementedError(
                            "unrecognized video container"
                        )
                except NotImplementedError:
                    if on_error == "raise":
                        raise
                    rows.append(
                        (doc_id, None, None, None, None, None, None, None,
                         None, None)
                    )
                    continue
                for fr in d["frames"]:
                    rows.append(
                        (
                            doc_id, d["format"], fr["frame_idx"],
                            d["width"], d["height"], fr["keyframe"],
                            fr["mean_r"], fr["mean_g"], fr["mean_b"],
                            fr["row_moment"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return with_payload.mapInPandas(run, MIXED_VIDEO_SCHEMA)


# ---------------------------------------------------------------------
# GIF option-matrix entry (round 10): one animation per document that
# exercises EVERY feature of the animated-GIF decoder — interlaced
# transmission, transparency inheritance, disposal 3 (restore-to-
# previous), disposal 2 (restore-to-background) and a per-frame LOCAL
# color table — with every composited canvas statable in closed form.


def gif_meta_for(doc_id: int) -> dict:
    """Deterministic GIF option-matrix recipe, mirrored by the DuckDB
    oracle (four frames per document):

    * frame 0 — sequential full-canvas keyframe, flat ``a``.
    * frame 1 — INTERLACED full-canvas rect of ``t`` whose image row 1
      is TRANSPARENT (inherits ``a``), with DISPOSAL 3: after its
      stats the canvas must restore to the flat-``a`` state — a
      decoder that paints the hole, mis-places interlaced rows, or
      skips the restore breaks frame 1 and/or the later frames.
    * frame 2 — top-row rect of ``u`` with DISPOSAL 2: after its
      stats the row must restore to the BACKGROUND color (global
      index 0, palette-mapped to (0, 0, 128)).
    * frame 3 — interior rect ((1,1) size (w-2)x(h-2)) painted via a
      per-frame LOCAL color table mapping ``v`` to
      (200-v, (3v)%100, v) — channel means that the shared global
      table cannot produce, so a decoder that drops the local table
      is caught; its border re-reads ``a`` (disposal-3 proof) and its
      row 0 re-reads the background (disposal-2 proof).
    """
    return {
        "width": 4 + doc_id % 5,
        "height": 4 + doc_id % 3,
        "a": 10 + (doc_id * 7) % 50,
        "t": 20 + (doc_id * 11) % 50,
        "u": 30 + (doc_id * 13) % 40,
        "v": 5 + doc_id % 20,
    }


def _build_gif_doc(doc_id: int) -> bytes:
    from optimal_parallel_fp_growth_spark.operators.video import (
        build_gif_anim,
    )

    m = gif_meta_for(doc_id)
    w, h = m["width"], m["height"]
    a, t, u, v = m["a"], m["t"], m["u"], m["v"]
    pal = b"".join(bytes(c) for c in _RLE8_PALETTE)
    hole = [t] * (w * h)
    hole[w : 2 * w] = [_GIF_TRANSPARENT] * w  # image row 1 inherits a
    local = bytearray(3 * (v + 1))
    local[3 * v : 3 * v + 3] = bytes((200 - v, (3 * v) % 100, v))
    frames = [
        (0, 0, w, h, [a] * (w * h)),
        (0, 0, w, h, hole, {"interlace": True, "disposal": 3}),
        (0, 0, w, 1, [u] * w, {"disposal": 2}),
        (1, 1, w - 2, h - 2, [v] * ((w - 2) * (h - 2)),
         {"local_palette": bytes(local)}),
    ]
    return build_gif_anim(frames, w, h, pal, transparent=_GIF_TRANSPARENT)


def attach_gif_media(docs: DataFrame) -> DataFrame:
    """→ (doc_id, payload: binary) where payload is the option-matrix
    animation of `gif_meta_for`. Arrow-batched; decode side reuses
    extract_mixed_video_frames (GIF magic dispatch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _build_gif_doc(int(doc_id)) for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_for_codec(docs.select("doc_id")).mapInPandas(
        run, "doc_id long, payload binary"
    )
