"""Round-9 mixed-video codecs (operators/video.py): the BI_RLE8
inter-frame codec + AVI container walk and the YUV4MPEG2 raw-video
parser. Ground truth is independent recomputation — numpy over the
pre-encode pixels for RLE8, a per-pixel pure-python BT.601 reference
for Y4M, and DuckDB evaluating the registry oracle's closed forms for
the recipe (`test_recipe_matches_duckdb_closed_forms` is the
GROUND_TRUTH_PINS target for `multimodal_video`)."""

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from optimal_parallel_fp_growth_spark.operators.video import (
    bt601_rgb,
    build_avi_rle8,
    build_gif_anim,
    build_y4m,
    decode_avi_rle8_frames,
    decode_gif_frames,
    decode_rle8_frame,
    decode_y4m_frames,
    encode_rle8_frame,
)

PALETTE = [(j, (2 * j) % 256, (j + 128) % 256) for j in range(256)]


def _rand_frame(rng, w, h, values):
    return bytes(rng.choice(values) for _ in range(w * h))


# ---------------------------------------------------------------------
# RLE8 frame codec


def test_rle8_keyframe_round_trip():
    rng = random.Random(7)
    for w, h in ((1, 1), (3, 2), (8, 5), (17, 9), (64, 16)):
        # low-cardinality values produce runs; high-cardinality literals
        for values in (list(range(4)), list(range(200))):
            pix = _rand_frame(rng, w, h, values)
            coded = encode_rle8_frame(pix, w, h)
            assert decode_rle8_frame(coded, w, h) == pix


def test_rle8_delta_round_trip_and_inheritance():
    rng = random.Random(11)
    w, h = 12, 7
    prev = _rand_frame(rng, w, h, list(range(8)))
    # identical frame deltas to a bare end-of-bitmap and decodes to prev
    assert encode_rle8_frame(prev, w, h, prev) == b"\x00\x01"
    assert decode_rle8_frame(b"\x00\x01", w, h, prev) == prev
    for _ in range(20):
        cur = bytearray(prev)
        for _ in range(rng.randrange(1, 15)):  # sparse edits
            cur[rng.randrange(w * h)] = rng.randrange(8)
        cur = bytes(cur)
        coded = encode_rle8_frame(cur, w, h, prev)
        full = encode_rle8_frame(cur, w, h)
        assert len(coded) <= len(full) + 2  # delta coding actually helps
        assert decode_rle8_frame(coded, w, h, prev) == cur
        # the delta stream is meaningless against the wrong prior frame
        other = _rand_frame(rng, w, h, list(range(8, 16)))
        assert decode_rle8_frame(coded, w, h, other) != cur
        prev = cur


def test_rle8_encoder_picks_runs_and_absolute_mode():
    w = 16
    flat = bytes([5]) * w
    ramp = bytes(range(30, 30 + w))
    coded_flat = encode_rle8_frame(flat, w, 1)
    assert coded_flat.startswith(bytes((w, 5)))  # one encoded run
    coded_ramp = encode_rle8_frame(ramp, w, 1)
    assert b"\x00\x10" in coded_ramp  # absolute-mode segment, count 16
    assert decode_rle8_frame(coded_ramp, w, 1) == ramp
    # odd-length absolute segments are word-padded
    ramp15 = bytes(range(40, 55))
    coded15 = encode_rle8_frame(ramp15, 15, 1)
    assert decode_rle8_frame(coded15, 15, 1) == ramp15


def test_rle8_structural_violations_fail_closed():
    w, h = 4, 2
    # run past the row edge
    with pytest.raises(ValueError):
        decode_rle8_frame(bytes((5, 1, 0, 1)), w, h)
    # absolute segment past the row edge
    with pytest.raises(ValueError):
        decode_rle8_frame(b"\x00\x05abcde\x00\x00\x01", w, h)
    # delta beyond the surface
    with pytest.raises(ValueError):
        decode_rle8_frame(
            b"\x00\x02\x00\x09\x00\x01", w, h, prev=bytes(w * h)
        )
    # delta escape inside a keyframe (no prior frame to inherit from)
    with pytest.raises(ValueError):
        decode_rle8_frame(b"\x00\x02\x01\x00\x00\x01", w, h)
    # missing end-of-bitmap
    with pytest.raises(ValueError):
        decode_rle8_frame(bytes((4, 1, 0, 0)), w, h)
    # data after end-of-bitmap
    with pytest.raises(ValueError):
        decode_rle8_frame(b"\x00\x01\x04\x01", w, h)
    # keyframe that leaves pixels undefined
    with pytest.raises(ValueError):
        decode_rle8_frame(bytes((4, 1)) + b"\x00\x00\x00\x01", w, h)


# ---------------------------------------------------------------------
# AVI/BI_RLE8 container


def _clip_frames(rng, w, h, n):
    frames = [_rand_frame(rng, w, h, list(range(16)))]
    for _ in range(1, n):
        cur = bytearray(frames[-1])
        for _ in range(rng.randrange(0, 2 * w)):
            cur[rng.randrange(w * h)] = rng.randrange(16)
        frames.append(bytes(cur))
    return frames


def test_avi_rle8_stats_match_numpy_brute_force():
    """Independent ground truth: container decode statistics vs numpy
    over the ORIGINAL pre-encode pixels (exercises the encoder+decoder
    pair end to end, including delta frames)."""
    rng = random.Random(23)
    pal = np.array(PALETTE, dtype=np.float64)  # (256, 3)
    for w, h, n in ((4, 4, 1), (12, 6, 3), (9, 5, 4), (20, 10, 2)):
        frames = _clip_frames(rng, w, h, n)
        d = decode_avi_rle8_frames(build_avi_rle8(frames, PALETTE, w, h))
        assert (d["width"], d["height"], d["n_frames"]) == (w, h, n)
        for i, fr in enumerate(d["frames"]):
            idx = np.frombuffer(frames[i], dtype=np.uint8)
            rgb = pal[idx]  # (w*h, 3)
            assert fr["keyframe"] == (i == 0)
            assert fr["mean_r"] == pytest.approx(rgb[:, 0].mean(), abs=1e-12)
            assert fr["mean_g"] == pytest.approx(rgb[:, 1].mean(), abs=1e-12)
            assert fr["mean_b"] == pytest.approx(rgb[:, 2].mean(), abs=1e-12)
            weights = np.repeat(np.arange(1, h + 1), w)
            assert fr["row_moment"] == pytest.approx(
                (rgb[:, 0] * weights).mean(), abs=1e-12
            )


def test_avi_rle8_container_cross_checks():
    rng = random.Random(31)
    w, h = 8, 4
    frames = _clip_frames(rng, w, h, 3)
    good = build_avi_rle8(frames, PALETTE, w, h, fps=10)
    assert decode_avi_rle8_frames(good)["fps"] == 10.0
    # avih frame count must match the movi walk
    bad = bytearray(good)
    pos = bad.find(b"avih") + 8 + 16
    bad[pos : pos + 4] = (7).to_bytes(4, "little")
    with pytest.raises(NotImplementedError):
        decode_avi_rle8_frames(bytes(bad))
    # idx1 keyframe flag on a delta frame contradicts the stream
    bad = bytearray(good)
    ipos = bad.find(b"idx1") + 8 + 16 + 4  # entry 1's dwFlags
    bad[ipos] |= 0x10
    with pytest.raises(NotImplementedError):
        decode_avi_rle8_frames(bytes(bad))
    # non-RLE8 compression names the seam
    bad = bytearray(good)
    spos = bad.find(b"strf") + 8 + 16
    bad[spos : spos + 4] = (2).to_bytes(4, "little")  # BI_RLE4
    with pytest.raises(NotImplementedError):
        decode_avi_rle8_frames(bytes(bad))
    # truncation anywhere fails closed
    with pytest.raises(NotImplementedError):
        decode_avi_rle8_frames(good[: len(good) // 2])


# ---------------------------------------------------------------------
# YUV4MPEG2


def _y4m_reference_stats(yp, cbp, crp, w, h, xd, yd):
    cw = w // xd
    sr = sg = sb = mr = 0
    for y in range(h):
        for x in range(w):
            cy, cx = y // yd, x // xd
            r, g, b = bt601_rgb(
                yp[y * w + x], cbp[cy * cw + cx], crp[cy * cw + cx]
            )
            sr += r
            sg += g
            sb += b
            mr += r * (y + 1)
    n = w * h
    return sr / n, sg / n, sb / n, mr / n


def test_y4m_round_trip_all_colorspaces():
    rng = random.Random(43)
    for cs, xd, yd in (("420jpeg", 2, 2), ("422", 2, 1), ("444", 1, 1)):
        w, h = 8, 6
        cw, ch = w // xd, h // yd
        frames = [
            (
                bytes(rng.randrange(256) for _ in range(w * h)),
                bytes(rng.randrange(256) for _ in range(cw * ch)),
                bytes(rng.randrange(256) for _ in range(cw * ch)),
            )
            for _ in range(3)
        ]
        d = decode_y4m_frames(
            build_y4m(frames, w, h, fps_num=30, colorspace=cs)
        )
        assert (d["width"], d["height"], d["n_frames"]) == (w, h, 3)
        assert d["colorspace"] == f"C{cs}" and d["fps"] == 30.0
        for fr, (yp, cbp, crp) in zip(d["frames"], frames):
            assert fr["keyframe"] is True
            want = _y4m_reference_stats(yp, cbp, crp, w, h, xd, yd)
            got = (
                fr["mean_r"], fr["mean_g"], fr["mean_b"], fr["row_moment"]
            )
            assert got == pytest.approx(want, abs=1e-9), cs


def test_y4m_header_and_structure_guards():
    frame = (bytes(16), bytes(4), bytes(4))
    good = build_y4m([frame], 4, 4)
    assert decode_y4m_frames(good)["n_frames"] == 1
    # X-params are ignorable per spec; header_only stops before frames
    with_x = good.replace(b" C420jpeg\n", b" Xmeta C420jpeg\n", 1)
    assert decode_y4m_frames(with_x)["n_frames"] == 1
    assert "n_frames" not in decode_y4m_frames(
        b"YUV4MPEG2 W640 H480 F25:1 Ip A1:1 C444 Xf00ff\n",
        header_only=True,
    )
    # unknown header tag / colorspace fail closed
    with pytest.raises(NotImplementedError):
        decode_y4m_frames(good.replace(b" Ip ", b" Qp ", 1))
    with pytest.raises(NotImplementedError):
        decode_y4m_frames(good.replace(b"C420jpeg", b"C420p10s", 1))
    # odd dims are incompatible with 4:2:0 subsampling
    with pytest.raises(NotImplementedError):
        decode_y4m_frames(b"YUV4MPEG2 W5 H4 F25:1 C420jpeg\nFRAME\n" + bytes(30))
    # truncated planes / malformed FRAME marker
    with pytest.raises(NotImplementedError):
        decode_y4m_frames(good[:-3])
    with pytest.raises(NotImplementedError):
        decode_y4m_frames(good.replace(b"FRAME\n", b"FRAMX\n", 1))
    # zero-frame streams only pass at the header tier
    hdr = good[: good.find(b"\n") + 1]
    with pytest.raises(NotImplementedError):
        decode_y4m_frames(hdr)


# ---------------------------------------------------------------------
# animated GIF codec


def _gif_payload(frames, w, h, transparent=None, disposal=1):
    pal = b"".join(bytes(c) for c in PALETTE)
    return build_gif_anim(frames, w, h, pal, transparent=transparent,
                          disposal=disposal)


def test_gif_anim_compositing_matches_brute_force():
    """build → decode vs a manual canvas replay: sub-rectangles at
    random offsets, random transparent holes, all stats including the
    position-weighted row_moment."""
    rng = random.Random(13)
    tr = 99
    for _ in range(12):
        w, h = rng.randrange(3, 12), rng.randrange(2, 10)
        n = rng.randrange(2, 5)
        frames = [(0, 0, w, h, [rng.randrange(40) for _ in range(w * h)])]
        for _ in range(1, n):
            fw, fh = rng.randrange(1, w + 1), rng.randrange(1, h + 1)
            x0, y0 = rng.randrange(w - fw + 1), rng.randrange(h - fh + 1)
            vals = list(range(40)) + [tr] * 10
            frames.append(
                (x0, y0, fw, fh,
                 [rng.choice(vals) for _ in range(fw * fh)])
            )
        d = decode_gif_frames(_gif_payload(frames, w, h, transparent=tr))
        assert (d["format"], d["width"], d["height"], d["n_frames"]) == (
            "gif-anim", w, h, n
        )
        canvas = [0] * (w * h)
        for fi, (x0, y0, fw, fh, idx) in enumerate(frames):
            for r in range(fh):
                for c in range(fw):
                    v = idx[r * fw + c]
                    if v != tr:
                        canvas[(y0 + r) * w + x0 + c] = v
            n_pix = w * h
            sr = sum(PALETTE[j][0] for j in canvas) / n_pix
            sg = sum(PALETTE[j][1] for j in canvas) / n_pix
            sb = sum(PALETTE[j][2] for j in canvas) / n_pix
            mr = sum(
                PALETTE[canvas[y * w + x]][0] * (y + 1)
                for y in range(h) for x in range(w)
            ) / n_pix
            fr = d["frames"][fi]
            assert fr["keyframe"] == (fi == 0)
            assert fr["frame_idx"] == fi
            assert (fr["mean_r"], fr["mean_g"], fr["mean_b"]) == (sr, sg, sb)
            assert fr["row_moment"] == mr


def test_gif_transparency_inherits_canvas_not_painted():
    # frame 0 all 5s; frame 1 full rect of 7s with one transparent hole
    # → that pixel must still read index 5 in frame 1's stats
    w, h = 4, 2
    hole = [7] * (w * h)
    hole[3] = 99
    d = decode_gif_frames(
        _gif_payload(
            [(0, 0, w, h, [5] * (w * h)), (0, 0, w, h, hole)],
            w, h, transparent=99,
        )
    )
    assert d["frames"][0]["mean_r"] == 5.0
    assert d["frames"][1]["mean_r"] == (7 * 7 + 5) / 8


def test_gif_disposal_2_restores_background():
    # disposal 2 clears each frame's rect back to background index 0
    # after its stats, so frame 1 composites onto a zeroed canvas
    w, h = 2, 1
    d = decode_gif_frames(
        _gif_payload(
            [(0, 0, 2, 1, [10, 20]), (0, 0, 1, 1, [30])],
            w, h, disposal=2,
        )
    )
    assert d["frames"][0]["mean_r"] == 15.0  # (10+20)/2
    assert d["frames"][1]["mean_r"] == 15.0  # (30+0)/2


def test_gif_structural_violations_fail_closed():
    base = _gif_payload(
        [(0, 0, 4, 2, [5] * 8), (1, 0, 2, 2, [7, 99, 7, 7])],
        4, 2, transparent=99,
    )
    gce_at = base.find(b"\x21\xf9\x04")
    assert gce_at > 0
    # reserved disposal methods (4-7) fail closed
    bad = bytearray(base)
    bad[gce_at + 3] = (5 << 2) | (bad[gce_at + 3] & 0x03)
    with pytest.raises(NotImplementedError, match="reserved GIF disposal"):
        decode_gif_frames(bytes(bad))
    # restore-to-previous on frame 0 leaves the canvas undefined
    with pytest.raises(NotImplementedError, match="restore-to-previous"):
        decode_gif_frames(
            _gif_payload(
                [(0, 0, 2, 1, [5, 5], {"disposal": 3}),
                 (0, 0, 2, 1, [7, 7])],
                2, 1,
            )
        )
    # first frame must be a full-canvas keyframe without transparency
    with pytest.raises(NotImplementedError, match="full canvas"):
        decode_gif_frames(
            _gif_payload([(0, 0, 2, 1, [5, 5])], 4, 2)
        )
    with pytest.raises(NotImplementedError, match="transparent"):
        decode_gif_frames(
            _gif_payload([(0, 0, 2, 1, [5, 99])], 2, 1, transparent=99)
        )
    # truncation, missing trailer, trailing garbage, unknown block
    with pytest.raises(NotImplementedError):
        decode_gif_frames(base[:-5])
    with pytest.raises(NotImplementedError, match="trailer"):
        decode_gif_frames(base[:-1])
    with pytest.raises(NotImplementedError, match="after the GIF trailer"):
        decode_gif_frames(base + b"\x00")
    with pytest.raises(NotImplementedError, match="unknown GIF block"):
        decode_gif_frames(base[:-1] + b"\x7f\x3b")
    with pytest.raises(NotImplementedError, match="not a GIF"):
        decode_gif_frames(b"RIFF" + base)


def test_decode_real_gif_walk_requires_trailer():
    """ADVICE r10: a GIF that ends exactly at a block boundary with no
    0x3B trailer must fail closed in decode_real's structural walk,
    not be silently classified — same contract as decode_gif_frames."""
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        decode_real,
    )

    base = _gif_payload(
        [(0, 0, 4, 2, [5] * 8), (0, 0, 2, 1, [7, 7])], 4, 2
    )
    assert base[-1] == 0x3B
    assert decode_real(base)["format"] == "gif-anim"
    with pytest.raises(NotImplementedError, match="missing GIF trailer"):
        decode_real(base[:-1])


def test_gif_disposal_3_restores_previous_canvas():
    # f0 paints the canvas all 5s; f1 paints all 8s with disposal 3, so
    # before f2 the canvas must be 5s again; f2's transparent hole then
    # reads 5 (the restored canvas), never 8
    w, h = 3, 2
    hole = [9] * (w * h)
    hole[4] = 99
    d = decode_gif_frames(
        _gif_payload(
            [
                (0, 0, w, h, [5] * (w * h)),
                (0, 0, w, h, [8] * (w * h), {"disposal": 3}),
                (0, 0, w, h, hole),
            ],
            w, h, transparent=99,
        )
    )
    assert [fr["mean_r"] for fr in d["frames"]] == [
        5.0, 8.0, (9 * 5 + 5) / 6
    ]


def test_gif_local_color_table_overrides_global():
    # the global table maps 1 -> (10, 20, 130); frame 1 carries a LOCAL
    # table remapping 1 -> (200, 0, 0), so the same index paints
    # different RGB per frame — an index canvas cannot represent this
    w, h = 2, 1
    local = bytes((0, 0, 0, 200, 0, 0))
    d = decode_gif_frames(
        _gif_payload(
            [
                (0, 0, w, h, [1, 1]),
                (0, 0, 1, 1, [1], {"local_palette": local}),
            ],
            w, h,
        )
    )
    f0, f1 = d["frames"]
    assert (f0["mean_r"], f0["mean_g"], f0["mean_b"]) == (1.0, 2.0, 129.0)
    assert (f1["mean_r"], f1["mean_g"], f1["mean_b"]) == (
        (200 + 1) / 2, (0 + 2) / 2, (0 + 129) / 2
    )


def test_gif_interlaced_frame_matches_sequential():
    # same content, interlaced vs sequential row transmission: every
    # stat (incl. the row-placement-sensitive row_moment) must agree
    rng = random.Random(17)
    for h in (1, 2, 3, 5, 8, 9):
        w = 4
        content = [rng.randrange(30) for _ in range(w * h)]
        rect = [rng.randrange(30) for _ in range(w * (h - h // 2))]
        frames_seq = [
            (0, 0, w, h, content),
            (0, h // 2, w, h - h // 2, rect),
        ]
        frames_int = [
            (0, 0, w, h, content, {"interlace": True}),
            (0, h // 2, w, h - h // 2, rect, {"interlace": True}),
        ]
        a = decode_gif_frames(_gif_payload(frames_seq, w, h))
        b = decode_gif_frames(_gif_payload(frames_int, w, h))
        assert a["frames"] == b["frames"], h


def test_forged_giant_dims_fail_closed_without_allocation():
    """Quarantine contract, resource edition: a corrupt container whose
    forged 32-bit dims still pass the header cross-checks must be
    rejected BEFORE the decoder faults in a gigabyte-scale surface (a
    fuzz-found OOM: matched byte flips in strf.biWidth and avih.width
    forged a ~2^31-wide frame)."""
    import time

    # frame level: data can paint at most (len//2)*255 pixels
    with pytest.raises(ValueError, match="cannot self-cover"):
        decode_rle8_frame(b"\x08\x05\x00\x00\x00\x01", 1 << 20, 1 << 11)
    # container level: patch the SAME high byte in strf.biWidth and
    # avih.dwWidth so the dims cross-check passes at ~2.1e9 px
    rng = random.Random(3)
    payload = bytearray(build_avi_rle8(_clip_frames(rng, 8, 4, 2), PALETTE, 8, 4))
    avih_at = payload.find(b"avih") + 8  # chunk id + size
    strf_at = payload.find(b"strf") + 8
    payload[avih_at + 32 + 3] = 0x7F  # dwWidth high byte
    payload[strf_at + 4 + 3] = 0x7F   # biWidth high byte
    t0 = time.perf_counter()
    # r11: the container-level absolute ceiling now fires before the
    # keyframe self-cover bound ever gets a chance (strictly cheaper);
    # the frame-level bound above remains the backstop for sub-ceiling
    # dims (see test_avi_absolute_frame_ceiling for the large-payload
    # case the relative bound alone would wave through)
    with pytest.raises(NotImplementedError, match="frame ceiling"):
        decode_avi_rle8_frames(bytes(payload))
    assert time.perf_counter() - t0 < 1.0  # fails closed cheaply


def test_avi_absolute_frame_ceiling():
    """Cap audit (VERDICT r10 #2): a payload LARGE enough to satisfy
    the self-cover bound must still be rejected when the forged matched
    dims exceed the absolute per-frame ceiling — otherwise padding a
    corrupt file with a junk chunk re-enables the gigabyte row_w/LUT
    allocation that the relative bound alone would wave through."""
    import time

    from optimal_parallel_fp_growth_spark.operators.video import (
        _MAX_FRAME_PX,
    )

    rng = random.Random(3)
    payload = bytearray(
        build_avi_rle8(_clip_frames(rng, 8, 4, 2), PALETTE, 8, 4)
    )
    # matched forged dims just past the ceiling: 4200*4000 = 16.8M px
    for base, woff, hoff in (
        (payload.find(b"avih") + 8, 32, 36),
        (payload.find(b"strf") + 8, 4, 8),
    ):
        payload[base + woff : base + woff + 4] = (4200).to_bytes(4, "little")
        payload[base + hoff : base + hoff + 4] = (4000).to_bytes(4, "little")
    # junk chunk big enough that (len//2)*255 pixels > the forged dims
    junk = b"JUNK" + (140_000).to_bytes(4, "little") + bytes(140_000)
    payload += junk
    assert 4200 * 4000 > _MAX_FRAME_PX
    assert 4200 * 4000 <= (len(payload) // 2) * 255  # self-cover passes
    t0 = time.perf_counter()
    with pytest.raises(NotImplementedError, match="frame ceiling"):
        decode_avi_rle8_frames(bytes(payload))
    assert time.perf_counter() - t0 < 1.0


def test_y4m_forged_dims_fail_closed_before_allocation():
    """Cap audit (VERDICT r10 #2): Y4M is raw planar video, so the
    stream must physically contain one frame's planes — a forged
    W/H header line must be rejected before row_w or any plane-sized
    buffer is allocated, including when the stream carries no frame
    bytes at all."""
    import time

    t0 = time.perf_counter()
    # past the absolute ceiling: rejected regardless of payload size
    with pytest.raises(NotImplementedError, match="frame ceiling"):
        decode_y4m_frames(
            b"YUV4MPEG2 W99999998 H99999998 F25:1 Ip A1:1 C420jpeg\n"
            b"FRAME\n" + bytes(64)
        )
    # under the ceiling but past the payload's actual bytes: the
    # containment bound fires (4096x4000 = 16.4M px < 2^24)
    with pytest.raises(NotImplementedError, match="cannot contain"):
        decode_y4m_frames(
            b"YUV4MPEG2 W4096 H4000 F25:1 Ip A1:1 C420jpeg\n"
            b"FRAME\n" + bytes(64)
        )
    # empty tail with forged giant dims: no frames, no allocation
    with pytest.raises(NotImplementedError, match="no frames"):
        decode_y4m_frames(
            b"YUV4MPEG2 W99999998 H99999998 F25:1 Ip A1:1 C420jpeg\n"
        )
    assert time.perf_counter() - t0 < 1.0
    # header-only metadata tier is unaffected by giant declared dims
    meta = decode_y4m_frames(
        b"YUV4MPEG2 W99999998 H99999998 F25:1 Ip A1:1 C420jpeg\n",
        header_only=True,
    )
    assert meta["width"] == 99999998


def test_lzw_overrun_of_declared_frame_fails_closed():
    """Resource quarantine, LZW edition: LZW legally expands
    quadratically (a 530-byte stream can emit 100k symbols), so a
    corrupt animation whose descriptor declares a tiny rect but whose
    stream keeps emitting must fail closed instead of materializing
    the whole expansion."""
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    data = _lzw_encode([1] * 100_000, 8)
    assert len(data) < 1000  # the expansion really is quadratic
    with pytest.raises(NotImplementedError, match="overruns"):
        _lzw_decode(data, 8, max_symbols=4 + 4096)
    # a valid frame that overshoots by < one dictionary string decodes
    small = _lzw_encode([2, 3] * 50, 8)
    assert _lzw_decode(small, 8, max_symbols=100)[:100] == [2, 3] * 50
    # container level: a 2x2 frame fed the runaway stream. The image
    # descriptor sits at a structural offset (0x2C bytes also occur
    # inside the color table): 13-byte header+LSD, 768-byte padded
    # global table, 8-byte GCE.
    payload = bytearray(_gif_payload([(0, 0, 2, 2, [1, 1, 1, 1])], 2, 2))
    desc = 13 + 3 * 256 + 8
    assert payload[desc] == 0x2C
    head = bytes(payload[: desc + 11])  # through min_code_size
    blocks = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    with pytest.raises(NotImplementedError, match="overruns"):
        decode_gif_frames(head[:-1] + bytes([8]) + bytes(blocks) + b"\x00\x3b")


def test_forged_giant_gif_dims_fail_closed_before_decode():
    """Review finding (round 10): the max_symbols cap alone is relative
    to the DECLARED frame size, so forged 16-bit dims (65535x65535 →
    a ~4.3e9 cap that never fires) re-enabled the gigabyte
    materialization. The stream-theoretic pre-check must reject the
    rect before any LZW symbol is emitted, and an absolute per-frame
    ceiling bounds what even a large stream may declare."""
    import time

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        _GIF_MAX_FRAME_PX,
        _lzw_encode,
        _lzw_frame_guard,
    )

    # guard level: tiny stream can never fill a forged giant rect
    # (rect below the absolute ceiling so the stream bound is what fires)
    with pytest.raises(NotImplementedError, match="cannot encode"):
        _lzw_frame_guard(_GIF_MAX_FRAME_PX - 1, 2600, 8)
    # absolute ceiling fires even for a stream large enough in theory
    with pytest.raises(NotImplementedError, match="decode ceiling"):
        _lzw_frame_guard(_GIF_MAX_FRAME_PX + 1, 10**9, 8)
    # a legitimate frame passes: the recipe streams encode their rects
    _lzw_frame_guard(32, len(_lzw_encode([1] * 32, 8)), 8)
    # container level: patch the logical-screen AND frame-0 dims of a
    # valid animation to 65535x65535 (the full-canvas check then
    # passes) with a runaway LZW payload behind them
    runaway = _lzw_encode([1] * 100_000, 8)
    pal = b"".join(bytes(c) for c in PALETTE)
    out = bytearray(b"GIF89a")
    out += (65535).to_bytes(2, "little") * 2
    out += bytes([0x80 | 7, 0, 0]) + pal + bytes(3 * 0)
    out += b"\x2c" + b"\x00\x00\x00\x00"
    out += (65535).to_bytes(2, "little") * 2 + b"\x00"
    out += bytes([8])
    for i in range(0, len(runaway), 255):
        chunk = runaway[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    t0 = time.perf_counter()
    with pytest.raises(NotImplementedError, match="decode ceiling|cannot encode"):
        decode_gif_frames(bytes(out))
    assert time.perf_counter() - t0 < 1.0  # fails closed cheaply


def test_gif_random_option_matrix_matches_rgb_replay():
    """Ground truth for the full GIF feature matrix: random animations
    mixing interlace, local color tables, transparency and all four
    disposal methods per frame, replayed against an independent RGB
    canvas model (plain Python, no decoder code shared)."""
    rng = random.Random(23)
    tr = 99
    for _ in range(25):
        w, h = rng.randrange(2, 9), rng.randrange(2, 8)
        frames = [(0, 0, w, h, [rng.randrange(40) for _ in range(w * h)])]
        for _ in range(rng.randrange(1, 4)):
            fw, fh = rng.randrange(1, w + 1), rng.randrange(1, h + 1)
            x0, y0 = rng.randrange(w - fw + 1), rng.randrange(h - fh + 1)
            vals = list(range(40)) + [tr] * 8
            idx = [rng.choice(vals) for _ in range(fw * fh)]
            opts = {
                "disposal": rng.choice((0, 1, 2, 3)),
                "interlace": rng.random() < 0.5,
            }
            if rng.random() < 0.4:
                opts["local_palette"] = bytes(
                    rng.randrange(256) for _ in range(3 * 100)
                )
            frames.append((x0, y0, fw, fh, idx, opts))
        d = decode_gif_frames(_gif_payload(frames, w, h, transparent=tr))
        # independent replay: RGB canvas, bg = global palette index 0
        canvas = [(0, 0, 0)] * (w * h)  # decoder starts from RGB zeros
        bg = PALETTE[0]  # builder writes background index 0
        got = d["frames"]
        assert d["n_frames"] == len(frames)
        for fi, entry in enumerate(frames):
            x0, y0, fw, fh, idx = entry[:5]
            opts = entry[5] if len(entry) == 6 else {}
            lct = opts.get("local_palette")
            table = (
                [tuple(lct[3 * j : 3 * j + 3]) for j in range(len(lct) // 3)]
                if lct is not None
                else PALETTE
            )
            saved = list(canvas)
            for r in range(fh):
                for c in range(fw):
                    v = idx[r * fw + c]
                    if v != tr:
                        canvas[(y0 + r) * w + x0 + c] = tuple(table[v])
            n_pix = w * h
            for ch, key in enumerate(("mean_r", "mean_g", "mean_b")):
                want = sum(p[ch] for p in canvas) / n_pix
                assert got[fi][key] == want, (fi, key)
            want_m = sum(
                canvas[y * w + x][0] * (y + 1)
                for y in range(h) for x in range(w)
            ) / n_pix
            assert got[fi]["row_moment"] == want_m, fi
            disp = opts.get("disposal", 1)
            if disp == 2:
                for r in range(fh):
                    for c in range(fw):
                        canvas[(y0 + r) * w + x0 + c] = bg
            elif disp == 3:
                canvas = saved
        assert len(got) == len(frames)


def test_rle8_encoder_chunks_wide_dx_offsets():
    # regression: a first changed pixel past column 255 used to emit a
    # dx byte > 255 and crash the encoder (ADVICE r10)
    w, h = 600, 3
    prev = bytes(w * h)
    cur = bytearray(prev)
    for col in (255, 256, 300, 510, 599):
        cur[1 * w + col] = 9
    coded = encode_rle8_frame(bytes(cur), w, h, prev)
    assert decode_rle8_frame(coded, w, h, prev) == bytes(cur)


# ---------------------------------------------------------------------
# recipe ⇄ oracle parity (GROUND_TRUTH_PINS target) and fuzz


def test_recipe_matches_duckdb_closed_forms():
    """Pure-python engine path (build → full decode → stats) vs DuckDB
    evaluating ORACLE_VIDEO's closed forms, value-for-value over 240
    consecutive doc_ids (covers every joint residue class the recipe
    uses: doc_id mod lcm(3,4,5) and doc_id//3 mod lcm(3,6,12), joint
    period lcm(60, 3*12) = 180)."""
    import duckdb

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        _build_mixed_video,
    )
    from optimal_parallel_fp_growth_spark.queries_multimodal import (
        ORACLE_VIDEO,
    )

    n = 240
    rows = []
    for doc_id in range(n):
        raw = _build_mixed_video(doc_id)
        if raw[:4] == b"RIFF":
            d = decode_avi_rle8_frames(raw)
        elif raw[:6] in (b"GIF87a", b"GIF89a"):
            d = decode_gif_frames(raw)
        else:
            d = decode_y4m_frames(raw)
        for fr in d["frames"]:
            rows.append(
                (
                    doc_id, d["format"], fr["frame_idx"], d["width"],
                    d["height"], fr["keyframe"], round(fr["mean_r"], 6),
                    round(fr["mean_g"], 6), round(fr["mean_b"], 6),
                    round(fr["row_moment"], 6),
                )
            )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS "
        f"SELECT UNNEST(generate_series(0, {n - 1})) AS doc_id"
    )
    want = con.execute(
        ORACLE_VIDEO + " ORDER BY doc_id, frame_idx"
    ).fetchall()
    rows.sort(key=lambda r: (r[0], r[2]))
    assert len(rows) == len(want)
    for got, exp in zip(rows, want):
        assert got == tuple(exp)


def test_gif_entry_matches_duckdb_closed_forms():
    """Pure-python engine path for the multimodal_gif entry (build →
    full decode → stats) vs DuckDB evaluating ORACLE_GIF's closed
    forms, value-for-value over 600 consecutive doc_ids (covers every
    joint residue class of the %5/%3/%50/%40/%20 recipe moduli:
    period lcm = 600)."""
    import duckdb

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        _build_gif_doc,
    )
    from optimal_parallel_fp_growth_spark.queries_multimodal import (
        ORACLE_GIF,
    )

    n = 600
    rows = []
    for doc_id in range(n):
        d = decode_gif_frames(_build_gif_doc(doc_id))
        for fr in d["frames"]:
            rows.append(
                (
                    doc_id, "gif-anim", fr["frame_idx"], d["width"],
                    d["height"], fr["keyframe"], round(fr["mean_r"], 6),
                    round(fr["mean_g"], 6), round(fr["mean_b"], 6),
                    round(fr["row_moment"], 6),
                )
            )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS "
        f"SELECT UNNEST(generate_series(0, {n - 1})) AS doc_id"
    )
    want = con.execute(ORACLE_GIF + " ORDER BY doc_id, frame_idx").fetchall()
    rows.sort(key=lambda r: (r[0], r[2]))
    assert len(rows) == len(want)
    for got, exp in zip(rows, want):
        assert got == tuple(exp)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_fuzz_corruption_never_leaks_parser_internals(data):
    """Flip 1-3 bytes anywhere in a valid clip of either container:
    decode either still succeeds (flips in palette padding / filler)
    or fails with the ONE documented exception type — never a leaked
    IndexError/struct.error (the mapInPandas quarantine contract)."""
    rng = random.Random(5)
    which = data.draw(st.sampled_from(["avi", "y4m", "gif", "gif-matrix"]))
    if which == "avi":
        payload = bytearray(
            build_avi_rle8(_clip_frames(rng, 8, 4, 3), PALETTE, 8, 4)
        )
        decode = decode_avi_rle8_frames
    elif which == "gif":
        payload = bytearray(
            _gif_payload(
                [(0, 0, 8, 4, [rng.randrange(16) for _ in range(32)]),
                 (2, 1, 4, 2, [rng.choice(list(range(16)) + [99])
                               for _ in range(8)])],
                8, 4, transparent=99,
            )
        )
        decode = decode_gif_frames
    elif which == "gif-matrix":
        # the full option surface: interlace, local table, disposal 2/3
        from optimal_parallel_fp_growth_spark.operators.multimodal import (
            _build_gif_doc,
        )

        payload = bytearray(_build_gif_doc(rng.randrange(600)))
        decode = decode_gif_frames
    else:
        payload = bytearray(
            build_y4m(
                [(bytes(range(32)), bytes(8), bytes(8))] * 2, 8, 4
            )
        )
        decode = decode_y4m_frames
    for _ in range(data.draw(st.integers(1, 3))):
        i = data.draw(st.integers(0, len(payload) - 1))
        payload[i] ^= data.draw(st.integers(1, 255))
    try:
        decode(bytes(payload))
    except NotImplementedError:
        pass
