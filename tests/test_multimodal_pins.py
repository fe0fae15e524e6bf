"""Round-15 GROUND_TRUTH pins for the five remaining multimodal
entries: each entry ENCODES real media per a closed-form recipe and
FULLY DECODES it; these tests recompute the recipes' expected
statistics independently in pure python (the same standard as the
multimodal_video/multimodal_gif DuckDB-closed-form pins), so any bug
on either side of a codec shifts a statistic and fails here."""

from __future__ import annotations

import math

import pytest

from optimal_parallel_fp_growth_spark.queries_multimodal import (
    q_multimodal_audio,
    q_multimodal_flac,
    q_multimodal_frames,
    q_multimodal_jpeg,
    q_multimodal_pixels,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_ids(spark):
    rows = load_table(spark, SF, "documents").select("doc_id").collect()
    return sorted(r.doc_id for r in rows)


def test_multimodal_pixels_matches_recipe(spark, doc_ids):
    got = {r.doc_id: r for r in q_multimodal_pixels(spark, SF).collect()}
    assert len(got) == len(doc_ids)
    for i in doc_ids:
        r = got[i]
        h = 4 + i % 11
        assert r.format == ["png", "ppm", "gif"][i % 3]
        assert (r.width, r.height) == (4 + i % 13, h)
        for c, mult in (("mean_r", 37), ("mean_g", 59), ("mean_b", 83)):
            want = round((i * mult) % 128 + (h - 1) / 2.0, 6)
            assert abs(getattr(r, c) - want) <= 1e-9, (i, c)


def test_multimodal_frames_matches_recipe(spark, doc_ids):
    got = {
        (r.doc_id, r.frame_idx): r
        for r in q_multimodal_frames(spark, SF).collect()
    }
    n = 0
    for i in doc_ids:
        for fi in range(1 + i % 4):
            r = got[(i, fi)]
            n += 1
            assert (r.width, r.height) == (
                8 * (1 + i % 3), 8 * (1 + i % 2)
            )
            want = float(16 + (i * 7 + fi * 19) % 200)
            assert r.mean_r == r.mean_g == r.mean_b
            assert abs(r.mean_r - want) <= 1e-9
    assert len(got) == n


def _audio_forms(i: int, scale: int = 1):
    base = -40 + (i * 17) % 81
    amp = 1 + i % 7
    m = 4 + i % 9
    mean = scale * base + scale * amp * (m - 1) / 2.0
    rms = scale * math.sqrt(
        base * base
        + base * amp * (m - 1)
        + amp * amp * (m - 1) * (2 * m - 1) / 6.0
    )
    peak = scale * max(abs(base), abs(base + amp * (m - 1)))
    return m, mean, rms, peak


def test_multimodal_audio_matches_recipe(spark, doc_ids):
    got = {r.doc_id: r for r in q_multimodal_audio(spark, SF).collect()}
    assert len(got) == len(doc_ids)
    for i in doc_ids:
        r = got[i]
        m, mean, rms, peak = _audio_forms(i)
        rate = 8000 + (i * 31) % 32000
        frames = m * (3 + i % 5)
        assert r.codec == ["pcm8", "pcm16", "pcm24", "pcm32", "f32"][i % 5]
        assert (r.sample_rate, r.channels) == (rate, 1 + i % 2)
        assert r.bits == [8, 16, 24, 32, 32][i % 5]
        assert r.n_frames == frames
        assert abs(r.duration_sec - round(frames / rate, 6)) <= 1e-9
        assert abs(r.mean - round(mean, 6)) <= 1e-9
        assert abs(r.rms - round(rms, 6)) <= 1.5e-6  # ulp at the round
        assert r.peak == float(peak)


def test_multimodal_flac_matches_recipe(spark, doc_ids):
    got = {r.doc_id: r for r in q_multimodal_flac(spark, SF).collect()}
    assert len(got) == len(doc_ids)
    for i in doc_ids:
        r = got[i]
        m, mean, rms, peak = _audio_forms(i, scale=100)
        rate = 8000 + (i * 31) % 32000
        frames = m * (6 + i % 7)
        assert (r.codec, r.bits, r.md5_ok) == ("flac16", 16, True)
        assert (r.sample_rate, r.channels) == (rate, 1 + i % 2)
        assert r.n_frames == frames
        assert r.n_flac_frames == (frames + 47) // 48
        assert abs(r.duration_sec - round(frames / rate, 6)) <= 1e-9
        assert abs(r.mean - round(mean, 6)) <= 1e-9
        assert abs(r.rms - round(rms, 6)) <= 1.5e-4  # x100 scale ulps
        assert r.peak == int(peak)


def test_multimodal_jpeg_matches_recipe(spark, doc_ids):
    got = {r.doc_id: r for r in q_multimodal_jpeg(spark, SF).collect()}
    assert len(got) == len(doc_ids)
    saw_hier = saw_lossless = False
    for i in doc_ids:
        r = got[i]
        base = 16 + (i * 13) % 64
        if i % 8 == 4:
            saw_hier = True
            fmt = "jpeg-hierarchical"
            w, h = 16 * (1 + (i // 8) % 3), 16 * (1 + (i // 8) % 2)
            mean = float(base)
        else:
            fmt = "jpeg-lossless" if i % 8 == 2 else "jpeg"
            saw_lossless |= i % 8 == 2
            w, h = 8 * (1 + i % 4), 8 * (1 + i % 3)
            nb = (1 + i % 4) * (1 + i % 3)
            mean = base + (1 + i % 5) * (nb - 1) / 2.0
        assert (r.format, r.width, r.height) == (fmt, w, h), i
        want = round(mean, 6)
        assert r.mean_r == r.mean_g == r.mean_b
        assert abs(r.mean_r - want) <= 1e-9, i
    assert saw_hier and saw_lossless  # the rotation covers all classes
