"""Multimodal plumbing unit checks (oracle parity covers the values)."""

from __future__ import annotations

import pytest

from optimal_parallel_fp_growth_spark.operators.multimodal import (
    attach_payload,
    decode_real,
    sample_frames,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def test_decode_real_is_a_stub():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG")


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
