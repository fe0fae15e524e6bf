"""Multimodal query registry. `multimodal_features`/`multimodal_frames`
run the md5-derived stub decode (codec-free, fully oracle-checkable —
see operators/multimodal.py CODEC STATUS); `multimodal_decode` runs the
REAL header parsers over spec-valid constructed media bytes."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.multimodal import (
    attach_media,
    attach_payload,
    decode_media,
    extract_features,
    sample_frames,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_payload(docs))


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL round trip: spec-valid PNG/GIF/BMP/JPEG/WAV bytes built per
    doc (operators/multimodal.py::build_payload), then header-parsed by
    the live ``decode_real`` seam. The oracle recomputes the metadata
    recipe (`media_meta_for`) in SQL — a decode bug breaks equality."""
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

ORACLE_FRAMES = f"""
SELECT doc_id, i::INT AS frame_idx, md5(text || i) AS frame_md5
FROM documents CROSS JOIN range(4) r(i)
WHERE i < 1 + ({_H8} % 4)
"""

# media_meta_for mirrored in SQL: format rotates doc_id % 5; images get
# (16 + doc_id*7919 % 2000, 16 + doc_id*104729 % 2000), wav gets
# (8000 + doc_id*31 % 40000, 1 + doc_id % 2).
ORACLE_DECODE = """
SELECT doc_id,
       ['png', 'gif', 'bmp', 'jpeg', 'wav'][(doc_id % 5)::INT + 1] AS format,
       CASE WHEN doc_id % 5 = 4 THEN 0
            ELSE (16 + (doc_id * 7919) % 2000)::INT END AS width,
       CASE WHEN doc_id % 5 = 4 THEN 0
            ELSE (16 + (doc_id * 104729) % 2000)::INT END AS height,
       CASE WHEN doc_id % 5 = 4
            THEN (8000 + (doc_id * 31) % 40000)::INT ELSE 0 END AS sample_rate,
       CASE WHEN doc_id % 5 = 4 THEN (1 + doc_id % 2)::INT ELSE 0 END AS channels
FROM documents
"""

MM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_features": q_multimodal_features,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_decode": q_multimodal_decode,
}

MM_ORACLES: dict[str, str] = {
    "multimodal_features": ORACLE_FEATURES,
    "multimodal_frames": ORACLE_FRAMES,
    "multimodal_decode": ORACLE_DECODE,
}
