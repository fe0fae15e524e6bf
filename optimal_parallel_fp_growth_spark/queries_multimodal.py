"""Multimodal query registry. The decode is a deterministic md5-derived
stub (see operators/multimodal.py STUB NOTICE), which is exactly what
makes the full mapInPandas plumbing DuckDB-oracle-checkable."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from optimal_parallel_fp_growth_spark.operators.multimodal import (
    attach_payload,
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

MM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_features": q_multimodal_features,
    "multimodal_frames": q_multimodal_frames,
}

MM_ORACLES: dict[str, str] = {
    "multimodal_features": ORACLE_FEATURES,
    "multimodal_frames": ORACLE_FRAMES,
}
