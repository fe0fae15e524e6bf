"""Multimodal-column plumbing (driver north star; SURVEY §7.2 M7).

Model: media lives in an opaque ``payload: binary`` column with a typed
metadata struct alongside. Decode/feature-extract runs as Arrow-batched
``mapInPandas`` — the Spark-side shape (schema, partitioning, batch
iteration, one-to-many expansion) is real and tested at scale semantics;
only the innermost byte-decode is a STUB.

STUB NOTICE: this container has no image/audio codecs (no PIL/ffmpeg/
librosa). ``_decode_stub`` derives deterministic fake dimensions and
features from the md5 of the payload bytes; ``decode_real`` raises
``NotImplementedError`` and is the single hook to swap in a real codec.
Because the fake is md5-deterministic, the whole pipeline still has an
exact DuckDB oracle — the plumbing is verified end-to-end even though
the decode is fake.

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


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, payload: binary, meta: struct<modality, n_bytes,
    content_md5>). The metadata struct is computed JVM-side."""
    payload = F.encode(F.col(text_col), "utf-8")
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


def decode_real(payload: bytes) -> dict:
    """Swap-in point for a real codec (PIL.Image.open / soundfile /
    pyav). Not available in this environment."""
    raise NotImplementedError(
        "real media decode requires codec libraries not present in this "
        "container; use the deterministic stub path"
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
