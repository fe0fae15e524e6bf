"""Broadcast Bloom-filter join pruning (100 TB stance, engine addition).

An anti/semi join of a huge fact side against a mid-size key set
normally shuffles the fact side on the join key — at 100 TB that
shuffle IS the query. When the key set fits in executor memory Spark
broadcasts and the shuffle disappears, but a 100 M-key blocklist at
~50 B/key is ~5 GB of hash-table — past the broadcast ceiling — while
its Bloom filter at 1 % fpp is ~120 MB of bitmap. ``bloom_anti_join``
/ ``bloom_semi_join`` run the classic two-phase plan:

1. **prefilter** — probe every fact row against a broadcast bitmap
   (vectorized numpy inside an Arrow-batched pandas UDF; the hash
   positions are computed JVM-side with ``xxhash64`` so the Python
   stage does only array indexing). Definite non-members exit here
   with ZERO exchange.
2. **verify** — only ``matches + fpp·N`` suspect rows reach an exact
   join against the real key set, so the unavoidable exchange is
   proportional to the match volume, not to the corpus.

The output is EXACT for any fpp — the bitmap can only produce false
positives and the verify join removes them — so the DuckDB oracle is
the plain anti/semi join.

Build is shuffle-free: each input partition folds its keys into a
local bitmap (``mapInPandas``), the per-partition bitmaps OR together
on the driver, and the result broadcasts. On a 1000-executor cluster
the collect moves ``partitions × m/8`` bytes; for bitmaps past
~100 MB, ``coalesce`` the key frame first (documented knob) — the
broadcast itself is the binding constraint either way.

No counterpart in the reference (scan/mine only); this is north-star
pipeline infrastructure in the spirit of the decontamination brief.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "BloomFilter",
    "bloom_params_for",
    "bloom_build",
    "bloom_anti_join",
    "bloom_semi_join",
]

# 2^33 bits = 1 GiB bitmap — past any sane broadcast budget.
_MAX_BITS = 1 << 33


def bloom_params_for(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard sizing: ``m = -n·ln(fpp)/ln2²`` bits, ``k = m/n·ln2``
    hashes. Returns ``(m_bits, k)`` with m in [64, 2^33] and k in
    [1, 12]."""
    n = max(int(n_items), 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = min(max(m, 64), _MAX_BITS)
    k = max(1, min(12, round(m / n * math.log(2))))
    return m, k


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k independent bit positions, JVM-side: ``xxhash64(i, key) mod m``.
    Seeding by prepending a literal keeps every probe inside whole-stage
    codegen; the Python stage never hashes."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits)).alias(f"__p{i}")
        for i in range(k)
    ]


def _fold_positions(m_bits: int, k: int):
    """mapInPandas body: fold this partition's bit positions into one
    local bitmap; emit it as a single binary row. np.bitwise_or.at
    handles duplicate word indices within a batch correctly (plain
    fancy-index assignment would drop all but one)."""
    n_words = (m_bits + 63) // 64

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        words = np.zeros(n_words, dtype=np.uint64)
        touched = False
        for pdf in batches:
            if pdf.empty:
                continue
            touched = True
            for i in range(k):
                p = pdf[f"__p{i}"].to_numpy(dtype=np.int64)
                np.bitwise_or.at(
                    words,
                    p >> 6,
                    np.uint64(1) << (p.astype(np.uint64) & np.uint64(63)),
                )
        if touched:
            yield pd.DataFrame({"bits": [words.tobytes()]})

    return fn


@dataclass
class BloomFilter:
    """Driver-held bitmap + params; ``might_contain`` probes it from a
    Spark broadcast so every executor shares one copy."""

    m_bits: int
    k: int
    n_items: int
    words: np.ndarray  # uint64[ceil(m/64)]
    _bc: object = None  # lazily-created sc.broadcast

    def _broadcast(self, spark: SparkSession):
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(self.words)
        return self._bc

    def might_contain(self, spark: SparkSession, key: Column | str) -> Column:
        """Boolean column: false ⇒ definitely not in the key set;
        true ⇒ member OR false positive (verify with an exact join).
        NULL keys hash like any constant and may flag true — the
        verify join then applies standard null-never-matches join
        semantics, so end-to-end behavior equals the plain join."""
        c = F.col(key) if isinstance(key, str) else key
        bc = self._broadcast(spark)

        @pandas_udf("boolean")
        def probe(*pos: pd.Series) -> pd.Series:
            w = bc.value
            res = np.ones(len(pos[0]), dtype=bool)
            for p in pos:
                pa = p.to_numpy(dtype=np.int64)
                bit = (
                    w[pa >> 6] >> (pa.astype(np.uint64) & np.uint64(63))
                ) & np.uint64(1)
                res &= bit.astype(bool)
            return pd.Series(res)

        return probe(*_positions(c, self.m_bits, self.k))


def bloom_build(
    keys: DataFrame,
    on: str,
    fpp: float = 0.01,
    n_items: int | None = None,
    coalesce_to: int | None = None,
) -> BloomFilter:
    """Build a Bloom filter over ``keys[on]`` with NO shuffle: sizing
    count via map-side-partial ``approx_count_distinct`` (unless
    ``n_items`` given), then one narrow pass folding per-partition
    bitmaps that OR together on the driver.

    ``coalesce_to`` overrides how many tasks fold partial bitmaps
    (None = auto: ~2 M hash positions per task, capped at 64). Fewer
    tasks mean a smaller ``partitions × m/8`` collect and no idle
    Python workers on small key sets; the auto value keeps per-task
    fold work bounded as the key set grows."""
    spark = keys.sparkSession
    col = keys.select(F.col(on).alias("__key")).where(F.col("__key").isNotNull())
    if n_items is None:
        n_items = col.agg(F.approx_count_distinct("__key")).collect()[0][0] or 1
    m_bits, k = bloom_params_for(n_items, fpp)
    pos = col.select(*_positions(F.col("__key"), m_bits, k))
    if coalesce_to is None:
        coalesce_to = max(1, min(64, (n_items * k) // 2_000_000 + 1))
    pos = pos.coalesce(coalesce_to)
    partials = pos.mapInPandas(_fold_positions(m_bits, k), "bits binary").collect()
    n_words = (m_bits + 63) // 64
    words = np.zeros(n_words, dtype=np.uint64)
    for row in partials:
        words |= np.frombuffer(row["bits"], dtype=np.uint64)
    return BloomFilter(m_bits=m_bits, k=k, n_items=n_items, words=words)


def _bloom_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    how: str,
    fpp: float,
    bloom: BloomFilter | None,
    broadcast_verify: bool | None,
) -> DataFrame:
    spark = big.sparkSession
    bf = bloom if bloom is not None else bloom_build(keys, on, fpp=fpp)
    flagged = big.withColumn("__maybe", bf.might_contain(spark, on))
    suspects = flagged.where(F.col("__maybe")).drop("__maybe")
    verify_keys = keys.select(on).distinct()
    if broadcast_verify:
        verify_keys = F.broadcast(verify_keys)
    verified = suspects.join(verify_keys, on, how)
    if how == "left_semi":
        # single pass over the fact side: prefilter, then join survivors
        return verified
    # anti: definite non-members pass straight through with zero
    # exchange, suspects union in after the exact join. The fact side
    # is SCANNED twice (both union branches) — at scale two columnar
    # scans are far cheaper than one full-corpus shuffle, which is the
    # alternative single-pass plan; callers with an expensive upstream
    # (not a bare scan) should persist it first.
    clean = flagged.where(~F.col("__maybe")).drop("__maybe")
    return clean.unionByName(verified)


def bloom_anti_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    fpp: float = 0.01,
    bloom: BloomFilter | None = None,
    broadcast_verify: bool | None = None,
) -> DataFrame:
    """EXACT ``big LEFT ANTI JOIN keys ON on`` where only bloom-suspect
    rows (true matches + fpp·N false positives) reach the join — the
    rest of ``big`` never exchanges. Pass a prebuilt ``bloom`` to reuse
    one bitmap across queries (blocklist reuse); ``broadcast_verify``
    hints the verify join (None = leave strategy to Catalyst/AQE)."""
    return _bloom_join(big, keys, on, "left_anti", fpp, bloom, broadcast_verify)


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    fpp: float = 0.01,
    bloom: BloomFilter | None = None,
    broadcast_verify: bool | None = None,
) -> DataFrame:
    """EXACT ``big LEFT SEMI JOIN keys ON on`` with the same two-phase
    shape: bloom prefilter drops definite non-members before the exact
    membership join."""
    return _bloom_join(big, keys, on, "left_semi", fpp, bloom, broadcast_verify)
