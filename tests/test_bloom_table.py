"""Manifest Bloom file-skipping (round 15 — the Iceberg puffin /
Parquet footer-bloom shape lifted into the manifest): per-file bitmaps
recorded at commit for opted-in int/string columns let point lookups
on SCATTERED keys skip files with zero file opens, where min/max
ranges span everything. Saturated/absent bitmaps fail OPEN — pruning
can cost a read, never an answer."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.versioned import (
    _bloom_of_values,
    _bloom_positions,
    _load_manifest,
    append_table,
    compact_table,
    create_table,
    files_scanned,
    merge_table,
    read_table,
)

N_FILES = 8


def _df(spark, start, n):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("h"),
        (F.col("id") * 2).alias("v"),
    )


def _h(i: int) -> str:
    return hashlib.md5(str(i).encode()).hexdigest()


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    create_table(
        _df(spark, 0, 2000).repartitionByRange(N_FILES, "doc_id"),
        path,
        bloom_cols=["h"],
    )
    return path


def test_point_lookup_skips_files_and_stays_lossless(spark, table):
    assert files_scanned(table) == N_FILES
    for i in (0, 777, 1999):
        opened = files_scanned(table, prune=("h", "==", _h(i)))
        # the md5 keys are scattered, so range stats prune nothing;
        # only the bloom can cut — expected survivors ~1 (+ rare fp)
        assert 1 <= opened <= 2
        got = read_table(
            spark, table, prune=("h", "==", _h(i))
        ).where(F.col("h") == _h(i)).collect()
        assert len(got) == 1 and got[0].doc_id == i


def test_absent_key_prunes_everything(spark, table):
    # bloom fp rate at 250 keys / 16 Kbit is ~1e-9 per file; an absent
    # key prunes ALL files and the read returns an empty typed frame
    assert files_scanned(table, prune=("h", "==", "nope")) == 0
    out = read_table(spark, table, prune=("h", "==", "nope"))
    assert out.count() == 0
    assert out.columns == ["doc_id", "h", "v"]


def test_in_prune_survives_any_member(spark, table):
    vals = [_h(5), "absent-a", "absent-b"]
    opened = files_scanned(table, prune=("h", "in", vals))
    assert 1 <= opened <= 2
    got = read_table(spark, table, prune=("h", "in", vals)).where(
        F.col("h").isin(vals)
    )
    assert got.count() == 1
    assert files_scanned(
        table, prune=("h", "in", ["absent-a", "absent-b"])
    ) == 0


def test_appends_and_rewrites_stamp_blooms(spark, table):
    shifted = _df(spark, 0, 100).select(
        "doc_id", F.md5((F.col("doc_id") + 9000).cast("string")).alias("h"),
        "v",
    )
    append_table(shifted, table)
    probe = hashlib.md5(b"9042").hexdigest()
    assert files_scanned(table, prune=("h", "==", probe)) == 1
    # compaction rewrites and re-stamps
    compact_table(spark, table)
    opened = files_scanned(table, prune=("h", "==", probe))
    assert opened < files_scanned(table) or files_scanned(table) == 1
    got = read_table(spark, table, prune=("h", "==", probe)).where(
        F.col("h") == probe
    )
    assert got.count() == 1
    # merge keeps blooms on rewritten files, carried files keep theirs
    changes = spark.createDataFrame(
        [(5, _h(5), -1)], "doc_id long, h string, v long"
    )
    merge_table(changes, table, "doc_id")
    assert files_scanned(table, prune=("h", "==", _h(5))) >= 1
    got = read_table(spark, table, prune=("h", "==", _h(5))).where(
        F.col("h") == _h(5)
    ).collect()
    assert len(got) == 1 and got[0].v == -1


def test_saturated_bitmap_fails_open(spark, tmp_path):
    path = str(tmp_path / "sat")
    create_table(
        _df(spark, 0, 2000).repartitionByRange(4, "doc_id"),
        path,
        bloom_cols=["h"],
        bloom_bits=64,  # 500 distinct/file >> 64/8: stores nothing
    )
    man = _load_manifest(path, 1)
    assert all(
        "__bloom" not in s for s in man["file_stats"].values()
    )
    assert files_scanned(path, prune=("h", "==", "anything")) == 4


def test_bloom_math_matches_stored_bitmap(spark, table):
    """Independent recompute: rebuild one file's bitmap from the raw
    parquet values in pure python and compare byte-for-byte against
    the sidecar BLOB slice the manifest entry references (round 17:
    bitmaps live in <file>.parquet.bloom, the manifest carries only
    offset/length/m/k)."""
    import pathlib

    import pyarrow.parquet as pq

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _bloom_blob_path,
        _bloom_entry_bits,
    )

    man = _load_manifest(table, 1)
    f = man["files"][0]
    entry = man["file_stats"][f]["__bloom"]["h"]
    assert "b64" not in entry  # bitmaps are never inline post-r17
    vals = {
        v
        for v in pq.read_table(
            str(pathlib.Path(table) / f), columns=["h"]
        ).column("h").to_pylist()
        if v is not None
    }
    ver = int(entry.get("v") or 1)
    want = _bloom_of_values(vals, entry["m"], entry["k"], version=ver)
    stored = _bloom_entry_bits(entry, _bloom_blob_path(table, f))
    assert stored == want
    # and every stored value probes positive, through the SAME
    # position function that built the bitmap (entry "v" dispatch)
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _positions_fn,
    )

    bits = want
    for v in list(vals)[:20]:
        assert all(
            (bits[p >> 3] >> (p & 7)) & 1
            for p in _positions_fn(entry)(v, entry["m"], entry["k"])
        )


def test_validation(spark, tmp_path):
    df = _df(spark, 0, 10).withColumn("f", F.lit(1.5))
    with pytest.raises(ValueError, match="int/string"):
        create_table(df, str(tmp_path / "a"), bloom_cols=["f"])
    with pytest.raises(ValueError, match="int/string"):
        create_table(df, str(tmp_path / "b"), bloom_cols=["missing"])
    with pytest.raises(ValueError, match=">= 64"):
        create_table(df, str(tmp_path / "c"), bloom_cols=["h"], bloom_bits=8)


def test_bloom_bits_for_sizing(spark, tmp_path):
    """The auto-width recipe: ≥10 bits per expected value, power of
    two, floored at the default — and a table created with it at a
    per-file count that SATURATES the default width still skips."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        bloom_bits_for,
    )

    assert bloom_bits_for(100) == 1 << 14  # floor
    assert bloom_bits_for(2000) == 1 << 15  # 20k bits -> 32k
    assert bloom_bits_for(6250) == 1 << 16  # the 10x regime
    assert bloom_bits_for(10**9) == 1 << 22  # capped
    path = str(tmp_path / "big")
    create_table(
        _df(spark, 0, 20_000).repartitionByRange(4, "doc_id"),
        path,
        bloom_cols=["h"],
        bloom_bits=bloom_bits_for(20_000 // 4),
    )
    assert files_scanned(path, prune=("h", "==", _h(12345))) <= 2
    assert files_scanned(path, prune=("h", "==", "absent")) == 0
