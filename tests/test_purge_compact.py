"""Round 14: purge_deletes (materialize MOR masks), compact_table
WHERE (partial compaction), and vacuum_orphans (crashed-commit
recovery)."""

from __future__ import annotations

import os
import pathlib
import time

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.versioned import (
    CommitConflict,
    _load_manifest,
    _versions,
    append_table,
    compact_table,
    create_table,
    delete_rows,
    purge_deletes,
    read_table,
    table_minmax,
    vacuum_orphans,
)


def _kv(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_purge_materializes_masks_and_restores_metadata_answers(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    create_table(
        _kv(spark, 400).repartitionByRange(4, "k"), path, cluster_by=["k"]
    )
    dels = spark.createDataFrame([(7,), (13,)], "k long")
    delete_rows(spark, path, dels, "k")
    with pytest.raises(ValueError, match="delete masks"):
        table_minmax(path, "k")
    before = set(_load_manifest(path, 2)["files"])
    v = purge_deletes(spark, path)
    man = _load_manifest(path, v)
    assert man["delete_files"] == [] or not man.get("delete_files")
    assert man["op"] == "purge"
    # stats-driven: keys 7 and 13 live in ONE of the four range files
    after = set(man["files"])
    carried = before & after
    assert len(before - carried) == 1, (before - carried)
    got = sorted(r.k for r in read_table(spark, path).collect())
    assert got == [i for i in range(400) if i not in (7, 13)]
    # metadata answers work again — the purge's point
    assert table_minmax(path, "k") == (0, 399)
    # time travel still sees the masked (pre-purge) version correctly
    old = sorted(r.k for r in read_table(spark, path, version=2).collect())
    assert old == got
    v1 = sorted(r.k for r in read_table(spark, path, version=1).collect())
    assert v1 == list(range(400))


def test_purge_respects_sequence_rule_for_reinserted_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 100).repartitionByRange(2, "k"), path)
    delete_rows(spark, path, spark.createDataFrame([(5,)], "k long"), "k")
    # the key returns in a NEWER file: sidecar must not mask it,
    # and purge must not remove it
    append_table(
        spark.createDataFrame([(5, -5)], "k long, v long"), path
    )
    assert {r.v for r in read_table(spark, path).where("k = 5").collect()} == {
        -5
    }
    purge_deletes(spark, path)
    assert {r.v for r in read_table(spark, path).where("k = 5").collect()} == {
        -5
    }
    assert read_table(spark, path).count() == 100  # 99 survivors + reinsert


def test_purge_noop_and_string_keys_conservative(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 10), path)
    assert purge_deletes(spark, path) == 1  # mask-free: no new version
    sp = str(tmp_path / "s")
    docs = spark.range(40).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("h"),
        F.col("id").alias("v"),
    )
    create_table(docs.repartitionByRange(4, "v"), sp)
    delete_rows(
        spark, sp, spark.createDataFrame([("k7",), ("k33",)], "h string"), "h"
    )
    v = purge_deletes(spark, sp)
    man = _load_manifest(sp, v)
    assert not man.get("delete_files")
    got = sorted(r.h for r in read_table(spark, sp).collect())
    assert got == sorted(f"k{i}" for i in range(40) if i not in (7, 33))


def test_compact_where_folds_only_the_selected_range(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 100).coalesce(1), path)
    for i in range(1, 8):
        append_table(_kv(spark, 100, start=i * 100).coalesce(1), path)
    man = _load_manifest(path, 8)
    assert len(man["files"]) == 8
    before = set(man["files"])
    # fold only the first half of the key space
    v = compact_table(spark, path, where=[("k", ">=", 0), ("k", "<", 400)])
    man2 = _load_manifest(path, v)
    assert man2["op"] == "compact"
    carried = before & set(man2["files"])
    assert len(carried) == 4  # the four out-of-range appends untouched
    assert len(man2["files"]) < len(before)
    got = sorted(r.k for r in read_table(spark, path).collect())
    assert got == list(range(800))


def test_compact_where_reads_through_masks_and_keeps_sidecars(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 100).coalesce(1), path)
    append_table(_kv(spark, 100, start=100).coalesce(1), path)
    delete_rows(
        spark, path, spark.createDataFrame([(3,), (150,)], "k long"), "k"
    )
    v = compact_table(spark, path, where=[("k", "<", 100)])
    man = _load_manifest(path, v)
    assert man.get("delete_files")  # sidecars kept for the carried file
    got = sorted(r.k for r in read_table(spark, path).collect())
    assert got == [i for i in range(200) if i not in (3, 150)]
    # the rewritten half is mask-free by sequence (purge-equivalent
    # locally): re-deleting nothing changes nothing
    assert read_table(spark, path).where("k = 3").count() == 0


def test_vacuum_orphans_unwedges_a_crashed_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 20), path)
    head = _versions(path)[-1]
    # forge the crash: data/v2 exists (writer won the rename), no
    # manifest v2 (died before the link)
    ghost = pathlib.Path(path) / "data" / f"v{head + 1:08d}"
    ghost.mkdir(parents=True)
    (ghost / "part-00000-dead-c000.snappy.parquet").write_bytes(b"x")
    old = time.time() - 90000
    os.utime(ghost, (old, old))
    # stale tmp manifest too
    tmp = pathlib.Path(path) / "_manifests" / ".v00000002.json.tmp.999"
    tmp.write_text("{}")
    os.utime(tmp, (old, old))
    # the wedge: the next append loses the data rename to the ghost
    with pytest.raises(CommitConflict):
        append_table(_kv(spark, 5, start=100), path)
    # dry run reports both, removes nothing
    rep = vacuum_orphans(path, dry_run=True)
    assert {pathlib.Path(p).name for p in rep} == {
        ghost.name, tmp.name
    }
    assert ghost.exists() and tmp.exists()
    removed = vacuum_orphans(path)
    assert {pathlib.Path(p).name for p in removed} == {ghost.name, tmp.name}
    assert not ghost.exists() and not tmp.exists()
    # unwedged: the append lands
    append_table(_kv(spark, 5, start=100), path)
    assert read_table(spark, path).count() == 25


def test_vacuum_orphans_spares_fresh_and_carried(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 20), path)
    head = _versions(path)[-1]
    fresh = pathlib.Path(path) / "data" / f"v{head + 1:08d}"
    fresh.mkdir(parents=True)  # mtime = now: could be a commit in flight
    assert vacuum_orphans(path) == []
    assert fresh.exists()
    fresh.rmdir()
    # a retained version's directory is never a candidate
    append_table(_kv(spark, 5, start=50), path)
    assert vacuum_orphans(path, older_than_s=0.0) == []
    assert read_table(spark, path).count() == 25


def test_purge_timestamp_key_is_conservative_but_exact(spark, tmp_path):
    """A MOR delete keyed on a timestamp column: manifest stats store
    ISO strings while the sidecar bounds come back as datetimes —
    comparing across those domains is exactly the bug class the
    numeric-only pruning rule exists for. The purge must fall back to
    a conservative rewrite and stay EXACT."""
    path = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
    )
    create_table(df.repartitionByRange(4, "k"), path)
    dels = spark.range(10, 12).select(
        F.timestamp_seconds(F.col("id") * 3600).alias("ts")
    )
    delete_rows(spark, path, dels, "ts")
    v = purge_deletes(spark, path)
    man = _load_manifest(path, v)
    assert not man.get("delete_files")
    got = sorted(r.k for r in read_table(spark, path).collect())
    assert got == [i for i in range(100) if i not in (10, 11)]


def test_compact_where_nothing_matching_is_a_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 100).repartitionByRange(4, "k"), path)
    assert compact_table(spark, path, where=("k", ">=", 10_000)) == 1
    assert _versions(path) == [1]
    assert read_table(spark, path).count() == 100
