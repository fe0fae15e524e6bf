"""Round-13 versioned-table layout/lifecycle additions: Z-order as a
recorded cluster kind (multi-dimensional data skipping that composes
with multi-predicate pruning), vacuum retention by age, and
DESCRIBE-DETAIL table metadata."""

from __future__ import annotations

import json
import pathlib

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.versioned import (
    clone_table,
    compact_table,
    create_table,
    describe_table,
    files_scanned,
    merge_table,
    read_table,
    table_history,
    vacuum_table,
)


def _grid(spark, n=4096, parts=16):
    """Two independent uniform dimensions: b is a multiplicative-hash
    shuffle of a, so range-clustering on a leaves b unclustered."""
    return spark.range(n).select(
        F.col("id").alias("a"),
        ((F.col("id") * 2654435761) % n).alias("b"),
        (F.col("id") % 7).alias("v"),
    ).repartition(parts)


def _box(n):
    """A quarter-domain box on each dimension."""
    return [
        ("a", ">=", n // 4), ("a", "<", n // 2),
        ("b", ">=", n // 4), ("b", "<", n // 2),
    ]


def test_zorder_spec_prunes_both_dimensions(spark, tmp_path):
    n = 4096
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    create_table(
        _grid(spark, n), zpath, cluster_by=["a", "b"],
        cluster_kind="zorder",
    )
    create_table(_grid(spark, n), rpath, cluster_by=["a", "b"])
    total = files_scanned(zpath)
    assert total == files_scanned(rpath) == 16
    box = _box(n)
    a_only, b_only = box[:2], box[2:]
    # zorder: EVERY dimension's per-file range is narrow
    za, zb = files_scanned(zpath, prune=a_only), files_scanned(zpath, prune=b_only)
    assert za < total and zb < total
    zbox = files_scanned(zpath, prune=box)
    assert 0 < zbox < min(za, zb)
    # linear range clustering: the secondary dimension prunes nothing
    assert files_scanned(rpath, prune=b_only) == total
    assert zbox < files_scanned(rpath, prune=box)
    # losslessness: the pruned read is exact
    got = sorted(
        (r.a, r.b) for r in read_table(spark, zpath, prune=box).collect()
    )
    want = sorted(
        (r.a, r.b)
        for r in _grid(spark, n).collect()
        if n // 4 <= r.a < n // 2 and n // 4 <= r.b < n // 2
    )
    assert got == want and len(got) > 0


def test_zorder_spec_survives_rewrites(spark, tmp_path):
    n = 4096
    path = str(tmp_path / "z")
    create_table(
        _grid(spark, n), path, cluster_by=["a", "b"],
        cluster_kind="zorder",
    )
    # a scattered merge with NO cluster option must re-zorder via the
    # recorded spec — both dimensions keep pruning afterwards
    upd = spark.range(0, n, 10).select(
        F.col("id").alias("a"),
        ((F.col("id") * 2654435761) % n).alias("b"),
        F.lit(-1).cast("long").alias("v"),
    )
    merge_table(upd, path, "a")
    total = files_scanned(path)
    box = _box(n)
    assert files_scanned(path, prune=box[2:]) < total  # secondary dim
    assert 0 < files_scanned(path, prune=box) < files_scanned(
        path, prune=box[:2]
    )
    # compaction keeps the interleave rather than gluing by one key
    compact_table(spark, path, target_mb=1)
    t2 = files_scanned(path)
    if t2 >= 8:  # enough files for pruning to be observable
        assert files_scanned(path, prune=box[2:]) < t2
    got = {r.a: r.v for r in read_table(spark, path).collect()}
    assert got[0] == -1 and got[1] == 1 and len(got) == n
    # a clone carries the kind: its own merges stay z-ordered
    dst = str(tmp_path / "fork")
    clone_table(path, dst)
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _table_spec,
    )

    assert _table_spec(dst).get("cluster_kind") == "zorder"


def test_zorder_guards(spark, tmp_path):
    with pytest.raises(ValueError, match=">= 2|two"):
        create_table(
            _grid(spark, 64), str(tmp_path / "one"),
            cluster_by=["a"], cluster_kind="zorder",
        )
    with pytest.raises(ValueError, match="cluster_kind"):
        create_table(
            _grid(spark, 64), str(tmp_path / "bad"),
            cluster_by=["a", "b"], cluster_kind="hilbert",
        )
    with pytest.raises(ValueError, match="cluster_kind"):
        create_table(
            _grid(spark, 64), str(tmp_path / "kindless"),
            cluster_kind="zorder",
        )


# ---------------------------------------------------------------------------
# vacuum retention by age


def _age_manifest(path, version, seconds):
    """Backdate a committed manifest (test-only time machine)."""
    p = (
        pathlib.Path(path) / "_manifests" / f"v{version:08d}.json"
    )
    m = json.loads(p.read_text())
    m["committed_at"] -= seconds
    p.write_text(json.dumps(m))


def test_vacuum_retention_by_age(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        append_table,
    )

    path = str(tmp_path / "t")
    create_table(_grid(spark, 64, parts=2), path)
    append_table(_grid(spark, 64, parts=2), path)
    append_table(_grid(spark, 64, parts=2), path)
    # v1 committed 10 days ago, v2 one hour ago, v3 now
    _age_manifest(path, 1, 10 * 86400)
    _age_manifest(path, 2, 3600)
    vacuum_table(path, retention_hours=24)
    vs = [h["version"] for h in table_history(path)]
    assert vs == [2, 3]  # v1 aged out; v2/v3 retained
    assert read_table(spark, path, version=2).count() == 128
    with pytest.raises(FileNotFoundError):
        read_table(spark, path, version=1)
    # the head never ages out, however old
    _age_manifest(path, 3, 30 * 86400)
    _age_manifest(path, 2, 30 * 86400)
    vacuum_table(path, retention_hours=24)
    assert [h["version"] for h in table_history(path)] == [3]
    assert read_table(spark, path).count() == 192
    with pytest.raises(ValueError, match="retention_hours|keep_last"):
        vacuum_table(path, keep_last=2, retention_hours=24)


def test_vacuum_dry_run(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        overwrite_table,
    )

    path = str(tmp_path / "t")
    create_table(_grid(spark, 64, parts=3), path)
    overwrite_table(_grid(spark, 32, parts=2), path)
    would = vacuum_table(path, keep_last=1, dry_run=True)
    assert would == 3  # v1's files would go
    # nothing was deleted: both versions still read
    assert read_table(spark, path, version=1).count() == 64
    assert [h["version"] for h in table_history(path)] == [1, 2]
    # the real vacuum deletes exactly the report
    assert vacuum_table(path, keep_last=1) == would
    assert [h["version"] for h in table_history(path)] == [2]


def test_restore_by_timestamp(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        append_table,
        restore_table,
    )

    path = str(tmp_path / "t")
    create_table(_grid(spark, 10, parts=1), path)
    append_table(_grid(spark, 10, parts=1), path)
    append_table(_grid(spark, 10, parts=1), path)
    # age v1 two hours back, v2 one hour, v3 now
    _age_manifest(path, 1, 7200)
    _age_manifest(path, 2, 3600)
    import time

    restore_table(path, timestamp=time.time() - 1800)  # 30 min ago → v2
    assert read_table(spark, path).count() == 20
    hist = table_history(path)
    assert hist[-1]["op"] == "restore@v2"
    with pytest.raises(ValueError, match="not both"):
        restore_table(path, version=1, timestamp=0)
    with pytest.raises(ValueError, match="version or a timestamp"):
        restore_table(path)


# ---------------------------------------------------------------------------
# describe_table


def test_describe_table(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        append_table,
        delete_rows,
    )

    path = str(tmp_path / "t")
    create_table(
        _grid(spark, 256, parts=4), path,
        cluster_by=["a", "b"], cluster_kind="zorder",
    )
    append_table(_grid(spark, 64, parts=2), path)
    d = describe_table(path)
    assert d["version"] == 2
    assert d["num_files"] == 6
    assert d["num_rows"] == 320
    assert d["size_bytes"] > 0
    assert d["cluster_by"] == ["a", "b"]
    assert d["cluster_kind"] == "zorder"
    assert d["schema"] == [["a", "bigint"], ["b", "bigint"], ["v", "bigint"]]
    assert d["num_delete_files"] == 0
    assert d["retained_versions"] == [1, 2]
    # MOR masks make the metadata rowcount inexact: reported as None,
    # not a wrong number
    delete_rows(spark, path, spark.createDataFrame([(3,)], "a long"), "a")
    d2 = describe_table(path)
    assert d2["num_rows"] is None and d2["num_delete_files"] == 1
    # time travel describes the pinned version
    assert describe_table(path, version=1)["num_files"] == 4
