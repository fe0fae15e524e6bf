"""Round-13 hash-bucketed versioned tables (the Iceberg bucket
transform as a recorded layout): MERGE rewrites only the changeset's
buckets, equality reads open exactly the matching bucket's files, and
every rewrite path preserves bucket identity. The manifest-side bucket
math is the pure-python Murmur3 pinned in test_spark_hash.py."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.versioned import (
    _load_manifest,
    _versions,
    append_table,
    compact_table,
    create_table,
    delete_where,
    describe_table,
    files_scanned,
    merge_table,
    read_table,
    update_where,
    vacuum_table,
)

N_BUCKETS = 8


def _uuid_corpus(spark, n=200):
    """uuid-shaped string keys: range stats are useless by design —
    every bucket file spans nearly the whole lexicographic range."""
    return spark.range(n).select(
        F.md5(F.col("id").cast("string")).alias("h"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("v"),
    )


def _h(i: int) -> str:
    return hashlib.md5(str(i).encode()).hexdigest()


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "b")
    create_table(_uuid_corpus(spark), path, bucket_by=("h", N_BUCKETS))
    return path


def test_create_stamps_buckets_and_point_lookup_prunes(spark, table):
    man = _load_manifest(table, 1)
    stamped = [
        s.get("__bucket") for s in man["file_stats"].values()
    ]
    assert all(b is not None for b in stamped)
    assert set(stamped) <= set(range(N_BUCKETS))
    total = files_scanned(table)
    assert total >= 4  # uuid keys spread over most buckets
    # equality on the bucket key opens exactly one bucket's file
    probe = _h(17)
    assert files_scanned(table, prune=("h", "==", probe)) == 1
    got = read_table(spark, table, prune=("h", "==", probe)).collect()
    assert len(got) == 1 and got[0].doc_id == 17
    # absent key: still ≤1 file, empty result
    ghost = "f" * 32
    assert files_scanned(table, prune=("h", "==", ghost)) <= 1
    assert read_table(spark, table, prune=("h", "==", ghost)).count() == 0


def test_merge_rewrites_only_changeset_buckets(spark, table):
    before = set(_load_manifest(table, 1)["files"])
    # a 2-key changeset touches ≤2 buckets however large the table
    upd = spark.createDataFrame(
        [(_h(3), 3, -1), (_h(9), 9, -1)], "h string, doc_id long, v long"
    )
    merge_table(upd, table, "h")
    after = set(_load_manifest(table, 2)["files"])
    carried = before & after
    assert len(before) - len(carried) <= 2  # only hit buckets rewrote
    got = {r.doc_id: r.v for r in read_table(spark, table).collect()}
    assert got[3] == -1 and got[9] == -1 and got[4] == 4 % 7
    assert len(got) == 200
    # rewritten files carry bucket identity: lookups still prune
    assert files_scanned(table, prune=("h", "==", _h(3))) == 1
    # inserts land in their buckets too
    merge_table(
        spark.createDataFrame(
            [("zznew" + "0" * 27, 9999, 5)], "h string, doc_id long, v long"
        ),
        table,
        "h",
    )
    assert read_table(spark, table).count() == 201


def test_merge_on_other_key_falls_back_and_rebuckets(spark, table):
    """A merge keyed on a non-bucket column selects files by range but
    must still write bucket-identified output."""
    upd = spark.createDataFrame(
        [(_h(5), 5, 99)], "h string, doc_id long, v long"
    )
    merge_table(upd, table, "doc_id")
    assert files_scanned(table, prune=("h", "==", _h(5))) <= 2
    got = {r.doc_id: r.v for r in read_table(spark, table).collect()}
    assert got[5] == 99 and len(got) == 200


def test_append_and_compact_preserve_buckets(spark, table):
    shifted = spark.range(200, 250).select(
        F.md5(F.col("id").cast("string")).alias("h"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("v"),
    )
    append_table(shifted, table)
    assert read_table(spark, table).count() == 250
    # a lookup scans at most one file PER VERSION-SLICE of the bucket
    assert files_scanned(table, prune=("h", "==", _h(210))) <= 2
    # compaction folds back to ≤ n bucket files and keeps pruning
    compact_table(spark, table)
    assert files_scanned(table) <= N_BUCKETS
    assert files_scanned(table, prune=("h", "==", _h(210))) == 1
    assert read_table(spark, table).count() == 250
    got = read_table(spark, table, prune=("h", "==", _h(210))).collect()
    assert len(got) == 1 and got[0].doc_id == 210


def test_delete_update_preserve_buckets(spark, table):
    delete_where(spark, table, ("doc_id", "<", 5))
    assert read_table(spark, table).count() == 195
    assert files_scanned(table, prune=("h", "==", _h(100))) == 1
    update_where(
        spark, table, ("h", "==", _h(100)), {"v": F.lit(-9).cast("long")}
    )
    # the bucket-key equality pruned the copy-on-write to one file
    v2, v3 = _load_manifest(table, 2), _load_manifest(table, 3)
    assert len(set(v2["files"]) - set(v3["files"])) <= 1
    got = {r.doc_id: r.v for r in read_table(spark, table).collect()}
    assert got[100] == -9 and len(got) == 195
    assert files_scanned(table, prune=("h", "==", _h(100))) == 1


def test_time_travel_and_vacuum(spark, table):
    merge_table(
        spark.createDataFrame([(_h(1), 1, -1)], "h string, doc_id long, v long"),
        table, "h",
    )
    assert read_table(spark, table, version=1).where(
        F.col("doc_id") == 1
    ).collect()[0].v == 1 % 7
    vacuum_table(table, keep_last=1)
    assert _versions(table) == [2]
    assert files_scanned(table, prune=("h", "==", _h(1))) == 1


def test_in_prune_on_bucketed_and_plain(spark, table, tmp_path):
    """'in' predicates prune to the probed values' bucket set (and to
    covering files via range stats on clustered tables) — the batched
    multi-key lookup shape."""
    probes = [_h(3), _h(77), _h(150)]
    opened = files_scanned(table, prune=("h", "in", probes))
    assert 0 < opened <= 3 < files_scanned(table)
    got = {
        r.doc_id
        for r in read_table(spark, table, prune=("h", "in", probes)).collect()
    }
    assert got == {3, 77, 150}
    # a multi-key COW delete rewrites only the keys' buckets
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _load_manifest,
    )

    before = set(_load_manifest(table, 1)["files"])
    delete_where(spark, table, ("h", "in", [_h(3), _h(77)]))
    after = set(_load_manifest(table, 2)["files"])
    assert len(before - after) <= 2
    assert read_table(spark, table).count() == 198
    # clustered (range) tables prune 'in' through file ranges
    plain = str(tmp_path / "plain")
    create_table(
        spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("v")
        ).repartitionByRange(8, "k"),
        plain,
    )
    assert files_scanned(plain, prune=("k", "in", [3, 5, 990])) == 2
    rows = read_table(
        spark, plain, prune=("k", "in", [3, 5, 990])
    ).collect()
    assert sorted(r.k for r in rows) == [3, 5, 990]
    # guards: empty and null value lists fail closed
    with pytest.raises(ValueError, match="non-empty"):
        files_scanned(plain, prune=("k", "in", []))
    with pytest.raises(ValueError, match="non-null"):
        files_scanned(plain, prune=("k", "in", [1, None]))


def test_describe_and_guards(spark, tmp_path):
    path = str(tmp_path / "b")
    create_table(_uuid_corpus(spark, 40), path, bucket_by=("h", 4))
    assert describe_table(path)["bucket_by"] == {"col": "h", "n": 4}
    with pytest.raises(ValueError, match="mutually exclusive"):
        create_table(
            _uuid_corpus(spark, 4), str(tmp_path / "x"),
            cluster_by=["doc_id"], bucket_by=("h", 4),
        )
    with pytest.raises(ValueError, match="n >= 2"):
        create_table(
            _uuid_corpus(spark, 4), str(tmp_path / "y"), bucket_by=("h", 1)
        )
    with pytest.raises(ValueError, match="not in table"):
        create_table(
            _uuid_corpus(spark, 4), str(tmp_path / "z"), bucket_by=("nope", 4)
        )
    with pytest.raises(ValueError, match="must be one of"):
        create_table(
            spark.range(4).select(
                (F.col("id") * 0.5).alias("d"), F.col("id").alias("k")
            ),
            str(tmp_path / "w"),
            bucket_by=("d", 4),
        )
    with pytest.raises(ValueError, match="re-cluster a hash-bucketed"):
        merge_table(
            spark.createDataFrame([(_h(0), 0, 0)], "h string, doc_id long, v long"),
            path, "h", cluster_by=["doc_id"],
        )


def test_broken_naming_contract_stamps_nothing_reads_stay_exact(
    spark, tmp_path, monkeypatch
):
    """VERDICT r13 task #3: _stamp_buckets trusts part-file index ==
    shuffle partition id. Break the one-file-per-task convention
    deliberately (maxRecordsPerFile=1 splits every task into cNNN
    files) and require the fail-closed outcome: NO bucket recorded —
    never a wrong one — so equality reads stay exact, merely
    unpruned. The SESSION conf only reaches the legacy JVM writer:
    the round-17 fused kernel lays out its own files (splits come
    solely from the explicit bucket_file_rows), so it is immune to
    this conf — pinned at the end."""
    path = str(tmp_path / "b")
    key = "spark.sql.files.maxRecordsPerFile"
    monkeypatch.setenv("OPFPG_FUSED_WRITE", "0")
    spark.conf.set(key, "1")
    try:
        create_table(_uuid_corpus(spark, 40), path, bucket_by=("h", 4))
    finally:
        spark.conf.unset(key)
        monkeypatch.delenv("OPFPG_FUSED_WRITE")
    man = _load_manifest(table_path := path, 1)
    stamped = [
        s.get("__bucket")
        for s in man["file_stats"].values()
        if s.get("__rows", 1) != 0
    ]
    assert all(b is None for b in stamped), stamped
    # unstamped files are never BUCKET-pruned; with 1-row files the
    # range stats still prune (min==max==key) — that path stays exact
    # regardless, which is the point: no wrong bucket can exist
    total = files_scanned(table_path)
    assert 1 <= files_scanned(table_path, prune=("h", "==", _h(7))) <= total
    got = (
        read_table(spark, table_path, prune=("h", "==", _h(7)))
        .select("doc_id")
        .collect()
    )
    assert [r.doc_id for r in got] == [7]
    # a later clean rewrite (no split) restores stamps AND pruning
    compact_table(spark, table_path)
    assert files_scanned(table_path, prune=("h", "==", _h(7))) == 1
    assert [
        r.doc_id
        for r in read_table(
            spark, table_path, prune=("h", "==", _h(7))
        ).select("doc_id").collect()
    ] == [7]
    # fused kernel: the same hostile session conf cannot break the
    # naming convention, so stamps survive and pruning still bites
    path2 = str(tmp_path / "b2")
    spark.conf.set(key, "1")
    try:
        create_table(
            _uuid_corpus(spark, 40), path2, bucket_by=("h", 4),
            bloom_cols=["h"],  # bloom write -> fused kernel
        )
    finally:
        spark.conf.unset(key)
    man2 = _load_manifest(path2, 1)
    assert all(
        "__bucket" in s
        for s in man2["file_stats"].values()
        if s.get("__rows", 1) != 0
    )
    assert [
        r.doc_id
        for r in read_table(
            spark, path2, prune=("h", "==", _h(7))
        ).select("doc_id").collect()
    ] == [7]


def test_stamp_guard_pure_function_matrix():
    """The guard itself, row by row: every deviation from the
    convention stamps nothing; the clean case stamps everything."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _stamp_buckets,
    )

    u = "0aa5a8e3-1111-2222-3333-444455556666"
    clean = [
        f"data/v00000001/part-0000{i}-{u}-c000.snappy.parquet"
        for i in range(3)
    ]

    def stamp(files, n=4):
        stats = {f: {} for f in files}
        _stamp_buckets(stats, files, n)
        return [s.get("__bucket") for s in stats.values()]

    assert stamp(clean) == [0, 1, 2]
    # a cNNN>0 file anywhere poisons the whole stamp set
    split = clean + [f"data/v00000001/part-00000-{u}-c001.snappy.parquet"]
    assert stamp(split) == [None] * 4
    # index >= n
    over = clean + [f"data/v00000001/part-00009-{u}-c000.snappy.parquet"]
    assert stamp(over) == [None] * 4
    # duplicate index (two jobs' files interleaved)
    u2 = u.replace("0aa", "abc")
    dup = clean + [f"data/v00000001/part-00002-{u2}-c000.snappy.parquet"]
    assert stamp(dup) == [None] * 4
    # unparsable naming
    weird = clean + ["data/v00000001/run-3.parquet"]
    assert stamp(weird) == [None] * 4


# ---------------------------------------------------------------------
# round 14: bucket + sort-order composition (VERDICT r13 task #6)


def _src_corpus(spark, n=4000):
    """Repeated bucket keys (32 sources) + a monotone sort column:
    the Iceberg bucket-transform + sort-order shape."""
    return spark.range(n).select(
        F.concat(F.lit("src-"), (F.col("id") % 32).cast("string")).alias(
            "src"
        ),
        F.col("id").alias("doc_id"),
        (F.col("id") * 3).alias("v"),
    )


@pytest.fixture()
def sorted_table(spark, tmp_path):
    path = str(tmp_path / "sb")
    create_table(
        _src_corpus(spark),
        path,
        bucket_by=("src", 4),
        sort_within_buckets=["doc_id"],
        bucket_file_rows=250,
    )
    return path


def test_sorted_buckets_layout_and_stamps(spark, sorted_table):
    man = _load_manifest(sorted_table, 1)
    stamps = [s.get("__bucket") for s in man["file_stats"].values()]
    assert all(b is not None for b in stamps)
    assert set(stamps) == set(range(4))
    # each bucket split into ~1000/250 = 4 slices
    assert len(man["files"]) >= 8
    # every slice's doc_id range is NARROW and, within a bucket,
    # slices are pairwise disjoint (the sorted-split contract)
    by_bucket = {}
    for f, s in man["file_stats"].items():
        by_bucket.setdefault(s["__bucket"], []).append(tuple(s["doc_id"]))
    for b, ranges in by_bucket.items():
        ranges.sort()
        assert len(ranges) >= 2, (b, ranges)
        for (alo, ahi), (blo, bhi) in zip(ranges, ranges[1:]):
            assert ahi < blo, (b, ranges)  # disjoint, ordered


def test_sorted_buckets_two_predicate_lookup(spark, sorted_table):
    # bucket identity alone: all of src-7's bucket's slices
    bucket_only = files_scanned(sorted_table, prune=("src", "==", "src-7"))
    total = files_scanned(sorted_table)
    assert 2 <= bucket_only < total
    # + a narrow sort-column range: ONE slice
    preds = [
        ("src", "==", "src-7"),
        ("doc_id", ">=", 1000),
        ("doc_id", "<", 1050),
    ]
    both = files_scanned(sorted_table, prune=preds)
    assert both == 1, (both, bucket_only, total)
    got = sorted(
        r.doc_id
        for r in read_table(spark, sorted_table, prune=preds).collect()
    )
    assert got == [i for i in range(1000, 1050) if i % 32 == 7]


def test_sorted_buckets_survive_every_rewrite(spark, sorted_table):
    path = sorted_table
    # merge an upsert of one source's early rows
    upd = spark.createDataFrame(
        [(f"src-7", i, -1) for i in range(7, 200, 32)],
        "src string, doc_id long, v long",
    )
    merge_table(upd, path, "doc_id")
    append_table(_src_corpus(spark).where(F.col("doc_id") >= 3900), path)
    update_where(spark, path, ("doc_id", "<", 10), {"v": F.lit(0).cast("long")})
    delete_where(spark, path, ("doc_id", ">=", 4000))
    man = _load_manifest(path, _versions(path)[-1])
    stamps = [s.get("__bucket") for s in man["file_stats"].values()]
    assert all(b is not None for b in stamps), "a rewrite lost its stamps"
    preds = [
        ("src", "==", "src-7"),
        ("doc_id", ">=", 1000),
        ("doc_id", "<", 1050),
    ]
    assert files_scanned(path, prune=preds) < files_scanned(
        path, prune=("src", "==", "src-7")
    )
    got = sorted(
        r.doc_id for r in read_table(spark, path, prune=preds).collect()
    )
    assert got == [i for i in range(1000, 1050) if i % 32 == 7]


def test_sorted_bucket_validation(spark, tmp_path):
    df = _src_corpus(spark, 40)
    with pytest.raises(ValueError, match="not in table"):
        create_table(
            df, str(tmp_path / "a"), bucket_by=("src", 4),
            sort_within_buckets=["nope"],
        )
    with pytest.raises(ValueError, match="need bucket_by"):
        create_table(
            df, str(tmp_path / "b"), sort_within_buckets=["doc_id"]
        )
    with pytest.raises(ValueError, match="needs sort_within_buckets"):
        create_table(
            df, str(tmp_path / "c"), bucket_by=("src", 4),
            bucket_file_rows=10,
        )
    with pytest.raises(ValueError, match=">= 1"):
        create_table(
            df, str(tmp_path / "d"), bucket_by=("src", 4),
            sort_within_buckets=["doc_id"], bucket_file_rows=0,
        )
