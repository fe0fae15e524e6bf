"""Round 14 schema evolution: metadata-only ADD/DROP/RENAME COLUMN
with manifest rename chains, alias-coalesce reads, stats re-keying,
graveyard name-reuse bans, and MOR-mask interaction."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.versioned import (
    _load_manifest,
    _versions,
    add_column,
    add_constraint,
    append_table,
    create_table,
    delete_rows,
    drop_column,
    files_scanned,
    merge_table,
    purge_deletes,
    read_table,
    rename_column,
    table_minmax,
    update_where,
)


def _kv(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_rename_reads_both_eras_and_time_travels(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 10).repartitionByRange(2, "k"), path)
    v = rename_column(path, "v", "val")
    assert v == 2
    man = _load_manifest(path, 2)
    # metadata only: the file list is IDENTICAL
    assert man["files"] == _load_manifest(path, 1)["files"]
    assert [c for c, _ in man["schema"]] == ["k", "val"]
    got = {r.k: r.val for r in read_table(spark, path).collect()}
    assert got == {i: i * 2 for i in range(10)}
    # append in the new era; both eras coalesce
    append_table(
        spark.createDataFrame([(100, 7)], "k long, val long"), path
    )
    got = {r.k: r.val for r in read_table(spark, path).collect()}
    assert got[100] == 7 and got[3] == 6 and len(got) == 11
    # time travel: v1 shows the OLD name and values
    old = read_table(spark, path, version=1)
    assert old.columns == ["k", "v"]
    assert {r.k: r.v for r in old.collect()} == {i: i * 2 for i in range(10)}
    # appending with the RETIRED name is rejected (schema is the law)
    with pytest.raises(ValueError):
        append_table(
            spark.createDataFrame([(101, 8)], "k long, v long"), path
        )


def test_rename_chain_three_eras(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 4), path)
    rename_column(path, "v", "v2")
    append_table(spark.createDataFrame([(10, 20)], "k long, v2 long"), path)
    rename_column(path, "v2", "v3")
    append_table(spark.createDataFrame([(11, 22)], "k long, v3 long"), path)
    got = {r.k: r.v3 for r in read_table(spark, path).collect()}
    assert got == {0: 0, 1: 2, 2: 4, 3: 6, 10: 20, 11: 22}
    # middle era reads under its own name
    mid = read_table(spark, path, version=3)
    assert mid.columns == ["k", "v2"]
    assert {r.k: r.v2 for r in mid.collect()}[10] == 20


def test_rename_rekeys_stats_for_metadata_answers(spark, tmp_path):
    path = str(tmp_path / "t")
    # range layout WITHOUT a recorded cluster_by spec (a recorded spec
    # would rightly reject the rename) — the stats are just as narrow
    create_table(_kv(spark, 100).repartitionByRange(4, "k"), path)
    rename_column(path, "k", "key")
    # minmax answers from manifests across the rename — zero data I/O
    assert table_minmax(path, "key") == (0, 99)
    # pruning on the NEW name still skips pre-rename files
    opened = files_scanned(path, prune=("key", "<", 25))
    assert opened == 1 < files_scanned(path)
    got = sorted(
        r.key for r in read_table(spark, path, prune=("key", "<", 25)).collect()
    )
    assert got == list(range(25))


def test_add_column_nulls_then_values(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 5), path)
    add_column(path, "score", "double")
    assert _load_manifest(path, 2)["files"] == _load_manifest(path, 1)["files"]
    got = read_table(spark, path).collect()
    assert all(r.score is None for r in got)
    append_table(
        spark.createDataFrame([(9, 9, 0.5)], "k long, v long, score double"),
        path,
    )
    got = {r.k: r.score for r in read_table(spark, path).collect()}
    assert got[9] == 0.5 and got[1] is None
    # validation
    with pytest.raises(ValueError, match="identifier"):
        add_column(path, "bad name", "int")
    with pytest.raises(ValueError, match="not supported"):
        add_column(path, "m", "map<string,int>")
    add_column(path, "d", "decimal(10,2)")


def test_drop_column_and_graveyard(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 5), path)
    drop_column(path, "v")
    assert read_table(spark, path).columns == ["k"]
    # time travel still shows the dropped column
    assert read_table(spark, path, version=1).columns == ["k", "v"]
    # the graveyard: the name can NEVER come back
    with pytest.raises(ValueError, match="already used"):
        add_column(path, "v", "bigint")
    with pytest.raises(ValueError, match="already used"):
        rename_column(path, "k", "v")
    with pytest.raises(ValueError, match="re-adds historical"):
        append_table(
            spark.createDataFrame([(7, 7)], "k long, v long"),
            path,
            evolve=True,
        )
    with pytest.raises(ValueError, match="last column"):
        drop_column(path, "k")
    # renamed-away names are graveyarded too
    rename_column(path, "k", "key")
    with pytest.raises(ValueError, match="already used"):
        add_column(path, "k", "bigint")


def test_ddl_rejected_on_referenced_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(
        _kv(spark, 20).repartitionByRange(2, "k"), path, cluster_by=["k"]
    )
    add_constraint(spark, path, "pos", "v >= 0")
    with pytest.raises(ValueError, match="cluster_by"):
        rename_column(path, "k", "key")
    with pytest.raises(ValueError, match="constraint 'pos'"):
        rename_column(path, "v", "val")
    with pytest.raises(ValueError, match="constraint 'pos'"):
        drop_column(path, "v")
    bp = str(tmp_path / "b")
    create_table(
        spark.range(8).select(
            F.col("id").cast("string").alias("h"), F.col("id").alias("x")
        ),
        bp,
        bucket_by=("h", 2),
    )
    with pytest.raises(ValueError, match="bucket_by"):
        rename_column(bp, "h", "hh")


def test_masks_survive_rename_and_block_key_drop(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 20).repartitionByRange(2, "k"), path)
    delete_rows(spark, path, spark.createDataFrame([(5,)], "k long"), "k")
    rename_column(path, "k", "key")
    got = sorted(r.key for r in read_table(spark, path).collect())
    assert got == [i for i in range(20) if i != 5]
    # dropping the (renamed) mask key is rejected until purge
    with pytest.raises(ValueError, match="purge_deletes first"):
        drop_column(path, "key")
    purge_deletes(spark, path)
    got = sorted(r.key for r in read_table(spark, path).collect())
    assert got == [i for i in range(20) if i != 5]
    # post-purge the drop is legal (v stays: keep a second column)
    drop_column(path, "key")
    assert read_table(spark, path).columns == ["v"]


def test_rewrites_migrate_rows_to_new_names(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 20).repartitionByRange(2, "k"), path)
    rename_column(path, "v", "val")
    update_where(spark, path, ("k", "<", 5), {"val": F.lit(0).cast("long")})
    merge_table(
        spark.createDataFrame([(19, -1), (50, 1)], "k long, val long"),
        path,
        "k",
    )
    got = {r.k: r.val for r in read_table(spark, path).collect()}
    assert got[0] == 0 and got[4] == 0 and got[19] == -1 and got[50] == 1
    assert got[10] == 20 and len(got) == 21


def test_describe_reports_evolution_metadata(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        describe_table,
    )

    path = str(tmp_path / "t")
    create_table(_kv(spark, 5), path)
    rename_column(path, "v", "val")
    add_column(path, "extra", "string")
    drop_column(path, "extra")
    d = describe_table(path)
    assert d["renames"] == [["v", "val"]]
    assert d["dropped_columns"] == ["extra"]
    assert [c for c, _ in d["schema"]] == ["k", "val"]
    # pre-evolution versions describe with their own era's metadata
    d1 = describe_table(path, version=1)
    assert d1["renames"] == [] and d1["dropped_columns"] == []


def test_clone_carries_rename_chain(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        clone_table,
    )

    path = str(tmp_path / "src")
    create_table(_kv(spark, 10), path)
    rename_column(path, "v", "val")
    append_table(spark.createDataFrame([(50, 1)], "k long, val long"), path)
    dst = str(tmp_path / "fork")
    clone_table(path, dst)
    got = {r.k: r.val for r in read_table(spark, dst).collect()}
    assert got == {**{i: i * 2 for i in range(10)}, 50: 1}
    # the fork's graveyard carried too: the old name stays banned
    with pytest.raises(ValueError, match="already used"):
        add_column(dst, "v", "bigint")
    # DDL on the fork diverges without touching the source
    rename_column(dst, "val", "val2")
    assert read_table(spark, dst).columns == ["k", "val2"]
    assert read_table(spark, path).columns == ["k", "val"]


def test_restore_across_rename_then_rerename(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        restore_table,
    )

    path = str(tmp_path / "t")
    create_table(_kv(spark, 6), path)          # v1: (k, v)
    rename_column(path, "v", "w")              # v2: (k, w)
    restore_table(path, 1)                     # v3: (k, v) again
    assert read_table(spark, path).columns == ["k", "v"]
    got = {r.k: r.v for r in read_table(spark, path).collect()}
    assert got == {i: i * 2 for i in range(6)}
    # the retired name 'w' stays banned even after the restore
    with pytest.raises(ValueError, match="already used"):
        rename_column(path, "v", "w")
    # a FRESH rename of the restored column is legal and reads clean
    rename_column(path, "v", "v9")
    got = {r.k: r.v9 for r in read_table(spark, path).collect()}
    assert got == {i: i * 2 for i in range(6)}


def test_purge_and_partial_compact_on_evolved_layouts(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _load_manifest,
        compact_table,
        files_scanned,
    )

    # purge on a SORTED-BUCKET table keeps the split layout prunable
    bp = str(tmp_path / "sb")
    src = spark.range(2000).select(
        F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias("s"),
        F.col("id").alias("d"),
        (F.col("id") * 3).alias("v"),
    )
    create_table(
        src, bp, bucket_by=("s", 4), sort_within_buckets=["d"],
        bucket_file_rows=200,
    )
    delete_rows(spark, bp, spark.createDataFrame([(7,), (1999,)], "d long"), "d")
    purge_deletes(spark, bp)
    man = _load_manifest(bp, 3)
    assert not man.get("delete_files")
    stamps = [x.get("__bucket") for x in man["file_stats"].values()]
    assert all(b is not None for b in stamps)
    preds = [("s", "==", "s3"), ("d", ">=", 500), ("d", "<", 600)]
    assert files_scanned(bp, prune=preds) < files_scanned(
        bp, prune=("s", "==", "s3")
    )
    got = sorted(r.d for r in read_table(spark, bp, prune=preds).collect())
    assert got == [i for i in range(500, 600) if i % 20 == 3]
    # partial compact on a ZORDER table re-interleaves the folded subset
    zp = str(tmp_path / "z")
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("v"),
    )
    create_table(
        grid.repartition(4), zp, cluster_by=["a", "b"],
        cluster_kind="zorder",
    )
    for i in range(3):
        append_table(
            grid.where(F.col("v") % 16 == i).coalesce(1), zp
        )
    v = compact_table(spark, zp, where=[("a", ">=", 0)])  # all files hit
    man = _load_manifest(zp, v)
    assert man["op"] == "compact"
    n = read_table(spark, zp).count()
    assert n == 4096 + 3 * 256
    # the fold re-applied the recorded z-order spec (tiny data folds
    # to one file here, so prune-bites-at-scale is covered by
    # test_zorder_table.py; this pins exactness + spec survival)
    box = [("a", ">=", 8), ("a", "<", 16), ("b", ">=", 8), ("b", "<", 16)]
    rows = read_table(spark, zp, prune=box).count()
    assert rows == sum(
        1
        for i in range(4096)
        for rep in range(1 + (1 if i % 16 in (0, 1, 2) else 0))
        if 8 <= i % 64 < 16 and 8 <= i // 64 < 16
    )


def test_quantize_plan_is_shuffle_free(spark):
    from optimal_parallel_fp_growth_spark.functions.planview import (
        plan_report,
    )
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        quantize_embeddings,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    q = quantize_embeddings(
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
    )
    rep = plan_report(q)
    assert rep.hash_exchanges == 0 and rep.range_exchanges == 0
    assert rep.python_stages == 0  # pure codegen, no UDF


def test_table_changes_across_rename_keeps_values(spark, tmp_path):
    """CDF across a rename boundary: pre-images come from from-era
    files (old physical name) but the feed is aligned to the TO
    schema — the renamed column must carry VALUES, not nulls, and
    mask keys recorded pre-rename must still resolve."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        table_changes,
    )

    path = str(tmp_path / "t")
    create_table(_kv(spark, 10).repartitionByRange(2, "k"), path)  # v1
    delete_rows(spark, path, spark.createDataFrame([(3,)], "k long"), "k")
    rename_column(path, "v", "val")                                # v3
    merge_table(
        spark.createDataFrame([(0, -1)], "k long, val long"), path, "k"
    )                                                              # v4
    ch = table_changes(spark, path, 1, 4, key="k")
    rows = {(r.k, r._change_type): r.val for r in ch.collect()}
    # the v1→v4 diff: k=3 deleted (mask, recorded pre-rename),
    # k=0 updated to -1 — and the renamed column carries the REAL
    # old values, never nulls
    assert rows == {
        (0, "update_preimage"): 0,
        (0, "update_postimage"): -1,
        (3, "delete"): 6,
    }


def test_ddl_races_append_under_with_retry(spark, tmp_path):
    """Schema DDL is a committer like any writer: a rename racing an
    append contends on the same version arbiter, and with_retry
    resolves the loser onto the next version. Both effects must
    land, whichever order the arbiter picks."""
    import threading

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        with_retry,
    )

    path = str(tmp_path / "t")
    create_table(_kv(spark, 20).repartitionByRange(2, "k"), path)
    barrier = threading.Barrier(2)
    results = {}

    def renamer():
        barrier.wait()
        results["rename"] = with_retry(lambda: rename_column(path, "v", "val"))

    def appender():
        def attempt():
            # the append must speak the CURRENT schema: re-read it on
            # every retry (after losing to the rename it is 'val')
            cols = [
                c
                for c, _ in _load_manifest(path, _versions(path)[-1])["schema"]
            ]
            df = spark.createDataFrame([(100, 7)], f"{cols[0]} long, {cols[1]} long")
            return append_table(df, path)

        barrier.wait()
        # the documented DDL seam: losing to a rename can surface as a
        # schema ValueError (the plan predated the DDL) — re-plan once
        # against the fresh schema, then retry conflicts as usual
        try:
            results["append"] = with_retry(attempt)
        except ValueError:
            results["append"] = with_retry(attempt)

    ts = [threading.Thread(target=renamer), threading.Thread(target=appender)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(results.values()) == [2, 3], results
    got = {r.k: r.val for r in read_table(spark, path).collect()}
    assert got[100] == 7 and got[3] == 6 and len(got) == 21
