"""Round-13 versioned-table additions: copy-on-write UPDATE
(``update_where``), manifest min/max aggregate pushdown
(``table_minmax``), and multi-predicate (AND) manifest pruning in
``read_table``/``files_scanned``."""

from __future__ import annotations

import pathlib

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.versioned import (
    append_table,
    create_table,
    delete_rows,
    files_scanned,
    read_table,
    table_history,
    table_minmax,
    update_where,
    vacuum_table,
)


def _kv(spark, n=100, parts=4):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("tag"),
    ).repartitionByRange(parts, "k")


# ---------------------------------------------------------------------------
# update_where


def test_update_basic_and_oracle(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 100), path)
    update_where(
        spark, path, ("k", "<", 30),
        {"v": F.col("v") * 10, "tag": F.lit("hit")},
    )
    got = {r.k: (r.v, r.tag) for r in read_table(spark, path).collect()}
    assert len(got) == 100
    for k in range(100):
        if k < 30:
            assert got[k] == (k * 2 * 10, "hit")
        else:
            assert got[k] == (k * 2, f"s{k}")
    # history: one new version, op recorded
    assert [h["op"] for h in table_history(path)] == ["create", "update"]


def test_update_rewrites_only_intersecting_files(spark, tmp_path):
    """COW pruning: files whose manifest range can't contain a match
    carry forward BY REFERENCE (same relative path in the next
    manifest), only intersecting files rewrite."""
    path = str(tmp_path / "t")
    create_table(_kv(spark, 100, parts=4), path)
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _load_manifest,
        _versions,
    )

    before = _load_manifest(path, _versions(path)[-1])["files"]
    update_where(spark, path, ("k", "==", 5), {"v": F.lit(-1).cast("long")})
    after = _load_manifest(path, _versions(path)[-1])["files"]
    carried = set(before) & set(after)
    assert len(carried) == len(before) - 1  # exactly one file rewrote
    got = {r.k: r.v for r in read_table(spark, path).collect()}
    assert got[5] == -1 and got[6] == 12 and len(got) == 100


def test_update_assignment_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 20), path)
    with pytest.raises(ValueError, match="not .*table column|unknown"):
        update_where(spark, path, ("k", "<", 5), {"nope": F.lit(1)})
    with pytest.raises(ValueError, match="type"):
        # v is bigint; a string assignment must be rejected, not cast
        update_where(spark, path, ("k", "<", 5), {"v": F.lit("oops")})
    with pytest.raises(ValueError, match="assignment"):
        update_where(spark, path, ("k", "<", 5), {})
    with pytest.raises(ValueError, match="unsupported prune op"):
        update_where(spark, path, ("k", "%", 5), {"v": F.lit(0)})
    # sql-expression strings and plain literals both work
    update_where(spark, path, ("k", ">=", 18), {"v": "v + k"})
    update_where(
        spark, path, ("k", "==", 0), {"v": F.lit(7).cast("long")}
    )
    got = {r.k: r.v for r in read_table(spark, path).collect()}
    assert got[19] == 19 * 2 + 19 and got[18] == 18 * 2 + 18
    assert got[0] == 7 and got[1] == 2


def test_update_reads_through_mor_masks(spark, tmp_path):
    """A merge-on-read-deleted row must NOT be resurrected by an
    update that rewrites its file."""
    path = str(tmp_path / "t")
    create_table(_kv(spark, 10, parts=1), path)
    delete_rows(
        spark, path, spark.createDataFrame([(3,)], "k long"), "k"
    )
    update_where(spark, path, ("k", "<", 100), {"v": F.lit(0).cast("long")})
    ks = sorted(r.k for r in read_table(spark, path).collect())
    assert ks == [0, 1, 2, 4, 5, 6, 7, 8, 9]
    assert {r.v for r in read_table(spark, path).collect()} == {0}


def test_update_keeps_cluster_spec_layout(spark, tmp_path):
    """With a recorded cluster_by spec, an update that moves the
    clustered key re-clusters the rewritten rows so pruning keeps
    biting."""
    path = str(tmp_path / "t")
    create_table(
        spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).repartition(8),
        path,
        cluster_by=["k"],
    )
    total = files_scanned(path)
    assert total > 1
    update_where(spark, path, ("k", ">=", 0), {"v": F.col("v") + 1})
    assert files_scanned(path, prune=("k", "==", 5)) < files_scanned(path)
    got = {r.k: r.v for r in read_table(spark, path).collect()}
    assert got[5] == 11 and len(got) == 1000


def test_update_time_travel_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 50), path)
    update_where(spark, path, ("k", "<", 10), {"v": F.lit(-1).cast("long")})
    old = {r.k: r.v for r in read_table(spark, path, version=1).collect()}
    assert old[5] == 10  # pre-update snapshot intact
    vacuum_table(path, keep_last=1)
    got = {r.k: r.v for r in read_table(spark, path).collect()}
    assert got[5] == -1 and len(got) == 50


# ---------------------------------------------------------------------------
# table_minmax


def test_minmax_from_manifest_matches_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 100), path)
    append_table(
        spark.range(200, 250).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
            F.lit("x").alias("tag"),
        ),
        path,
    )
    assert table_minmax(path, "k") == (0, 249)
    assert table_minmax(path, "v") == (0, 498)
    # time travel reads the pinned manifest
    assert table_minmax(path, "k", version=1) == (0, 99)


def test_minmax_fails_closed(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 20), path)
    # strings: parquet writers may truncate binary stats — bounds are
    # valid for pruning but NOT exact extremes; must refuse
    with pytest.raises(ValueError, match="exact"):
        table_minmax(path, "tag")
    with pytest.raises(ValueError, match="not a table column"):
        table_minmax(path, "ghost")
    # merge-on-read masks: the masked row could BE the extremum
    delete_rows(
        spark, path, spark.createDataFrame([(19,)], "k long"), "k"
    )
    with pytest.raises(ValueError, match="delete masks"):
        table_minmax(path, "k")
    # the pre-delete version still answers
    assert table_minmax(path, "k", version=1) == (0, 19)


def test_minmax_null_and_stats_gap(spark, tmp_path):
    # a file whose column stats are missing (all-NULL chunk) fails
    # closed rather than guessing
    path = str(tmp_path / "t")
    create_table(
        spark.createDataFrame(
            [(1, None), (2, None)], "k long, v long"
        ),
        path,
    )
    with pytest.raises(ValueError, match="no usable|no .*stats"):
        table_minmax(path, "v")
    assert table_minmax(path, "k") == (1, 2)


def test_minmax_rejects_float_double_nan_hazard(spark, tmp_path):
    # ADVICE r13 (medium), refined by VERDICT r14 task #5: parquet
    # footer stats EXCLUDE NaN while Spark and DuckDB order NaN above
    # every value — a manifest max() over a float/double column
    # silently misses a NaN extremum, so a NaN-holding (or
    # NaN-unknown) file fails closed. Since round 15 commits record a
    # per-file ``__nan`` flag, so a PROVABLY NaN-free float column
    # answers exactly instead of being rejected outright (the full
    # matrix lives in test_nan_stats.py).
    path = str(tmp_path / "t")
    create_table(
        spark.createDataFrame(
            [(1, 1.5), (2, float("nan"))], "k long, v double"
        ),
        path,
    )
    with pytest.raises(ValueError, match="NaN"):
        table_minmax(path, "v")
    # the demonstration: the real max IS NaN, which footer stats omit
    row = read_table(spark, path).agg(F.max("v").alias("m")).collect()[0]
    assert row.m != row.m  # NaN
    # a provably NaN-free float column answers exactly (round 15)
    create_table(
        spark.createDataFrame([(1, 1.5)], "k long, f float"),
        str(tmp_path / "t2"),
    )
    assert table_minmax(str(tmp_path / "t2"), "f") == (1.5, 1.5)
    # integer columns keep answering from metadata
    assert table_minmax(path, "k") == (1, 2)


def test_update_where_requires_predicate(spark, tmp_path):
    # ADVICE r13 (low): an empty/None predicate used to reach
    # F.when(None, ...) and die with an opaque TypeError; it must be a
    # clear validation error, mirroring delete_where.
    path = str(tmp_path / "t")
    create_table(_kv(spark, 10), path)
    with pytest.raises(ValueError, match="needs a predicate"):
        update_where(spark, path, None, {"v": F.lit(0)})
    with pytest.raises(ValueError, match="needs a predicate"):
        update_where(spark, path, [], {"v": F.lit(0)})


# ---------------------------------------------------------------------------
# multi-predicate (AND) pruning


def test_range_prune_cuts_both_sides(spark, tmp_path):
    """A middle-slice read [lo, hi) on a clustered table must prune
    files on BOTH sides — the single-triple API could only cut one."""
    path = str(tmp_path / "t")
    create_table(
        spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        ).repartitionByRange(8, "k"),
        path,
    )
    total = files_scanned(path)
    assert total == 8
    both = files_scanned(path, prune=[("k", ">=", 400), ("k", "<", 600)])
    one = files_scanned(path, prune=("k", ">=", 400))
    assert both < one < total
    rows = read_table(
        spark, path, prune=[("k", ">=", 400), ("k", "<", 600)]
    ).collect()
    assert sorted(r.k for r in rows) == list(range(400, 600))
    # all-pruned conjunction: typed empty frame, no files listed
    empty = read_table(
        spark, path, prune=[("k", ">=", 400), ("k", "<", 300)]
    )
    assert empty.count() == 0 and empty.columns == ["k", "v"]
    assert files_scanned(
        path, prune=[("k", ">=", 400), ("k", "<", 300)]
    ) == 0
    # conjunction across DIFFERENT columns filters exactly
    mixed = read_table(
        spark, path, prune=[("k", ">=", 990), ("v", "==", 1)]
    ).collect()
    assert sorted(r.k for r in mixed) == [995]


def test_range_prune_single_triple_still_works(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, 100), path)
    assert files_scanned(path, prune=("k", ">=", 90)) < files_scanned(path)
    assert read_table(spark, path, prune=("k", ">=", 90)).count() == 10


def test_delete_where_accepts_and_list(spark, tmp_path):
    """A ranged delete [lo, hi) rewrites only the files inside the
    slice — the single triple rewrote everything from lo to the end."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _load_manifest,
        delete_where,
    )

    path = str(tmp_path / "t")
    create_table(_kv(spark, 100, parts=4), path)
    before = set(_load_manifest(path, 1)["files"])
    delete_where(spark, path, [("k", ">=", 30), ("k", "<", 45)])
    after = set(_load_manifest(path, 2)["files"])
    assert len(before & after) == 3  # only the middle file rewrote
    ks = sorted(r.k for r in read_table(spark, path).collect())
    assert ks == [k for k in range(100) if not (30 <= k < 45)]
    with pytest.raises(ValueError, match="needs a predicate"):
        delete_where(spark, path, [])


# ---------------------------------------------------------------------------
# merge_table(update_cols=...) — the whenMatchedUpdate(set=...) arm


def test_merge_update_cols_partial_update(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        merge_table,
    )

    path = str(tmp_path / "t")
    create_table(_kv(spark, 20), path)
    # update ONLY v; tag must keep its current value even though the
    # source carries a tag column (extra context columns are ignored)
    src = spark.createDataFrame(
        [(3, 999, "IGNORED"), (7, None, "IGNORED"), (500, 1, "IGNORED")],
        "k long, v long, tag string",
    )
    merge_table(src, path, "k", update_cols=["v"])
    got = {r.k: (r.v, r.tag) for r in read_table(spark, path).collect()}
    assert got[3] == (999, "s3")       # updated v, kept tag
    assert got[7] == (None, "s7")      # explicit NULL is written
    assert 500 not in got              # unmatched source key ignored
    assert got[4] == (8, "s4")         # untouched row
    assert len(got) == 20


def test_merge_update_cols_with_delete_arm(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        merge_table,
    )

    path = str(tmp_path / "t")
    create_table(_kv(spark, 10), path)
    src = spark.createDataFrame(
        [(1, -1, None), (2, 0, True)], "k long, v long, __del boolean"
    )
    merge_table(src, path, "k", delete_col="__del", update_cols=["v"])
    got = {r.k: r.v for r in read_table(spark, path).collect()}
    assert got[1] == -1 and 2 not in got and len(got) == 9


def test_merge_update_cols_guards_and_noop(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        merge_table,
        table_history,
    )

    path = str(tmp_path / "t")
    create_table(_kv(spark, 10), path)
    with pytest.raises(ValueError, match="at least one"):
        merge_table(_kv(spark, 1), path, "k", update_cols=[])
    with pytest.raises(ValueError, match="merge key"):
        merge_table(_kv(spark, 1), path, "k", update_cols=["k"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        merge_table(
            _kv(spark, 1), path, "k", update_cols=["v"], evolve=True
        )
    with pytest.raises(ValueError, match="lacks columns"):
        merge_table(
            spark.createDataFrame([(1,)], "k long"), path, "k",
            update_cols=["v"],
        )
    # type changes rejected by the shared schema check
    with pytest.raises(ValueError):
        merge_table(
            spark.createDataFrame([(1, "oops")], "k long, v string"),
            path, "k", update_cols=["v"],
        )
    # nothing matched AND no file intersects: a clean no-op version
    far = spark.createDataFrame([(10_000, 0)], "k long, v long")
    merge_table(far, path, "k", update_cols=["v"])
    assert read_table(spark, path).count() == 10
    assert table_history(path)[-1]["op"] == "merge"
