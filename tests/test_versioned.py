"""Versioned manifest-committed tables (sources/versioned.py):
create/append/overwrite/compact/time-travel/vacuum semantics and the
atomic-visibility property."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.versioned import (
    append_table,
    compact_table,
    create_table,
    overwrite_table,
    read_table,
    table_history,
    vacuum_table,
)


def _batch(spark, start, n):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    )


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    assert create_table(_batch(spark, 0, 100), path) == 1
    return path


def test_create_and_read(spark, table):
    assert read_table(spark, table).count() == 100
    with pytest.raises(FileExistsError):
        create_table(_batch(spark, 0, 1), table)


def test_append_versions_and_time_travel(spark, table):
    assert append_table(_batch(spark, 100, 50), table) == 2
    assert append_table(_batch(spark, 150, 25), table) == 3
    assert read_table(spark, table).count() == 175
    assert read_table(spark, table, version=1).count() == 100
    assert read_table(spark, table, version=2).count() == 150
    ids = {r.doc_id for r in read_table(spark, table, version=2).collect()}
    assert ids == set(range(150))
    ops = [h["op"] for h in table_history(table)]
    assert ops == ["create", "append", "append"]


def test_overwrite_keeps_history(spark, table):
    append_table(_batch(spark, 100, 50), table)
    overwrite_table(_batch(spark, 1000, 10), table)
    assert read_table(spark, table).count() == 10
    assert read_table(spark, table, version=2).count() == 150


def test_compact_preserves_rows_and_history(spark, table):
    for i in range(4):
        append_table(_batch(spark, 100 + i * 10, 10), table)
    before = read_table(spark, table)
    n_before = before.count()
    h_before = table_history(table)[-1]
    v = compact_table(spark, table, target_mb=128)
    assert v == h_before["version"] + 1
    after = read_table(spark, table)
    assert after.count() == n_before
    assert {r.doc_id for r in after.collect()} == {
        r.doc_id for r in before.collect()
    }
    # compacted into fewer files; pre-compaction version still reads
    hist = {h["version"]: h for h in table_history(table)}
    assert hist[v]["n_files"] < h_before["n_files"] or h_before["n_files"] == 1
    assert read_table(spark, table, version=h_before["version"]).count() == n_before


def test_vacuum_reclaims_and_expires(spark, table):
    append_table(_batch(spark, 100, 50), table)
    overwrite_table(_batch(spark, 1000, 10), table)
    deleted = vacuum_table(table, keep_last=1)
    assert deleted > 0
    # latest still reads; expired versions are gone
    assert read_table(spark, table).count() == 10
    with pytest.raises(FileNotFoundError):
        read_table(spark, table, version=1)


def test_vacuum_reclaims_orphaned_staging_dirs(spark, table):
    """Review r11: a writer crashing between its Spark write and the
    atomic rename strands a full version-sized copy under a
    dot-prefixed staging directory; vacuum must reclaim it (the old
    `v*` sweep could never match a dotted name), without touching the
    live version."""
    import pathlib

    stale = (
        pathlib.Path(table) / "data" / ".v00000002.staging.deadbeef"
    )
    stale.mkdir(parents=True)
    (stale / "part-00000.parquet").write_bytes(b"not-a-real-parquet")
    (stale / "_SUCCESS").write_bytes(b"")
    deleted = vacuum_table(table, keep_last=1)
    assert deleted >= 1
    assert not stale.exists()
    assert read_table(spark, table).count() == 100  # live data intact


def test_commit_conflict_raises(spark, table):
    """Two writers racing the same next version: the second manifest
    rename must fail, not corrupt."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _commit,
        _load_manifest,
        _versions,
    )

    cur = _versions(table)[-1]
    files = _load_manifest(table, cur)["files"]
    assert _commit(table, cur + 1, files, "append") == cur + 1
    with pytest.raises(FileExistsError):
        _commit(table, cur + 1, files, "append")
    # table still consistent
    assert read_table(spark, table, version=cur + 1).count() == 100


def test_commit_rejects_unparseable_file_paths(spark, table):
    """Readers derive the MOR sequence from the path via a regexp
    whose miss is a silent NULL (row kept unmasked) — so a path the
    regexp can't parse must be rejected AT COMMIT (advice r11)."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _commit,
        _load_manifest,
        _versions,
    )

    cur = _versions(table)[-1]
    man = _load_manifest(table, cur)
    with pytest.raises(ValueError, match="sequence"):
        _commit(table, cur + 1, man["files"] + ["loose/part-0.parquet"],
                "append")
    with pytest.raises(ValueError, match="sequence"):
        _commit(
            table, cur + 1, man["files"], "delete_rows",
            delete_files=[{"file": "no-version-dir.parquet",
                           "seq": cur, "key": "doc_id"}],
        )
    assert _versions(table)[-1] == cur  # nothing committed


def test_stream_to_table_versions_per_batch(spark, sf_small, tmp_path):
    """Each micro-batch commits as one atomic version; the final table
    equals the full input and intermediate versions are readable."""
    import time

    from optimal_parallel_fp_growth_spark.sources.catalog import load_table
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        stream_to_table,
    )

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    src = str(tmp_path / "feed")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    third = len(ids) // 3
    bounds = [ids[third], ids[2 * third]]
    lo = float("-inf")
    for hi in [*bounds, float("inf")]:
        docs.where((F.col("doc_id") > lo) & (F.col("doc_id") <= hi)).coalesce(
            1
        ).write.mode("append").parquet(src)
        time.sleep(0.05)
        lo = hi
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tbl = str(tmp_path / "vtable")
    q = stream_to_table(stream, tbl, str(tmp_path / "ckpt"))
    q.awaitTermination()
    hist = table_history(tbl)
    assert [h["op"] for h in hist] == ["create", "append", "append"]
    assert read_table(spark, tbl).count() == docs.count()
    v1 = read_table(spark, tbl, version=1).count()
    v2 = read_table(spark, tbl, version=2).count()
    assert 0 < v1 < v2 < docs.count()


def test_property_random_op_sequences_keep_invariants(spark, tmp_path):
    """Hypothesis: any create/append/overwrite/compact sequence keeps
    (a) every committed version readable with its recorded row count,
    (b) versions strictly increasing by 1, (c) latest == the expected
    row multiset under the op semantics."""
    from hypothesis import given, settings, strategies as st

    op_strat = st.lists(
        st.sampled_from(["append", "overwrite", "compact", "evolve"]),
        min_size=1,
        max_size=5,
    )

    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(ops=op_strat)
    def run(ops):
        counter[0] += 1
        path = str(tmp_path / f"ptbl{counter[0]}")
        expected = [100]  # rows per version
        create_table(_batch(spark, 0, 100), path)
        nxt = 100
        evolved = 0  # extra columns added so far
        for op in ops:
            if op == "append":
                create = _batch(spark, nxt, 10)
                append_table(create, path, evolve=evolved > 0)
                expected.append(expected[-1] + 10)
                nxt += 10
            elif op == "overwrite":
                overwrite_table(_batch(spark, nxt, 7), path)
                expected.append(7)
                evolved = 0  # overwrite resets the schema
                nxt += 7
            elif op == "evolve":
                evolved += 1
                wider = _batch(spark, nxt, 5).withColumn(
                    f"x{evolved}", F.lit(evolved)
                )
                append_table(wider, path, evolve=True)
                expected.append(expected[-1] + 5)
                nxt += 5
            else:
                from optimal_parallel_fp_growth_spark.sources.versioned import (
                    compact_table,
                )

                compact_table(spark, path)
                expected.append(expected[-1])
        hist = table_history(path)
        assert [h["version"] for h in hist] == list(range(1, len(expected) + 1))
        for v, want in enumerate(expected, start=1):
            assert read_table(spark, path, version=v).count() == want
        # the latest schema carries every evolved column still in force
        latest = read_table(spark, path)
        for i in range(1, evolved + 1):
            assert f"x{i}" in latest.columns

    run()


def test_append_schema_mismatch_rejected(spark, table):
    wrong = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("v")  # v: string
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        append_table(wrong, table)
    # overwrite legitimately changes the schema; appends then follow it
    overwrite_table(wrong, table)
    append_table(
        spark.range(3).select(
            F.col("id").alias("doc_id"), F.lit("y").alias("v")
        ),
        table,
    )
    assert read_table(spark, table).count() == 8


def test_append_rejects_duplicate_column_names(spark, table):
    """The round-8 subset relaxation must not re-admit duplicate batch
    column names: each dup matches the table schema individually, so
    without an explicit check the failure would surface later as an
    opaque Spark write/union error (ADVICE r8 low)."""
    dup = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.col("id").alias("doc_id"),
    )
    with pytest.raises(ValueError, match="appears 2 times"):
        append_table(dup, table)


def test_append_may_omit_and_reorder_columns_iceberg_contract(spark, table):
    """Round-8 contract pin (Iceberg writer semantics): a plain append
    may OMIT table columns (readers see typed nulls) and order columns
    freely — but may not ADD a column or change a shared type without
    evolve=True. The exact hypothesis counterexample from round 7
    (evolve, then plain 2-column append) must succeed."""
    # evolve: widen with tag
    append_table(
        spark.createDataFrame([(100, 0, "t")], "doc_id long, v long, tag string"),
        table,
        evolve=True,
    )
    # the round-7 failure: plain append that omits the evolved column
    append_table(_batch(spark, 200, 3), table)
    got = read_table(spark, table)
    assert set(got.columns) == {"doc_id", "v", "tag"}
    rows = {r.doc_id: (r.v, r.tag) for r in got.collect() if r.doc_id >= 100}
    assert rows == {100: (0, "t"), 200: (400, None), 201: (402, None),
                    202: (404, None)}
    # reordered columns append by NAME, not position
    append_table(
        spark.createDataFrame([("u", 300, 7)], "tag string, doc_id long, v long"),
        table,
    )
    r = read_table(spark, table).where(F.col("doc_id") == 300).collect()[0]
    assert (r.v, r.tag) == (7, "u")
    # a NEW column still requires evolve=True
    with pytest.raises(ValueError, match="schema mismatch"):
        append_table(
            spark.createDataFrame([(400, 1, 2)], "doc_id long, v long, extra long"),
            table,
        )
    # a type change on a shared column is always rejected
    with pytest.raises(ValueError, match="schema mismatch"):
        append_table(
            spark.createDataFrame([(401, "s")], "doc_id long, v string"), table
        )


# ---------------------------------------------------------------------
# round-6: manifest file-level min/max stats + pruned reads + the
# atomic create-exclusive commit (ADVICE r5 TOCTOU fix)
# ---------------------------------------------------------------------


def _ranged(spark, n=400, files=4):
    # disjoint doc_id ranges per file so manifest stats can prune
    return (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v"))
        .repartitionByRange(files, "doc_id")
    )


def test_manifest_stats_prune_files_and_keep_rows(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        files_scanned,
    )

    path = str(tmp_path / "ptbl")
    create_table(_ranged(spark), path)
    total = files_scanned(path)
    assert total >= 3  # range partitioning really produced several files
    pruned = files_scanned(path, prune=("doc_id", ">=", 300))
    assert pruned < total  # stats actually skipped files
    # exactness: pruned read == unpruned read + DataFrame filter
    got = {
        r.doc_id
        for r in read_table(spark, path, prune=("doc_id", ">=", 300)).collect()
    }
    want = {
        r.doc_id
        for r in read_table(spark, path).where(F.col("doc_id") >= 300).collect()
    }
    assert got == want and len(got) == 100


def test_prune_survives_append_and_time_travel(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        files_scanned,
    )

    path = str(tmp_path / "atbl")
    create_table(_ranged(spark, 200, 2), path)
    append_table(
        spark.range(1000, 1200)
        .select(F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v"))
        .repartitionByRange(2, "doc_id"),
        path,
    )
    # v2 prune: only the appended files can hold doc_id >= 1000
    assert files_scanned(path, version=2, prune=("doc_id", ">=", 1000)) < \
        files_scanned(path, version=2)
    assert read_table(
        spark, path, version=2, prune=("doc_id", ">=", 1000)
    ).count() == 200
    # time travel to v1 under the same prune: nothing matches
    assert read_table(
        spark, path, version=1, prune=("doc_id", ">=", 1000)
    ).count() == 0


def test_prune_all_files_returns_empty_with_table_schema(spark, tmp_path):
    path = str(tmp_path / "etbl")
    create_table(_ranged(spark, 100, 2), path)
    out = read_table(spark, path, prune=("doc_id", ">", 10_000))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "v"]


def test_prune_missing_stats_never_drops_rows(spark, tmp_path):
    """A manifest without file_stats (legacy / unreadable footers) must
    fall back to scanning every file — prune on ignorance is a
    correctness bug."""
    import json as _json
    import pathlib as _pl

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _MANIFEST_DIR,
        files_scanned,
    )

    path = str(tmp_path / "ltbl")
    create_table(_ranged(spark, 100, 2), path)
    mpath = next((_pl.Path(path) / _MANIFEST_DIR).glob("v*.json"))
    man = _json.loads(mpath.read_text())
    man.pop("file_stats", None)
    mpath.write_text(_json.dumps(man))
    assert files_scanned(path, prune=("doc_id", ">=", 90)) == files_scanned(path)
    assert read_table(spark, path, prune=("doc_id", ">=", 90)).count() == 10


def test_file_survives_operator_table():
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _file_survives,
    )

    stats = {"k": [10, 20]}
    cases = [
        ("==", 15, True), ("==", 9, False), ("==", 21, False),
        (">=", 20, True), (">=", 21, False),
        (">", 19, True), (">", 20, False),
        ("<=", 10, True), ("<=", 9, False),
        ("<", 11, True), ("<", 10, False),
    ]
    for op, val, want in cases:
        assert _file_survives(stats, "k", op, val) is want, (op, val)
    assert _file_survives({}, "k", "==", 1) is True  # no stats → keep
    assert _file_survives(stats, "other", "==", 1) is True
    with pytest.raises(ValueError, match="unsupported prune op"):
        _file_survives(stats, "k", "!=", 1)


def test_commit_is_atomic_even_when_exists_fastpath_misses(
    spark, table, monkeypatch
):
    """The TOCTOU guarantee: even if a racer lands the target BETWEEN
    the exists() fast path and the final step, the second committer
    must fail (os.link raises EEXIST; os.rename would silently replace
    and lose a manifest). Simulated by blinding the fast path."""
    import pathlib as _pl

    from optimal_parallel_fp_growth_spark.sources import versioned as V

    cur = V._versions(table)[-1]
    files = V._load_manifest(table, cur)["files"]
    assert V._commit(table, cur + 1, files, "append") == cur + 1
    monkeypatch.setattr(_pl.Path, "exists", lambda self: False)
    with pytest.raises(FileExistsError):
        V._commit(table, cur + 1, files, "append")
    monkeypatch.undo()
    # loser's tmp file was cleaned up; table still consistent
    mdir = _pl.Path(table) / V._MANIFEST_DIR
    assert not list(mdir.glob(".*.tmp.*"))
    assert read_table(spark, table, version=cur + 1).count() == 100


# ---------------------------------------------------------------------
# round-6: copy-on-write MERGE (upsert) and DELETE with stats-driven
# file selection
# ---------------------------------------------------------------------


def test_merge_upserts_and_inserts(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import merge_table

    path = str(tmp_path / "mtbl")
    create_table(_ranged(spark, 400, 4), path)  # v: doc_id % 7
    # update keys 10..19 (v -> 999), insert keys 1000..1004
    src = spark.createDataFrame(
        [(i, 999) for i in range(10, 20)] + [(i, 999) for i in range(1000, 1005)],
        "doc_id long, v long",
    )
    v = merge_table(src, path, "doc_id")
    assert v == 2
    got = {r.doc_id: r.v for r in read_table(spark, path).collect()}
    assert len(got) == 405
    assert all(got[i] == 999 for i in range(10, 20))
    assert all(got[i] == 999 for i in range(1000, 1005))
    assert got[100] == 100 % 7  # untouched row unchanged
    # time travel: v1 has the original rows, no inserts
    old = {r.doc_id: r.v for r in read_table(spark, path, version=1).collect()}
    assert len(old) == 400 and old[10] == 10 % 7


def test_merge_rewrites_only_intersecting_files(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _load_manifest,
        merge_table,
    )

    path = str(tmp_path / "mtbl2")
    create_table(_ranged(spark, 400, 4), path)  # 4 disjoint doc_id ranges
    v1_files = set(_load_manifest(path, 1)["files"])
    assert len(v1_files) == 4
    # touch only keys 0..9 — exactly one range file intersects
    src = spark.createDataFrame(
        [(i, 111) for i in range(10)], "doc_id long, v long"
    )
    merge_table(src, path, "doc_id")
    v2_files = set(_load_manifest(path, 2)["files"])
    carried = v1_files & v2_files
    assert len(carried) == 3  # three of four files carried by reference
    # and the carried files kept their stats (prunable without re-read)
    st = _load_manifest(path, 2)["file_stats"]
    assert all(st.get(f, {}).get("doc_id") for f in carried)


def test_merge_requires_matching_schema_and_rows(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import merge_table

    path = str(tmp_path / "mtbl3")
    create_table(_ranged(spark, 50, 1), path)
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_table(
            spark.createDataFrame([(1, "x")], "doc_id long, v string"),
            path, "doc_id",
        )
    with pytest.raises(ValueError, match="no rows"):
        merge_table(
            spark.createDataFrame([], "doc_id long, v long"), path, "doc_id"
        )


def test_delete_where_drops_rows_and_skips_files(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _load_manifest,
        delete_where,
    )

    path = str(tmp_path / "dtbl")
    create_table(_ranged(spark, 400, 4), path)
    v1_files = set(_load_manifest(path, 1)["files"])
    v = delete_where(spark, path, ("doc_id", ">=", 300))
    assert v == 2
    got = {r.doc_id for r in read_table(spark, path).collect()}
    assert got == set(range(300))
    # files entirely below 300 carried by reference
    v2_files = set(_load_manifest(path, 2)["files"])
    assert len(v1_files & v2_files) >= 2
    # v1 still has everything (time travel unaffected)
    assert read_table(spark, path, version=1).count() == 400
    with pytest.raises(ValueError, match="unsupported prune op"):
        delete_where(spark, path, ("doc_id", "!=", 1))


def test_delete_where_all_matching_file_is_dropped_not_rewritten(
    spark, tmp_path
):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _load_manifest,
        delete_where,
    )

    path = str(tmp_path / "dtbl2")
    create_table(_ranged(spark, 200, 2), path)
    # delete EXACTLY the upper range file's rows: with disjoint ranges
    # the lower file carries forward and no new file is written for a
    # fully-deleted one... (the affected file rewrites to its kept
    # rows; here the predicate matches all its rows so the rewrite is
    # empty but the manifest stays consistent)
    delete_where(spark, path, ("doc_id", ">=", 100))
    assert read_table(spark, path).count() == 100
    man = _load_manifest(path, 2)
    assert man["op"] == "delete"


def test_stream_merge_to_table_upserts_per_batch(spark, tmp_path):
    """CDC stream: batch 1 creates, batch 2 updates half the keys and
    inserts new ones; final table is the merged state and v1 still
    replays the pre-merge rows."""
    import time as _time

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        stream_merge_to_table,
    )

    src = str(tmp_path / "cdc_feed")
    b1 = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    )
    b2 = spark.range(50, 150).select(
        F.col("id").alias("doc_id"), F.lit(-5).cast("long").alias("v")
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    _time.sleep(0.05)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tbl = str(tmp_path / "cdc_tbl")
    q = stream_merge_to_table(stream, tbl, str(tmp_path / "cdc_ckpt"), "doc_id")
    q.awaitTermination()
    hist = table_history(tbl)
    assert [h["op"] for h in hist] == ["create", "merge"]
    got = {r.doc_id: r.v for r in read_table(spark, tbl).collect()}
    assert len(got) == 150
    assert got[10] == 20          # untouched batch-1 row
    assert got[60] == -5          # updated
    assert got[120] == -5         # inserted
    # time travel to the pre-merge state
    v1 = {r.doc_id: r.v for r in read_table(spark, tbl, version=1).collect()}
    assert len(v1) == 100 and v1[60] == 120


def test_stream_merge_evolve_across_feed_generations(spark, tmp_path):
    """A CDC feed that grew a column between deployments: the second
    stream's wider batches merge in under evolve=True; rows from the
    first generation read null in the new column."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        stream_merge_to_table,
    )

    tbl = str(tmp_path / "gen_tbl")
    src1 = str(tmp_path / "feed_v1")
    spark.range(10).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.mode("append").parquet(src1)
    s1 = spark.readStream.schema("doc_id long, v long").parquet(src1)
    stream_merge_to_table(
        s1, tbl, str(tmp_path / "ck1"), "doc_id"
    ).awaitTermination()
    src2 = str(tmp_path / "feed_v2")
    spark.range(5, 12).select(
        F.col("id").alias("doc_id"),
        F.lit(-1).cast("long").alias("v"),
        F.lit("eu").alias("region"),
    ).coalesce(1).write.mode("append").parquet(src2)
    s2 = spark.readStream.schema(
        "doc_id long, v long, region string"
    ).parquet(src2)
    stream_merge_to_table(
        s2, tbl, str(tmp_path / "ck2"), "doc_id", evolve=True
    ).awaitTermination()
    got = {r.doc_id: (r.v, r.region) for r in read_table(spark, tbl).collect()}
    assert got[7] == (-1, "eu") and got[11] == (-1, "eu")
    assert got[2] == (4, None) and len(got) == 12


def test_property_random_sequences_with_merge_and_delete(spark, tmp_path):
    """Hypothesis over create/append/overwrite/compact/merge/delete:
    every committed version stays readable with its recorded rows, the
    latest state equals a dict-model of the op semantics, and manifest
    stats never prune a live row."""
    from hypothesis import given, settings, strategies as st

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_where,
        merge_table,
    )

    op_strat = st.lists(
        st.sampled_from(["append", "merge", "delete", "overwrite", "compact"]),
        min_size=1,
        max_size=5,
    )
    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(ops=op_strat)
    def run(ops):
        counter[0] += 1
        path = str(tmp_path / f"pmtbl{counter[0]}")
        model = {i: (i * 2) for i in range(60)}
        create_table(_batch(spark, 0, 60).repartitionByRange(3, "doc_id"), path)
        nxt = 60
        for op in ops:
            if op == "append":
                append_table(_batch(spark, nxt, 10), path)
                model.update({i: i * 2 for i in range(nxt, nxt + 10)})
                nxt += 10
            elif op == "merge":
                # update 5 existing (if present) + insert 5 fresh
                lo = max(model) - 4 if model else 0
                src_rows = [(k, -7) for k in list(model)[:5]] + [
                    (nxt + j, -7) for j in range(5)
                ]
                src = spark.createDataFrame(src_rows, "doc_id long, v long")
                merge_table(src, path, "doc_id")
                model.update({k: -7 for k, _ in src_rows})
                nxt += 5
                _ = lo
            elif op == "delete":
                cut = sorted(model)[len(model) // 2] if model else 0
                delete_where(spark, path, ("doc_id", ">=", cut))
                model = {k: v for k, v in model.items() if k < cut}
                if not model:  # table may go empty; re-seed via merge
                    src = spark.createDataFrame(
                        [(nxt, 1)], "doc_id long, v long"
                    )
                    merge_table(src, path, "doc_id")
                    model[nxt] = 1
                    nxt += 1
            elif op == "overwrite":
                overwrite_table(_batch(spark, nxt, 7), path)
                model = {i: i * 2 for i in range(nxt, nxt + 7)}
                nxt += 7
            else:
                compact_table(spark, path)
        got = {r.doc_id: r.v for r in read_table(spark, path).collect()}
        assert got == model
        # every historical version still readable
        for h in table_history(path):
            assert read_table(spark, path, version=h["version"]).count() >= 0
        # stats never prune a live row: pruned read == filtered read
        if model:
            mid = sorted(model)[len(model) // 2]
            pruned = {
                r.doc_id
                for r in read_table(
                    spark, path, prune=("doc_id", ">=", mid)
                ).collect()
            }
            assert pruned == {k for k in model if k >= mid}

    run()


def test_concurrent_merges_one_wins(spark, tmp_path):
    """Two writers merging against the same snapshot: exactly one
    commit succeeds, the loser sees FileExistsError and can retry on a
    fresh snapshot — the optimistic-concurrency contract extended to
    MERGE."""
    import threading

    from optimal_parallel_fp_growth_spark.sources.versioned import merge_table

    path = str(tmp_path / "racetbl")
    create_table(_batch(spark, 0, 100).repartitionByRange(2, "doc_id"), path)
    results = {}
    barrier = threading.Barrier(2)

    def writer(tag, lo):
        src = spark.createDataFrame(
            [(i, -1) for i in range(lo, lo + 5)], "doc_id long, v long"
        )
        barrier.wait()
        try:
            results[tag] = ("ok", merge_table(src, path, "doc_id"))
        except FileExistsError:
            # the ONLY legal conflict signal: a loser racing on either
            # the data directory or the manifest link must surface
            # FileExistsError, never a raw Spark AnalysisException
            # escaping the thread (VERDICT r10 #5)
            results[tag] = ("conflict", None)

    ts = [
        threading.Thread(target=writer, args=("a", 0)),
        threading.Thread(target=writer, args=("b", 50)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # both writers must report — an exception type other than the
    # documented FileExistsError would have escaped on its thread
    assert sorted(results) == ["a", "b"], results
    outcomes = sorted(r[0] for r in results.values())
    # at least one MUST win; both winning the same version is the
    # TOCTOU bug the link-commit prevents
    assert "ok" in outcomes
    from optimal_parallel_fp_growth_spark.sources.versioned import _versions

    assert _versions(path)[-1] == 2  # exactly one new version born
    # table is consistent and reflects exactly the winner's rows
    got = {r.doc_id: r.v for r in read_table(spark, path).collect()}
    winners = [t for t, r in results.items() if r[0] == "ok"]
    if outcomes == ["ok", "ok"]:
        # both claim success: only possible if they committed DIFFERENT
        # versions (one retried) — with no retry logic this is a bug
        raise AssertionError("both writers claimed the same version")
    lo = 0 if winners[0] == "a" else 50
    assert all(got[i] == -1 for i in range(lo, lo + 5))
    # and NONE of the loser's rows leaked into the committed version:
    # with a shared write directory the winner's glob-built manifest
    # could absorb the loser's interleaved part files (review r11) —
    # the staged-rename write makes this structurally impossible
    lo_loser = 50 if lo == 0 else 0
    assert all(got[i] != -1 for i in range(lo_loser, lo_loser + 5))


def test_with_retry_both_concurrent_writers_commit(spark, tmp_path):
    """VERDICT r13 task #5: package the reread-and-retry loop the
    optimistic protocol asks of a losing writer. A concurrent
    append × merge under ``with_retry`` must BOTH survive: the loser
    re-snapshots (every public writer re-reads the manifest at entry)
    and lands on the next version."""
    import threading

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        CommitConflict,
        merge_table,
        with_retry,
    )

    path = str(tmp_path / "retrytbl")
    create_table(_batch(spark, 0, 100).repartitionByRange(2, "doc_id"), path)
    results = {}
    barrier = threading.Barrier(2)

    def appender():
        barrier.wait()
        results["append"] = with_retry(
            lambda: append_table(_batch(spark, 1000, 10), path)
        )

    def merger():
        src = spark.createDataFrame(
            [(i, -1) for i in range(5)], "doc_id long, v long"
        )
        barrier.wait()
        results["merge"] = with_retry(
            lambda: merge_table(src, path, "doc_id")
        )

    ts = [threading.Thread(target=appender), threading.Thread(target=merger)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # both committed, on distinct versions, in either order
    assert sorted(results.values()) == [2, 3], results
    got = {r.doc_id: r.v for r in read_table(spark, path).collect()}
    assert len(got) == 110  # 100 base + 10 appended; merge updated 5
    assert all(got[i] == -1 for i in range(5))
    assert all(got[i] == i * 2 for i in range(1000, 1010))
    # non-conflict failures surface immediately — no retry storm
    calls = []

    def always_fatal():
        calls.append(1)
        raise FileExistsError("versioned table already exists at x")

    with pytest.raises(FileExistsError):
        with_retry(always_fatal, retries=3)
    assert len(calls) == 1
    # genuine conflicts retry up to the cap, then propagate
    calls.clear()

    def always_losing():
        calls.append(1)
        raise CommitConflict("version 9 already committed at x")

    with pytest.raises(CommitConflict):
        with_retry(always_losing, retries=3, backoff_s=0.001)
    assert len(calls) == 4


# ---------------------------------------------------------------------
# round 6: additive schema evolution (Iceberg semantics, name-matched)
# ---------------------------------------------------------------------


def test_evolve_append_adds_column_old_files_read_null(spark, table):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        append_table,
        read_table,
    )

    newer = _batch(spark, 100, 50).withColumn("lang", F.lit("en"))
    v2 = append_table(newer, table, evolve=True)
    df = read_table(spark, table)
    assert df.columns == ["doc_id", "v", "lang"]
    assert df.count() == 150
    # rows from v1 files (written before `lang` existed) read as null
    assert df.where(F.col("lang").isNull()).count() == 100
    assert df.where(F.col("lang") == "en").count() == 50
    # time travel to v1 shows the ORIGINAL schema (its manifest)
    assert read_table(spark, table, version=1).columns == ["doc_id", "v"]
    assert v2 == 2


def test_evolve_append_may_omit_columns(spark, table):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        append_table,
        read_table,
    )

    # append with only doc_id: table's `v` fills null for the new rows
    only_ids = spark.range(100, 130).select(F.col("id").alias("doc_id"))
    append_table(only_ids, table, evolve=True)
    df = read_table(spark, table)
    assert df.columns == ["doc_id", "v"]
    assert df.count() == 130
    assert df.where(F.col("v").isNull()).count() == 30


def test_evolve_rejects_type_change(spark, table):
    from optimal_parallel_fp_growth_spark.sources.versioned import append_table

    bad = _batch(spark, 0, 5).withColumn("v", F.col("v").cast("string"))
    with pytest.raises(ValueError, match="cannot change column"):
        append_table(bad, table, evolve=True)


def test_strict_append_still_rejects_without_evolve(spark, table):
    from optimal_parallel_fp_growth_spark.sources.versioned import append_table

    wider = _batch(spark, 0, 5).withColumn("lang", F.lit("en"))
    with pytest.raises(ValueError, match="evolve=True"):
        append_table(wider, table)


def test_merge_and_delete_work_across_evolution(spark, table):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        append_table,
        delete_where,
        merge_table,
        read_table,
    )

    append_table(
        _batch(spark, 100, 20).withColumn("lang", F.lit("fr")),
        table,
        evolve=True,
    )
    # merge touches keys on BOTH sides of the evolution boundary
    src = spark.createDataFrame(
        [(5, 999, "de"), (110, 888, "de"), (200, 777, "de")],
        "doc_id long, v long, lang string",
    )
    merge_table(src, table, key="doc_id")
    df = read_table(spark, table)
    assert df.count() == 121  # 120 existing + 1 inserted
    got = {r.doc_id: (r.v, r.lang) for r in df.where(F.col("lang") == "de").collect()}
    assert got == {5: (999, "de"), 110: (888, "de"), 200: (777, "de")}
    # delete across the boundary
    delete_where(spark, table, ("doc_id", ">=", 100))
    df = read_table(spark, table)
    assert df.count() == 100 and df.columns == ["doc_id", "v", "lang"]


def test_evolve_prune_on_new_column_keeps_old_files(spark, table):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        append_table,
        read_table,
    )

    append_table(
        _batch(spark, 100, 10).withColumn("score", F.lit(5).cast("bigint")),
        table,
        evolve=True,
    )
    # pruning on the evolved column: old files carry no stats for it,
    # so they conservatively survive; results stay exact
    df = read_table(spark, table, prune=("score", "==", 5))
    assert df.count() == 10
    assert df.columns == ["doc_id", "v", "score"]


def test_merge_rejects_null_keys(spark, tmp_path):
    """A null upsert key would never equi-join, so a retried merge
    would re-insert it forever (at-least-once idempotency breach,
    ADVICE r6) - reject loudly instead."""
    from optimal_parallel_fp_growth_spark.sources.versioned import merge_table

    path = str(tmp_path / "tbl")
    create_table(_batch(spark, 0, 20), path)
    src = spark.createDataFrame(
        [(5, 99), (None, 7), (21, 42)], "doc_id long, v long"
    )
    with pytest.raises(ValueError, match="null 'doc_id'"):
        merge_table(src, path, "doc_id")
    # table unchanged - the reject happened before any commit
    assert read_table(spark, path).count() == 20


def test_date_keyed_table_prune_and_merge(spark, tmp_path):
    """Date/timestamp stats are recorded as ISO strings; pruning and
    merging with datetime probes must not TypeError and must stay
    exact (ADVICE r6)."""
    import datetime

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        files_scanned,
        merge_table,
    )

    path = str(tmp_path / "dtbl")
    base = datetime.date(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=i), i, f"s{i}") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "d date, v long, tag string")
    # several files so the range stats can actually prune some
    create_table(df.repartitionByRange(3, "d"), path)

    probe = base + datetime.timedelta(days=25)
    got = read_table(spark, path, prune=("d", ">=", probe)).collect()
    assert sorted(r.v for r in got) == list(range(25, 30))
    # the prune really skips range-disjoint files, not just filters
    assert files_scanned(path, prune=("d", ">=", probe)) < 3

    # COW merge keyed on the date column: datetime bounds vs string stats
    upd = spark.createDataFrame(
        [(probe, 999, "upd"), (base + datetime.timedelta(days=40), 40, "new")],
        "d date, v long, tag string",
    )
    merge_table(upd, path, "d")
    after = {r.d: (r.v, r.tag) for r in read_table(spark, path).collect()}
    assert len(after) == 31
    assert after[probe] == (999, "upd")
    assert after[base + datetime.timedelta(days=40)] == (40, "new")
    assert after[base] == (0, "s0")


def test_timestamp_keyed_prune_no_typeerror(spark, tmp_path):
    import datetime

    from optimal_parallel_fp_growth_spark.sources.versioned import files_scanned

    path = str(tmp_path / "tstbl")
    base = datetime.datetime(2024, 6, 1, 12, 0, 0)
    rows = [(base + datetime.timedelta(hours=i), i) for i in range(24)]
    df = spark.createDataFrame(rows, "ts timestamp, v long")
    create_table(df.repartitionByRange(4, "ts"), path)
    probe = base + datetime.timedelta(hours=20)
    got = read_table(spark, path, prune=("ts", ">", probe)).collect()
    assert sorted(r.v for r in got) == [21, 22, 23]
    assert files_scanned(path, prune=("ts", ">", probe)) < 4


def test_driver_canonical_hash_versioned_family(spark, sf_oracle):
    """Replay the driver's correctness canonicalization (sort columns
    by name, round floats to 1e-9, sort row tuples, hash the rendered
    rows) for the versioned registry entries, Spark vs DuckDB, TWICE -
    so a driver-side hash divergence like the r6 `versioned_read` red
    row (rows+schema matched, hash did not; never reproduced locally)
    cannot recur silently. Asserts value-hash equality AND cross-run
    determinism of the Spark side."""
    import hashlib
    import math

    import duckdb

    import __spark_entry__ as em
    from optimal_parallel_fp_growth_spark.sources.catalog import TABLES

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def cv(v):
            if isinstance(v, bool):
                return ("b", int(v))
            if isinstance(v, float):
                return ("f", "NaN" if math.isnan(v) else round(v, 9))
            if isinstance(v, int):
                return ("i", v)
            return ("s", str(v))

        return sorted(tuple(cv(r[i]) for i in order) for r in rows)

    def vhash(rows, cols):
        return hashlib.md5(repr(canon(rows, cols)).encode()).hexdigest()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_oracle}/{t}.parquet')"
        )
    qs, oracles = em.queries(), em.oracle_sql()
    for name in ("versioned_read", "versioned_merge"):
        sdf1 = qs[name](spark, sf_oracle)
        h1 = vhash([tuple(r) for r in sdf1.collect()], sdf1.columns)
        sdf2 = qs[name](spark, sf_oracle)
        h2 = vhash([tuple(r) for r in sdf2.collect()], sdf2.columns)
        assert h1 == h2, f"{name}: Spark result not run-deterministic"
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        ho = vhash(res.fetchall(), dcols)
        assert h1 == ho, f"{name}: Spark/oracle canonical hash diverged"
    con.close()


def test_reader_during_merge_sees_pinned_snapshot(spark, table):
    """Snapshot isolation under COW merge: a DataFrame opened before
    (or while) a merge commits keeps reading its pinned version's
    files — merge writes NEW files and never mutates old ones."""
    from optimal_parallel_fp_growth_spark.sources.versioned import merge_table

    before_latest = read_table(spark, table)          # resolves to v1 now
    before_pinned = read_table(spark, table, version=1)
    want = {r.doc_id: r.v for r in before_pinned.collect()}

    src = spark.createDataFrame(
        [(5, -1), (17, -1), (200, -1)], "doc_id long, v long"
    )
    merge_table(src, table, "doc_id")

    # both handles still see the pre-merge snapshot, row for row
    for df in (before_latest, before_pinned):
        got = {r.doc_id: r.v for r in df.collect()}
        assert got == want
    # a fresh read sees the merge
    after = {r.doc_id: r.v for r in read_table(spark, table).collect()}
    assert after[5] == -1 and after[200] == -1 and len(after) == 101


def test_reader_during_evolving_merge_keeps_old_schema(spark, table):
    """The race the r6 schema-evolution work left untested: a reader
    opened pre-evolution collects AFTER an evolve-append + merge land;
    its schema and rows must be the pinned version's, not the new
    manifest's."""
    from optimal_parallel_fp_growth_spark.sources.versioned import merge_table

    old_reader = read_table(spark, table)
    append_table(
        spark.createDataFrame([(500, 1, "x")], "doc_id long, v long, tag string"),
        table,
        evolve=True,
    )
    merge_table(
        spark.createDataFrame([(5, -1, "y")], "doc_id long, v long, tag string"),
        table,
        "doc_id",
    )
    rows = old_reader.collect()
    assert old_reader.columns == ["doc_id", "v"]  # pre-evolution schema
    assert {r.doc_id for r in rows} == set(range(100))
    new_rows = {r.doc_id: r.tag for r in read_table(spark, table).collect()}
    assert new_rows[500] == "x" and new_rows[5] == "y"
    assert new_rows[6] is None  # old files read null for the new column


def test_vacuum_during_time_travel_fails_closed(spark, table):
    """Vacuum drops expired manifests WITH their files: time travel to
    a vacuumed version must raise FileNotFoundError (not return
    partial data), surviving versions must stay exact, and a vacuum
    must never delete a file the kept manifests reference."""
    append_table(_batch(spark, 100, 50), table)   # v2
    overwrite_table(_batch(spark, 1000, 10), table)  # v3
    v2 = {r.doc_id for r in read_table(spark, table, version=2).collect()}
    assert len(v2) == 150

    deleted = vacuum_table(table, keep_last=1)
    assert deleted > 0
    with pytest.raises(FileNotFoundError):
        read_table(spark, table, version=2)
    with pytest.raises(FileNotFoundError):
        read_table(spark, table, version=1)
    # the kept version is untouched
    assert {r.doc_id for r in read_table(spark, table).collect()} == set(
        range(1000, 1010)
    )


def test_property_reader_and_vacuum_interleavings(spark, tmp_path):
    """Hypothesis over append/evolve-append/merge/overwrite/vacuum
    with snapshot readers opened at random points: every reader whose
    version survives vacuums collects EXACTLY its snapshot rows later;
    every vacuumed version raises FileNotFoundError on time travel;
    the latest read always equals the op-semantics model."""
    from hypothesis import given, settings, strategies as st

    from optimal_parallel_fp_growth_spark.sources.versioned import merge_table

    op_strat = st.lists(
        st.sampled_from(
            ["append", "evolve", "merge", "overwrite", "vacuum", "reader"]
        ),
        min_size=2,
        max_size=6,
    )
    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(ops=op_strat)
    def run(ops):
        counter[0] += 1
        path = str(tmp_path / f"race{counter[0]}")
        create_table(_batch(spark, 0, 30).repartitionByRange(2, "doc_id"), path)
        model = {i: i * 2 for i in range(30)}
        version = 1
        nxt = 30
        readers = []  # (version, snapshot-of-model at open time)
        min_live = 1  # oldest non-vacuumed version
        for op in ops:
            if op == "append":
                append_table(_batch(spark, nxt, 5), path)
                model.update({i: i * 2 for i in range(nxt, nxt + 5)})
                nxt += 5
                version += 1
            elif op == "evolve":
                df = spark.createDataFrame(
                    [(nxt, 0, "t")], "doc_id long, v long, tag string"
                )
                append_table(df, path, evolve=True)
                model[nxt] = 0
                nxt += 1
                version += 1
            elif op == "merge":
                src = spark.createDataFrame(
                    [(k, -9) for k in list(model)[:3]] + [(nxt, -9)],
                    "doc_id long, v long",
                )
                src = src.select(
                    "doc_id", "v"
                )  # merge aligns to current schema internally
                try:
                    merge_table(src, path, "doc_id")
                except ValueError:
                    # schema evolved to 3 columns: merge needs them all
                    src3 = spark.createDataFrame(
                        [(k, -9, None) for k in list(model)[:3]]
                        + [(nxt, -9, None)],
                        "doc_id long, v long, tag string",
                    )
                    merge_table(src3, path, "doc_id")
                for k in list(model)[:3]:
                    model[k] = -9
                model[nxt] = -9
                nxt += 1
                version += 1
            elif op == "overwrite":
                overwrite_table(_batch(spark, nxt, 8), path)
                model = {i: i * 2 for i in range(nxt, nxt + 8)}
                nxt += 8
                version += 1
            elif op == "vacuum":
                vacuum_table(path, keep_last=1)
                min_live = version
            else:  # reader
                readers.append((version, dict(model)))
        # latest state equals the model
        got = {r.doc_id: r.v for r in read_table(spark, path).collect()}
        assert got == model
        # snapshot readers: survivors exact, vacuumed fail closed
        for v, snap in readers:
            if v >= min_live:
                rows = {
                    r.doc_id: r.v
                    for r in read_table(spark, path, version=v).collect()
                }
                assert rows == snap, f"version {v} snapshot drifted"
            else:
                with pytest.raises(FileNotFoundError):
                    read_table(spark, path, version=v)

    run()


def test_table_changes_matches_full_snapshot_diff(spark, table):
    """GROUND_TRUTH_PIN for versioned_changes: the manifest-diff change
    feed (reads only files exclusive to one side) equals the brute
    diff of the two FULL snapshots, for every version pair across a
    merge + a delete — including the composite v1→v3 feed where a
    deleted-after-update key must carry the v1 pre-image."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_where,
        merge_table,
        table_changes,
    )

    src = spark.createDataFrame(
        [(0, -1), (7, -1), (9_000, 77)], "doc_id long, v long"
    )
    merge_table(src, table, "doc_id")  # v2: updates 0 and 7, inserts 9000
    delete_where(spark, table, ("doc_id", "<", 5))  # v3

    def brute(v_from, v_to):
        a = {r.doc_id: r.v for r in read_table(spark, table, version=v_from).collect()}
        b = {r.doc_id: r.v for r in read_table(spark, table, version=v_to).collect()}
        out = []
        for k in b.keys() - a.keys():
            out.append(("insert", k, b[k]))
        for k in a.keys() - b.keys():
            out.append(("delete", k, a[k]))
        for k in a.keys() & b.keys():
            if a[k] != b[k]:
                out.append(("update_preimage", k, a[k]))
                out.append(("update_postimage", k, b[k]))
        return sorted(out)

    for v_from, v_to in ((1, 2), (2, 3), (1, 3)):
        got = sorted(
            tuple(r)
            for r in table_changes(
                spark, table, v_from, v_to, "doc_id"
            ).collect()
        )
        assert got == brute(v_from, v_to), (v_from, v_to)
    # identical versions → empty feed
    assert table_changes(spark, table, 2, 2, "doc_id").count() == 0


# ---------------------------------------------------------------------------
# Incremental materialized-aggregate maintenance (round 11)


def _imv_table(spark, tmp_path):
    """Lifecycle fixture: v1 create → v2 merge (updates + a brand-new
    group) → v3 row delete → v4 append. Group 9 is crafted so the
    delete leaves it with only NULL measures (the companion-count
    payoff), group 5 so the delete removes it entirely."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        append_table,
        delete_where,
        merge_table,
    )

    rows = [(i, i % 3, None if i % 5 == 0 else i * 10) for i in range(20)]
    rows += [(200, 9, 50), (201, 9, None)]  # group 9: one value, one NULL
    rows += [(300, 5, 7)]  # group 5: a single row
    df = spark.createDataFrame(rows, "doc_id long, g long, x long")
    path = str(tmp_path / "imv")
    create_table(df.repartition(3), path)
    upd = spark.createDataFrame(
        [(1, 1, 999), (3, 0, None), (400, 7, 4), (401, 7, None)],
        "doc_id long, g long, x long",
    )
    merge_table(upd, path, "doc_id")  # v2: 2 updates + new group 7
    delete_where(spark, path, ("doc_id", "==", 200))  # v3: group 9 all-NULL
    delete_where(spark, path, ("doc_id", "==", 300))  # v4: group 5 dies
    append_table(
        spark.createDataFrame([(500, 1, -5), (501, 9, None)],
                              "doc_id long, g long, x long"),
        path,
    )  # v5
    return path


def _brute_rollup(spark, path, version):
    """Independent ground truth: pure-python rollup over the collected
    snapshot, with exact SQL SUM NULL semantics."""
    agg: dict[int, list] = {}
    for r in read_table(spark, path, version=version).collect():
        cnt, tot = agg.setdefault(r.g, [0, None])
        agg[r.g][0] = cnt + 1
        if r.x is not None:
            agg[r.g][1] = (tot or 0) + r.x
    return {g: (c, t) for g, (c, t) in agg.items()}


def test_refresh_aggregate_matches_full_recompute(spark, tmp_path):
    """GROUND_TRUTH_PIN for incremental_agg: rolling the state forward
    through the change feed equals a pure-python rollup of the target
    snapshot, for EVERY version pair across merge, delete, and append
    — including the pairs where a group is born, dies, or degrades to
    all-NULL measures."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        aggregate_state,
        present_aggregate,
        refresh_aggregate,
    )

    path = _imv_table(spark, tmp_path)
    sums = [("x", "sum_x")]
    for v_from in range(1, 6):
        state = aggregate_state(
            read_table(spark, path, version=v_from), ["g"], sums, "n"
        )
        for v_to in range(v_from + 1, 6):
            new_state = refresh_aggregate(
                spark, path, v_from, v_to, "doc_id", ["g"], sums,
                state=state, count_col="n",
            )
            got = {
                r.g: (r.n, r.sum_x)
                for r in present_aggregate(new_state, sums, "n").collect()
            }
            assert got == _brute_rollup(spark, path, v_to), (v_from, v_to)


def test_refresh_aggregate_chains_and_composite_agree(spark, tmp_path):
    """state(v1) → v2 → ... → v5 chained one hop at a time equals the
    composite v1→v5 refresh equals the ground truth — the return value
    is a valid state for the next hop."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        aggregate_state,
        present_aggregate,
        refresh_aggregate,
    )

    path = _imv_table(spark, tmp_path)
    sums = [("x", "sum_x")]
    chained = aggregate_state(
        read_table(spark, path, version=1), ["g"], sums, "n"
    )
    for v in range(1, 5):
        chained = refresh_aggregate(
            spark, path, v, v + 1, "doc_id", ["g"], sums,
            state=chained, count_col="n",
        )
    composite = refresh_aggregate(
        spark, path, 1, 5, "doc_id", ["g"], sums, count_col="n"
    )  # state omitted: computed from v1
    want = _brute_rollup(spark, path, 5)
    for state in (chained, composite):
        got = {
            r.g: (r.n, r.sum_x)
            for r in present_aggregate(state, sums, "n").collect()
        }
        assert got == want


def test_refresh_aggregate_group_lifecycle(spark, tmp_path):
    """Group 7 is BORN in v2's feed (no v1 state row), group 5 DIES in
    v4 (count reaches zero → dropped, not a zero-count ghost), and
    group 9's sum goes NULL in v3 (its only non-NULL measure was
    deleted) then stays NULL through v5's NULL-only append."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        present_aggregate,
        refresh_aggregate,
    )

    path = _imv_table(spark, tmp_path)
    sums = [("x", "sum_x")]

    def rolled(v_to):
        state = refresh_aggregate(
            spark, path, 1, v_to, "doc_id", ["g"], sums, count_col="n"
        )
        return {
            r.g: (r.n, r.sum_x)
            for r in present_aggregate(state, sums, "n").collect()
        }

    assert rolled(2)[7] == (2, 4)  # born: one value + one NULL
    assert 5 in rolled(3) and 5 not in rolled(4)  # dies at v4
    assert rolled(3)[9] == (1, None)  # all-NULL group: NULL, not 0
    assert rolled(5)[9] == (2, None)  # NULL-only append keeps it NULL


def test_aggregate_state_rejects_colliding_spec(spark):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        aggregate_state,
    )

    df = spark.createDataFrame([(1, 1)], "g long, x long")
    with pytest.raises(ValueError, match="collide"):
        aggregate_state(df, ["g"], [("x", "g")], "n")
    with pytest.raises(ValueError, match="companion"):
        aggregate_state(df, ["g"], [("x", "__nn_x")], "n")
    with pytest.raises(ValueError, match="at least one"):
        aggregate_state(df, [], [("x", "sum_x")], "n")


# ---------------------------------------------------------------------------
# Materialized views (round 11)


def test_materialized_view_lifecycle(spark, tmp_path):
    """create_view at base v1 → base advances through merge, delete,
    append → ONE composite sync catches up; read_view matches the
    pure-python rollup, the watermark tracks the base head, a
    redundant sync commits nothing, and view time travel still reads
    the v1-era rollup."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        append_table,
        create_view,
        delete_where,
        merge_table,
        read_view,
        sync_view,
        table_history,
        view_base_version,
    )

    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    rows = [(i, i % 3, None if i % 5 == 0 else i * 10) for i in range(20)]
    create_table(
        spark.createDataFrame(rows, "doc_id long, g long, x long"), base
    )
    assert create_view(
        spark, base, view, "doc_id", ["g"], [("x", "sum_x")], "n"
    ) == 1
    v1_truth = _brute_rollup(spark, base, 1)
    merge_table(
        spark.createDataFrame(
            [(1, 1, 999), (400, 7, 4)], "doc_id long, g long, x long"
        ),
        base, "doc_id",
    )
    delete_where(spark, base, ("doc_id", "<", 3))
    append_table(
        spark.createDataFrame([(500, 1, -5)], "doc_id long, g long, x long"),
        base,
    )
    assert sync_view(spark, view) == 4
    assert view_base_version(view) == 4

    def collect(df):
        return {r.g: (r.n, r.sum_x) for r in df.collect()}

    assert collect(read_view(spark, view)) == _brute_rollup(spark, base, 4)
    # redundant sync: watermark unchanged, no new view version
    n_versions = len(table_history(view))
    assert sync_view(spark, view) == 4
    assert len(table_history(view)) == n_versions
    # time travel: view v1 still reads the base-v1 rollup
    assert collect(read_view(spark, view, version=1)) == v1_truth


def test_materialized_view_rebuilds_after_base_vacuum(spark, tmp_path):
    """CDF retention expiring under the view (base vacuumed past the
    watermark) must not wedge sync: it falls back to a full head
    recompute and records the rebuild in the view history."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        create_view,
        merge_table,
        read_view,
        sync_view,
        table_history,
        vacuum_table,
    )

    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    create_table(_batch(spark, 0, 30), base)
    create_view(spark, base, view, "doc_id", ["v"], [("doc_id", "s")], "n")
    merge_table(
        spark.createDataFrame([(0, -1), (999, 42)], "doc_id long, v long"),
        base, "doc_id",
    )
    vacuum_table(base, keep_last=1)  # v1 manifest (the watermark) is gone
    assert sync_view(spark, view) == 2
    assert table_history(view)[-1]["op"] == "view_rebuild@base_v2"
    got = {(r.v): (r.n, r.s) for r in read_view(spark, view).collect()}
    want: dict = {}
    for r in read_table(spark, base).collect():
        c, t = want.setdefault(r.v, [0, None])
        want[r.v][0] = c + 1
        want[r.v][1] = (t or 0) + r.doc_id
    assert got == {k: tuple(v) for k, v in want.items()}


def test_materialized_view_null_sum_survives_persistence(spark, tmp_path):
    """The companion counts are persisted with the state, so a group
    whose only non-NULL measure is deleted AFTER the view was created
    presents as NULL (not 0) when read back from parquet."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        create_view,
        delete_where,
        read_view,
        sync_view,
    )

    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    create_table(
        spark.createDataFrame(
            [(1, 9, 50), (2, 9, None)], "doc_id long, g long, x long"
        ),
        base,
    )
    create_view(spark, base, view, "doc_id", ["g"], [("x", "sum_x")], "n")
    delete_where(spark, base, ("doc_id", "==", 1))
    sync_view(spark, view)
    [row] = read_view(spark, view).collect()
    assert (row.g, row.n, row.sum_x) == (9, 1, None)


def test_materialized_view_guards(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        create_view,
        read_view,
        sync_view,
    )

    base = str(tmp_path / "base")
    create_table(_batch(spark, 0, 5), base)
    view = str(tmp_path / "view")
    create_view(spark, base, view, "doc_id", ["v"], [("doc_id", "s")], "n")
    with pytest.raises(FileExistsError):
        create_view(spark, base, view, "doc_id", ["v"], [("doc_id", "s")], "n")
    with pytest.raises(FileNotFoundError):
        sync_view(spark, str(tmp_path / "nothere"))
    with pytest.raises(FileNotFoundError):
        read_view(spark, str(tmp_path / "nothere"))


def test_change_feed_and_refresh_read_only_exclusive_files(spark, tmp_path):
    """The scale claim behind the change feed and the view sync: a
    merge touching one of four range files must leave the three
    carried files entirely out of the feed's (and the refresh's) scan
    set — verified from the executed plan's inputFiles, not the
    manifest bookkeeping."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _load_manifest,
        merge_table,
        refresh_aggregate,
        table_changes,
    )

    path = str(tmp_path / "xfiles")
    create_table(_ranged(spark, 400, 4), path)
    v1_files = set(_load_manifest(path, 1)["files"])
    merge_table(
        spark.createDataFrame([(i, 111) for i in range(10)],
                              "doc_id long, v long"),
        path, "doc_id",
    )
    v2_files = set(_load_manifest(path, 2)["files"])
    carried = {f.rsplit("/", 1)[1] for f in v1_files & v2_files}
    assert len(carried) == 3

    def scanned(df):
        return {f.rsplit("/", 1)[1] for f in df.inputFiles()}

    feed_scan = scanned(table_changes(spark, path, 1, 2, "doc_id"))
    assert not feed_scan & carried, feed_scan & carried
    # a refresh from a PROVIDED state likewise touches no carried file
    state = spark.createDataFrame(
        [(0, 100, 0, 100), (1, 100, 100, 100)],
        "v long, n long, sum_d long, __nn_sum_d long",
    )
    refreshed = refresh_aggregate(
        spark, path, 1, 2, "doc_id", ["v"], [("doc_id", "sum_d")],
        state=state, count_col="n",
    )
    assert not scanned(refreshed) & carried


def test_streamed_base_then_view_sync_matches_batch(spark, tmp_path):
    """Stream-to-batch parity for maintained views: micro-batches
    committed to the base via stream_to_table (one version per batch),
    the view synced AFTER the stream (one composite multi-version
    catch-up), equals the batch rollup of everything streamed."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        create_view,
        read_view,
        stream_to_table,
        sync_view,
        view_base_version,
    )

    base = str(tmp_path / "sbase")
    view = str(tmp_path / "sview")
    create_table(
        spark.range(10).select(
            F.col("id").alias("doc_id"), (F.col("id") % 3).alias("v")
        ),
        base,
    )
    create_view(spark, base, view, "doc_id", ["v"], [("doc_id", "s")], "n")
    # three parquet files → three micro-batches → base v2..v4
    feed = str(tmp_path / "feed")
    for i in range(3):
        spark.range(100 + i * 20, 120 + i * 20).select(
            F.col("id").alias("doc_id"), (F.col("id") % 3).alias("v")
        ).coalesce(1).write.mode("append").parquet(feed)
    src = (
        spark.readStream.schema("doc_id long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = stream_to_table(src, base, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert view_base_version(view) == 1
    synced = sync_view(spark, view)
    assert synced == 4  # create + 3 streamed appends
    got = {r.v: (r.n, r.s) for r in read_view(spark, view).collect()}
    want: dict = {}
    for r in read_table(spark, base).collect():
        c, t = want.setdefault(r.v, [0, None])
        want[r.v][0] = c + 1
        want[r.v][1] = (t or 0) + r.doc_id
    assert got == {k: tuple(v) for k, v in want.items()}


# ---------------------------------------------------------------------------
# merge_table delete arm (round 11)


def test_merge_delete_arm_mixed_changeset(spark, table):
    """One merge applies inserts, updates, and deletes atomically:
    delete rows drop their matched keys, NULL flags mean upsert, and
    an unmatched delete is a no-op (the Delta whenMatchedDelete
    contract)."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        merge_table,
    )

    src = spark.createDataFrame(
        [
            (0, -1, False),    # update
            (200, 7, None),    # insert (NULL flag = upsert)
            (1, None, True),   # delete existing
            (9999, None, True),  # delete absent: no-op
        ],
        "doc_id long, v long, gone boolean",
    )
    merge_table(src, table, "doc_id", delete_col="gone")
    rows = {r.doc_id: r.v for r in read_table(spark, table).collect()}
    assert rows[0] == -1 and rows[200] == 7
    assert 1 not in rows and 9999 not in rows
    assert len(rows) == 100  # 100 - deleted 1 + inserted 200
    # time travel: v1 still has doc 1
    assert 1 in {r.doc_id for r in read_table(spark, table, version=1).collect()}


def test_merge_delete_only_changeset(spark, table):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        merge_table,
    )

    src = spark.createDataFrame(
        [(i, None, True) for i in range(5)], "doc_id long, v long, gone boolean"
    )
    merge_table(src, table, "doc_id", delete_col="gone")
    ids = {r.doc_id for r in read_table(spark, table).collect()}
    assert ids == set(range(5, 100))


def test_merge_delete_col_guards(spark, table):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        merge_table,
    )

    src = spark.createDataFrame([(0, 1, True)], "doc_id long, v long, x boolean")
    with pytest.raises(ValueError, match="not a column"):
        merge_table(src, table, "doc_id", delete_col="nope")
    # flag name colliding with a TABLE column is rejected
    bad = spark.createDataFrame([(0, True)], "doc_id long, v boolean")
    with pytest.raises(ValueError, match="collides"):
        merge_table(bad, table, "doc_id", delete_col="v")


def test_merge_op_label_brands_history(spark, table):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        merge_table,
    )

    merge_table(
        spark.createDataFrame([(0, -1)], "doc_id long, v long"),
        table, "doc_id", op_label="cdc_apply@42",
    )
    assert table_history(table)[-1]["op"] == "cdc_apply@42"


def test_view_survives_own_compaction(spark, tmp_path):
    """Same contract as the index: compacting the VIEW's postings-table
    storage is watermark-transparent and the next sync still lands on
    ground truth."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        create_view,
        merge_table,
        read_view,
        sync_view,
        view_base_version,
    )

    base = str(tmp_path / "cbase")
    view = str(tmp_path / "cview")
    create_table(_batch(spark, 0, 40), base)
    create_view(spark, base, view, "doc_id", ["v"], [("doc_id", "s")], "n")
    compact_table(spark, view, target_mb=128)
    assert view_base_version(view) == 1  # reads through the compact
    merge_table(
        spark.createDataFrame([(0, -1), (500, 9)], "doc_id long, v long"),
        base, "doc_id",
    )
    assert sync_view(spark, view) == 2
    got = {r.v: (r.n, r.s) for r in read_view(spark, view).collect()}
    want: dict = {}
    for r in read_table(spark, base).collect():
        c, t = want.setdefault(r.v, [0, None])
        want[r.v][0] = c + 1
        want[r.v][1] = (t or 0) + r.doc_id
    assert got == {k: tuple(v) for k, v in want.items()}


def test_stream_merge_with_tombstones(spark, tmp_path):
    """Debezium-shaped CDC feed: three micro-batches of mixed upserts
    and delete tombstones, one atomic version per batch, final table
    equals the hand-applied changelog."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        stream_merge_to_table,
    )

    feed = str(tmp_path / "cdc")
    batches = [
        [(1, 10, False), (2, 20, False), (3, 30, False)],   # inserts
        [(2, 21, False), (3, None, True), (4, 40, False)],  # upd/del/ins
        [(1, None, True), (4, 41, False), (9, None, True)], # del/upd/noop-del
    ]
    import time as _time

    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "doc_id long, v long, deleted boolean"
        ).coalesce(1).write.mode("append").parquet(feed)
        _time.sleep(0.05)  # deterministic file-source batch order
    src = (
        spark.readStream.schema("doc_id long, v long, deleted boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    tbl = str(tmp_path / "cdctbl")
    q = stream_merge_to_table(
        src, tbl, str(tmp_path / "ckpt"), "doc_id", delete_col="deleted"
    )
    q.awaitTermination()
    rows = {r.doc_id: r.v for r in read_table(spark, tbl).collect()}
    assert rows == {2: 21, 4: 41}
    assert "deleted" not in read_table(spark, tbl).columns
    # three versions, each atomic
    assert len(table_history(tbl)) == 3


# ---------------------------------------------------------------------------
# Merge-on-read equality deletes (round 11)


def test_mor_delete_basics_and_sequence_rule(spark, table):
    """delete_rows commits a sidecar, data files carry unchanged;
    readers subtract matching rows; time travel still reads the
    pre-delete version; and a key re-upserted AFTER its deletion is
    visible again (the sidecar masks only files with a LOWER
    sequence — Iceberg's rule)."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _load_manifest,
        delete_rows,
        merge_table,
    )

    v1_files = _load_manifest(table, 1)["files"]
    delete_rows(
        spark, table,
        spark.createDataFrame([(3,), (7,), (15,)], "doc_id long"),
        "doc_id",
    )
    man2 = _load_manifest(table, 2)
    assert man2["files"] == v1_files  # zero data files rewritten
    assert len(man2["delete_files"]) == 1
    ids = {r.doc_id for r in read_table(spark, table).collect()}
    assert ids == set(range(100)) - {3, 7, 15}
    assert read_table(spark, table, version=1).count() == 100
    merge_table(
        spark.createDataFrame([(7, -7)], "doc_id long, v long"),
        table, "doc_id",
    )
    d = {r.doc_id: r.v for r in read_table(spark, table).collect()}
    assert d[7] == -7 and 3 not in d and 15 not in d


def test_mor_delete_guards(spark, table):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_rows,
    )

    with pytest.raises(ValueError, match="not a table column"):
        delete_rows(
            spark, table, spark.createDataFrame([(1,)], "nope long"), "nope"
        )
    with pytest.raises(ValueError, match="empty"):
        delete_rows(
            spark, table, spark.createDataFrame([], "doc_id long"), "doc_id"
        )
    with pytest.raises(ValueError, match="non-null"):
        delete_rows(
            spark, table,
            spark.createDataFrame([(None,)], "doc_id long"), "doc_id",
        )


def test_mor_delete_then_append_and_cow_delete(spark, table):
    """Masks compose with later appends (appended rows with a deleted
    key value are NEWER than the sidecar → visible) and with a later
    copy-on-write delete_where (which reads through the masks when
    rewriting)."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_rows,
        delete_where,
    )

    delete_rows(
        spark, table,
        spark.createDataFrame([(10,), (11,), (90,)], "doc_id long"),
        "doc_id",
    )
    append_table(_batch(spark, 10, 2), table)  # re-adds 10, 11 (newer seq)
    ids = {r.doc_id for r in read_table(spark, table).collect()}
    assert 10 in ids and 11 in ids and 90 not in ids
    delete_where(spark, table, ("doc_id", ">=", 95))
    ids = {r.doc_id for r in read_table(spark, table).collect()}
    assert ids == (set(range(95)) - {90}) | {10, 11}
    # the COW rewrite materialized the masks for the files it touched,
    # and the sidecar still masks 90 in its untouched file
    assert read_table(spark, table, version=2).count() == 97


def test_mor_cdf_matches_brute_across_all_version_pairs(spark, table):
    """GROUND_TRUTH extension: the change feed over a lifecycle that
    mixes COW merge, MOR delete (incl. a double-delete of the same
    key), a re-insert of a deleted key, a COW delete, and a RESTORE
    over the MOR deletes (sidecars REMOVED in-window must re-emit the
    reappearing rows — advice r11) equals the brute two-snapshot diff
    for EVERY version pair."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_rows,
        delete_where,
        merge_table,
        restore_table,
        table_changes,
    )

    merge_table(
        spark.createDataFrame([(0, -1), (777, 9)], "doc_id long, v long"),
        table, "doc_id",
    )  # v2: update 0, insert 777
    delete_rows(
        spark, table,
        spark.createDataFrame([(5,), (6,), (777,)], "doc_id long"),
        "doc_id",
    )  # v3: MOR delete (incl. a row born in v2's files)
    delete_rows(
        spark, table,
        spark.createDataFrame([(6,), (40,)], "doc_id long"),
        "doc_id",
    )  # v4: second sidecar, re-deleting 6 (already masked)
    merge_table(
        spark.createDataFrame([(5, 55)], "doc_id long, v long"),
        table, "doc_id",
    )  # v5: re-insert a MOR-deleted key
    delete_where(spark, table, ("doc_id", "<", 2))  # v6: COW delete
    restore_table(table, 2)  # v7: drops BOTH sidecars — 5/6/40/777
    #                          reappear (and v5/v6's changes undo)
    delete_rows(
        spark, table,
        spark.createDataFrame([(7,)], "doc_id long"),
        "doc_id",
    )  # v8: a fresh sidecar AFTER the restore (add+remove mixes)

    def brute(v_from, v_to):
        a = {r.doc_id: r.v for r in read_table(spark, table, version=v_from).collect()}
        b = {r.doc_id: r.v for r in read_table(spark, table, version=v_to).collect()}
        out = []
        for k in b.keys() - a.keys():
            out.append(("insert", k, b[k]))
        for k in a.keys() - b.keys():
            out.append(("delete", k, a[k]))
        for k in a.keys() & b.keys():
            if a[k] != b[k]:
                out.append(("update_preimage", k, a[k]))
                out.append(("update_postimage", k, b[k]))
        return sorted(out)

    for v_from in range(1, 9):
        for v_to in range(v_from, 9):
            got = sorted(
                tuple(r)
                for r in table_changes(
                    spark, table, v_from, v_to, "doc_id"
                ).collect()
            )
            assert got == brute(v_from, v_to), (v_from, v_to, got)


def test_mor_refresh_and_view_ride_the_masked_feed(spark, tmp_path):
    """The rollup refresh and the materialized view consume MOR
    deletes through the same feed — no special casing."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        create_view,
        delete_rows,
        read_view,
        sync_view,
    )

    base = str(tmp_path / "morb")
    view = str(tmp_path / "morv")
    create_table(
        spark.range(30).select(
            F.col("id").alias("doc_id"), (F.col("id") % 3).alias("g"),
            F.col("id").alias("x"),
        ).repartitionByRange(3, "doc_id"),
        base,
    )
    create_view(spark, base, view, "doc_id", ["g"], [("x", "sum_x")], "n")
    delete_rows(
        spark, base,
        spark.createDataFrame([(0,), (3,), (29,)], "doc_id long"),
        "doc_id",
    )
    assert sync_view(spark, view) == 2
    got = {r.g: (r.n, r.sum_x) for r in read_view(spark, view).collect()}
    want: dict = {}
    for r in read_table(spark, base).collect():
        c, t = want.setdefault(r.g, [0, None])
        want[r.g][0] = c + 1
        want[r.g][1] = (t or 0) + r.x
    assert got == {k: tuple(v) for k, v in want.items()}


def test_rowcount_from_manifest_metadata(spark, table):
    """round 12, the Iceberg record_count shape: COUNT(*) answered
    from footer counts in the manifest — zero data I/O — exact across
    append/merge/time-travel, failing CLOSED under merge-on-read
    masks (footer counts cannot see masked rows)."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_rows,
        merge_table,
        table_rowcount,
    )

    assert table_rowcount(table) == 100
    append_table(_batch(spark, 100, 50), table)
    assert table_rowcount(table) == 150
    merge_table(
        spark.createDataFrame([(1, -1), (999, 9)], "doc_id long, v long"),
        table, "doc_id",
    )  # update + insert
    assert table_rowcount(table) == 151
    assert table_rowcount(table, version=1) == 100  # time travel
    assert table_rowcount(table) == read_table(spark, table).count()
    delete_rows(
        spark, table, spark.createDataFrame([(5,)], "doc_id long"), "doc_id"
    )
    with pytest.raises(ValueError, match="masked rows"):
        table_rowcount(table)
    # pre-mask versions still answer from metadata
    assert table_rowcount(table, version=3) == 151


def test_time_travel_by_timestamp(spark, table):
    """round 12, the Delta timestampAsOf shape: resolve to the newest
    retained version committed at or before the timestamp; datetime /
    ISO-string inputs accepted (naive = UTC); pre-history timestamps
    and version+timestamp together are rejected."""
    import datetime

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        version_at_timestamp,
    )

    append_table(_batch(spark, 100, 50), table)
    append_table(_batch(spark, 150, 25), table)
    hist = {h["version"]: h["committed_at"] for h in table_history(table)}
    # exactly at v2's commit → v2; just before it → v1; far future → head
    assert version_at_timestamp(table, hist[2]) == 2
    assert version_at_timestamp(table, hist[2] - 1e-4) == 1
    assert version_at_timestamp(table, hist[3] + 9999) == 3
    assert read_table(spark, table, timestamp=hist[2]).count() == 150
    # datetime and ISO-string forms resolve identically — probed
    # MID-GAP between v2 and v3, because datetime round-trips at
    # microsecond resolution and a boundary-exact float can round
    # below the commit instant (flaked once in a full sweep)
    mid = (hist[2] + hist[3]) / 2
    dt = datetime.datetime.fromtimestamp(mid, datetime.timezone.utc)
    assert version_at_timestamp(table, dt) == 2
    assert version_at_timestamp(table, dt.isoformat()) == 2
    with pytest.raises(FileNotFoundError, match="at or before"):
        version_at_timestamp(table, hist[1] - 10)
    with pytest.raises(ValueError, match="not both"):
        read_table(spark, table, version=1, timestamp=hist[2])


def test_merge_evolve_adds_columns_additively(spark, table):
    """round 12, the Delta MERGE autoMerge shape: an evolving CDC feed
    may carry a NEW column under evolve=True (older rows read null
    there, survivors of rewritten files included); without the flag
    the extra column is rejected, and a type change always is."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        merge_table,
    )

    wider = spark.createDataFrame(
        [(3, -1, "eu"), (777, 9, "us")], "doc_id long, v long, region string"
    )
    with pytest.raises(ValueError):
        merge_table(wider, table, "doc_id")  # not without the flag
    merge_table(wider, table, "doc_id", evolve=True)
    got = {r.doc_id: (r.v, r.region) for r in read_table(spark, table).collect()}
    assert got[3] == (-1, "eu") and got[777] == (9, "us")
    assert got[0] == (0, None) and len(got) == 101  # old rows: null
    # a later plain merge against the evolved schema still subsets
    merge_table(
        spark.createDataFrame([(5, -5)], "doc_id long, v long"),
        table, "doc_id",
    )
    got = {r.doc_id: (r.v, r.region) for r in read_table(spark, table).collect()}
    assert got[5] == (-5, None) and got[3] == (-1, "eu")
    # type change: rejected even under evolve
    bad = spark.createDataFrame([(1, "oops")], "doc_id long, v string")
    with pytest.raises(ValueError):
        merge_table(bad, table, "doc_id", evolve=True)


def test_recorded_cluster_spec_survives_every_rewrite(spark, tmp_path):
    """create_table(cluster_by=...) records the layout as a TABLE
    property: merges (no param), compaction, overwrite, and clones
    all re-cluster automatically, so file-range pruning keeps biting
    after any rewrite — no caller has to remember the option."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        clone_table,
        files_scanned,
        merge_table,
    )

    path = str(tmp_path / "clustered")
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(8)  # deliberately hash-partitioned input
    create_table(df, path, cluster_by=["k"])
    total = files_scanned(path)

    def pruned(p, val):
        return files_scanned(p, prune=("k", "==", val))

    assert total > 1 and pruned(path, 5) < total  # create clustered it
    # a scattered merge (every file hit) with NO cluster_by param
    upd = spark.range(10).select(
        (F.col("id") * 100).alias("k"), F.lit(-1).cast("long").alias("v")
    )
    merge_table(upd, path, "k")
    assert pruned(path, 5) < files_scanned(path)
    # compaction re-clusters instead of gluing arbitrary neighbors
    compact_table(spark, path, target_mb=1)
    got = {r.k: r.v for r in read_table(spark, path).collect()}
    assert got[500] == -1 and got[5] == 10 and len(got) == 1000
    # overwrite re-clusters the replacement
    overwrite_table(
        spark.range(400).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        ).repartition(4),
        path,
    )
    assert pruned(path, 5) < files_scanned(path) or files_scanned(path) == 1
    # a clone carries the spec: its own merges stay clustered
    dst = str(tmp_path / "fork")
    clone_table(path, dst)
    merge_table(
        spark.range(5).select(
            (F.col("id") * 80).alias("k"),
            F.lit(-2).cast("long").alias("v"),
        ),
        dst, "k",
    )
    assert pruned(dst, 3) < files_scanned(dst) or files_scanned(dst) == 1
    # explicit [] opts a single merge out of re-clustering
    merge_table(upd.limit(1), path, "k", cluster_by=[])


def test_cluster_spec_is_not_permanent(spark, tmp_path):
    """Advice r12 (medium): the recorded cluster_by spec must follow
    the table through schema changes, not wedge them. Overwriting with
    a schema that drops the clustered column succeeds and RESETS the
    spec; cluster_by=[] clears it explicitly; cluster_by=[...]
    re-records a new spec; and a failed clustered create leaves no
    _table.json behind to poison a later create at the same path."""
    import pytest

    from optimal_parallel_fp_growth_spark.sources import versioned as V

    path = str(tmp_path / "t")
    create_table(
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        path,
        cluster_by=["k"],
    )
    assert V._table_spec(path).get("cluster_by") == ["k"]
    # replacement drops the clustered column entirely: the overwrite
    # (_check_schema's own recommended schema-change path) must succeed
    # and reset the spec so later rewrites don't chase a ghost column
    overwrite_table(
        spark.range(50).select(
            F.col("id").alias("pk"), F.lit("x").alias("payload")
        ),
        path,
    )
    assert "cluster_by" not in V._table_spec(path)
    # later merges on the new schema work without any cluster option
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        merge_table,
    )

    merge_table(
        spark.range(5).select(
            F.col("id").alias("pk"),
            F.lit("y").alias("payload"),
        ),
        path,
        "pk",
    )
    assert read_table(spark, path).where("payload = 'y'").count() == 5
    # re-record a spec with the rewrite...
    overwrite_table(
        spark.range(60).select(
            F.col("id").alias("pk"), F.lit("z").alias("payload")
        ).repartition(4),
        path,
        cluster_by=["pk"],
    )
    assert V._table_spec(path).get("cluster_by") == ["pk"]
    # ...and clear it explicitly
    overwrite_table(
        spark.range(10).select(
            F.col("id").alias("pk"), F.lit("w").alias("payload")
        ),
        path,
        cluster_by=[],
    )
    assert "cluster_by" not in V._table_spec(path)

    # a failed clustered create must not leave a stale spec (the
    # write-data step dies mid-create), and the debris must not poison
    # the retry either way
    broken = str(tmp_path / "broken")
    real_write = V._write_data_and_stats

    def boom(*a, **k):
        raise RuntimeError("disk full")

    V._write_data_and_stats = boom
    try:
        with pytest.raises(RuntimeError, match="disk full"):
            create_table(
                spark.range(10).select(F.col("id").alias("k")),
                broken,
                cluster_by=["k"],
            )
    finally:
        V._write_data_and_stats = real_write
    import pathlib

    assert not (pathlib.Path(broken) / "_table.json").exists()
    # retry WITHOUT clustering: no spec may appear
    create_table(spark.range(10).select(F.col("id").alias("k")), broken)
    assert "cluster_by" not in V._table_spec(broken)


def test_stream_follow_builds_replica_across_full_lifecycle(
    spark, tmp_path
):
    """VERDICT r11 task #5: stream-vs-batch agreement. Follow a
    multi-commit lifecycle — COW merge, MOR delete, RESTORE over the
    delete, post-restore merge — one micro-batch per commit into a
    replica table; the replica must equal the base snapshot at EVERY
    stop, and the checkpoint cursor must make the follow incremental
    and restart-safe."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_rows,
        merge_table,
        restore_table,
        stream_changes_to_table,
        table_history,
    )

    base = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    create_table(_batch(spark, 0, 20).repartitionByRange(4, "doc_id"), base)

    def snap(path):
        return {(r.doc_id, r.v) for r in read_table(spark, path).collect()}

    # initial load: v1 arrives as a synthetic all-inserts batch
    assert stream_changes_to_table(spark, base, dst, "doc_id", ckpt) == 1
    assert snap(dst) == snap(base)
    # caught up: zero batches, no replica commit
    assert stream_changes_to_table(spark, base, dst, "doc_id", ckpt) == 0
    n_dst = len(table_history(dst))

    merge_table(
        spark.createDataFrame([(3, -1), (777, 9)], "doc_id long, v long"),
        base, "doc_id",
    )  # v2
    delete_rows(
        spark, base,
        spark.createDataFrame([(5,), (777,)], "doc_id long"), "doc_id",
    )  # v3: MOR sidecar
    assert stream_changes_to_table(spark, base, dst, "doc_id", ckpt) == 2
    assert snap(dst) == snap(base)
    # one replica version per source commit
    assert len(table_history(dst)) == n_dst + 2

    restore_table(base, 2)  # v4: sidecar removed — 5 and 777 reappear
    merge_table(
        spark.createDataFrame([(5, 55)], "doc_id long, v long"),
        base, "doc_id",
    )  # v5
    assert stream_changes_to_table(spark, base, dst, "doc_id", ckpt) == 2
    assert snap(dst) == snap(base)
    assert (5, 55) in snap(dst) and (777, 9) in snap(dst)


def test_stream_follow_at_least_once_retry_is_idempotent(spark, tmp_path):
    """A crash between apply and cursor advance re-applies the batch;
    the keyed merge makes that a no-op on the replica state."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _advance_cursor,
        _read_cursor,
        merge_table,
        stream_changes_to_table,
    )

    base = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    create_table(_batch(spark, 0, 10), base)
    merge_table(
        spark.createDataFrame([(1, -7)], "doc_id long, v long"),
        base, "doc_id",
    )
    assert stream_changes_to_table(spark, base, dst, "doc_id", ckpt) == 2
    want = {(r.doc_id, r.v) for r in read_table(spark, dst).collect()}
    # simulate the crash: roll the cursor back one commit and re-drain
    assert _read_cursor(ckpt) == 2
    _advance_cursor(ckpt, 1)
    assert stream_changes_to_table(spark, base, dst, "doc_id", ckpt) == 1
    got = {(r.doc_id, r.v) for r in read_table(spark, dst).collect()}
    assert got == want


def test_stream_follow_from_version_seeds_fresh_checkpoint(
    spark, tmp_path
):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        stream_table_changes,
    )

    base = str(tmp_path / "src")
    create_table(_batch(spark, 0, 10), base)
    append_table(_batch(spark, 10, 5), base)
    seen: list[tuple[int, set]] = []

    def collect(batch, version):
        seen.append(
            (version, {(r._change_type, r.doc_id) for r in batch.collect()})
        )

    # from_version=1: the initial snapshot is NOT replayed
    n = stream_table_changes(
        spark, base, "doc_id", str(tmp_path / "c1"), collect, from_version=1
    )
    assert n == 1 and seen[0][0] == 2
    assert seen[0][1] == {("insert", i) for i in range(10, 15)}
    with pytest.raises(FileNotFoundError):
        stream_table_changes(
            spark, base, "doc_id", str(tmp_path / "c2"), collect,
            from_version=99,
        )


def test_stream_follow_names_vacuumed_cursor(spark, tmp_path):
    """A follower that lagged past retention must get the named
    condition (rebuild from fresh checkpoint / raise keep_last), not
    a raw missing-manifest error."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        merge_table,
        stream_changes_to_table,
    )

    base = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    create_table(_batch(spark, 0, 10), base)
    assert stream_changes_to_table(spark, base, dst, "doc_id", ckpt) == 1
    merge_table(
        spark.createDataFrame([(1, -1)], "doc_id long, v long"),
        base, "doc_id",
    )
    merge_table(
        spark.createDataFrame([(2, -2)], "doc_id long, v long"),
        base, "doc_id",
    )
    vacuum_table(base, keep_last=1)  # cursor v1 manifest expired
    with pytest.raises(FileNotFoundError, match="lagged past retention"):
        stream_changes_to_table(spark, base, dst, "doc_id", ckpt)


def test_view_sync_reconverges_across_restore_over_mor_delete(
    spark, tmp_path
):
    """Advice r11 (high): a restore to a pre-delete version REMOVES
    sidecars, so the reappearing rows must flow through the feed —
    otherwise a view that synced past the delete diverges forever."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        create_view,
        delete_rows,
        read_view,
        restore_table,
        sync_view,
    )

    base = str(tmp_path / "resb")
    view = str(tmp_path / "resv")
    create_table(
        spark.range(30).select(
            F.col("id").alias("doc_id"), (F.col("id") % 3).alias("g"),
            F.col("id").alias("x"),
        ).repartitionByRange(3, "doc_id"),
        base,
    )
    create_view(spark, base, view, "doc_id", ["g"], [("x", "sum_x")], "n")
    delete_rows(
        spark, base,
        spark.createDataFrame([(0,), (3,), (29,)], "doc_id long"),
        "doc_id",
    )
    assert sync_view(spark, view) == 2  # view state excludes 0/3/29
    restore_table(base, 1)  # v3: the sidecar is gone, rows reappear
    assert sync_view(spark, view) == 3
    got = {r.g: (r.n, r.sum_x) for r in read_view(spark, view).collect()}
    assert got == {0: (10, 135), 1: (10, 145), 2: (10, 155)}


def test_mor_vacuum_keeps_live_sidecars(spark, table):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_rows,
    )

    delete_rows(
        spark, table, spark.createDataFrame([(1,)], "doc_id long"), "doc_id"
    )
    append_table(_batch(spark, 100, 5), table)
    vacuum_table(table, keep_last=1)
    ids = {r.doc_id for r in read_table(spark, table).collect()}
    assert 1 not in ids and 104 in ids  # sidecar survived the vacuum
    # expire everything before the sidecar-referencing manifest too
    assert read_table(spark, table).count() == 104


def test_restore_rolls_back_without_rewriting(spark, table):
    """RESTORE commits version N's manifest as the new head — no data
    written, undone versions still readable, CDF across the restore
    nets out the undone changes, and later writes compose."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _load_manifest,
        merge_table,
        restore_table,
        table_changes,
    )

    merge_table(
        spark.createDataFrame([(0, -1), (500, 5)], "doc_id long, v long"),
        table, "doc_id",
    )  # v2: the "mistake"
    assert restore_table(table, 1) == 3
    assert _load_manifest(table, 3)["files"] == _load_manifest(table, 1)["files"]
    assert {r.doc_id: r.v for r in read_table(spark, table).collect()} == {
        i: i * 2 for i in range(100)
    }
    assert read_table(spark, table, version=2).count() == 101  # forensics
    # CDF v1→v3 nets to nothing; v2→v3 undoes the mistake
    assert table_changes(spark, table, 1, 3, "doc_id").count() == 0
    got = sorted(
        tuple(r) for r in table_changes(spark, table, 2, 3, "doc_id").collect()
    )
    assert got == [
        ("delete", 500, 5),
        ("update_postimage", 0, 0),
        ("update_preimage", 0, -1),
    ]
    # later writes continue from the restored state
    append_table(_batch(spark, 900, 3), table)
    assert read_table(spark, table).count() == 103


def test_restore_carries_mor_sidecars(spark, table):
    """Restoring to a version that carried delete sidecars restores
    the MASKS too; restoring to the pre-delete version unmasks."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_rows,
        restore_table,
    )

    delete_rows(
        spark, table, spark.createDataFrame([(5,)], "doc_id long"), "doc_id"
    )  # v2
    append_table(_batch(spark, 200, 2), table)  # v3
    restore_table(table, 2)  # v4: masked, without the append
    ids = {r.doc_id for r in read_table(spark, table).collect()}
    assert 5 not in ids and 200 not in ids and len(ids) == 99
    restore_table(table, 1)  # v5: pre-delete
    assert read_table(spark, table).count() == 100
    with pytest.raises(FileNotFoundError):
        restore_table(table, 99)


# ---------------------------------------------------------------------------
# CLONE (round 11)


def test_deep_clone_forks_with_masks_and_diverges(spark, table, tmp_path):
    """Deep clone at the head: same rows INCLUDING merge-on-read mask
    state (sequence semantics preserved by keeping original paths);
    afterwards the two tables diverge independently."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        clone_table,
        delete_rows,
        merge_table,
    )

    delete_rows(
        spark, table, spark.createDataFrame([(5,), (9,)], "doc_id long"),
        "doc_id",
    )
    merge_table(
        spark.createDataFrame([(9, -9)], "doc_id long, v long"),
        table, "doc_id",
    )  # re-insert 9: newer seq beats the sidecar
    dst = str(tmp_path / "fork")
    assert clone_table(table, dst) == 3
    src_rows = {r.doc_id: r.v for r in read_table(spark, table).collect()}
    assert {r.doc_id: r.v for r in read_table(spark, dst).collect()} == src_rows
    assert 5 not in src_rows and src_rows[9] == -9
    # divergence: a write to the clone never shows in the source
    append_table(_batch(spark, 700, 2), dst)
    assert read_table(spark, dst).count() == len(src_rows) + 2
    assert read_table(spark, table).count() == len(src_rows)
    with pytest.raises(FileExistsError):
        clone_table(table, dst)


def test_deep_clone_of_historical_version(spark, table, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        clone_table,
    )

    append_table(_batch(spark, 100, 10), table)
    dst = str(tmp_path / "histfork")
    assert clone_table(table, dst, version=1) == 1
    assert read_table(spark, dst).count() == 100


def test_shallow_clone_zero_copy_and_vacuum_safety(spark, table, tmp_path):
    """Shallow clone copies nothing; the clone's vacuum can never
    delete source files, and writes to the clone land in its own
    root."""
    import pathlib

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        clone_table,
        merge_table,
    )

    dst = str(tmp_path / "shallow")
    clone_table(table, dst, shallow=True)
    # nothing copied: the clone's data root holds no parquet yet
    assert not list((pathlib.Path(dst) / "data").rglob("*.parquet"))
    assert read_table(spark, dst).count() == 100
    merge_table(
        spark.createDataFrame([(0, -1)], "doc_id long, v long"),
        dst, "doc_id",
    )
    assert {r.v for r in read_table(spark, dst).where(F.col("doc_id") == 0).collect()} == {-1}
    assert {r.v for r in read_table(spark, table).where(F.col("doc_id") == 0).collect()} == {0}
    vacuum_table(dst, keep_last=1)
    # source files survived the clone's vacuum
    assert read_table(spark, table).count() == 100


def test_source_vacuum_refuses_while_shallow_clone_pins_files(
    spark, table, tmp_path
):
    """VERDICT r11 task #6: a source vacuum that would delete files a
    live shallow clone references must refuse (or require force) —
    the hazard was previously only a docstring."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        clone_table,
        overwrite_table,
    )

    dst = str(tmp_path / "pinning")
    clone_table(table, dst, shallow=True)
    # the overwrite strands v1's files from the SOURCE's perspective,
    # but the clone still reads them by absolute path
    overwrite_table(_batch(spark, 500, 10), table)
    with pytest.raises(ValueError, match="shallow clone"):
        vacuum_table(table, keep_last=1)
    # refusal deleted nothing: both tables still read
    assert read_table(spark, dst).count() == 100
    assert read_table(spark, table).count() == 10
    # force overrides the guard (the caller accepts clone corruption)
    assert vacuum_table(table, keep_last=1, force=True) > 0
    assert read_table(spark, table).count() == 10


def test_clone_registry_is_per_clone_and_crash_safe(spark, table, tmp_path):
    """Advice r12 (low): the registry must never lose a registration
    to a concurrent writer. One exclusive-create file per clone means
    registering clone B can never rewrite (and drop) clone A's entry,
    pruning a dead clone unlinks only its own file, and a dying
    writer's temp debris is inert."""
    import os
    import pathlib
    import shutil as sh

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _live_clone_refs,
        _register_clone,
        clone_table,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    clone_table(table, a, shallow=True)
    clone_table(table, b, shallow=True)
    reg = pathlib.Path(table) / "_clones"
    assert len(list(reg.glob("*.json"))) == 2  # one file per clone
    # re-registration is an idempotent no-op (FileExistsError branch)
    ref = str(
        pathlib.Path(table).resolve() / "data" / "v00000001" / "x.parquet"
    )
    _register_clone(os.path.abspath(a), [ref])
    assert len(list(reg.glob("*.json"))) == 2
    assert not list(reg.glob(".*tmp*"))  # write-then-link cleaned up
    # both clones pin files — neither registration was lost
    assert set(_live_clone_refs(table)) == {
        os.path.abspath(a), os.path.abspath(b),
    }
    # pruning a dead clone unlinks ONLY its file
    sh.rmtree(a)
    assert set(_live_clone_refs(table)) == {os.path.abspath(b)}
    assert len(list(reg.glob("*.json"))) == 1
    # half-written debris (pre-link temp of a dying writer) is skipped
    (reg / "deadbeef00.json").write_text("{")
    assert set(_live_clone_refs(table)) == {os.path.abspath(b)}


def test_source_vacuum_proceeds_when_clone_released_or_died(
    spark, table, tmp_path
):
    """The guard tracks live truth: a clone that no longer references
    source files (rewritten + self-vacuumed) or was deleted outright
    stops pinning them."""
    import shutil as sh

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        clone_table,
        overwrite_table,
    )

    gone = str(tmp_path / "gone")
    released = str(tmp_path / "released")
    clone_table(table, gone, shallow=True)
    clone_table(table, released, shallow=True)
    overwrite_table(_batch(spark, 500, 10), table)
    sh.rmtree(gone)  # clone deleted outright
    # the other clone rewrites itself away from the source's files...
    overwrite_table(_batch(spark, 900, 5), released)
    vacuum_table(released, keep_last=1)
    # ...so the source vacuum now proceeds without force
    assert vacuum_table(table, keep_last=1) > 0
    assert read_table(spark, table).count() == 10
    assert read_table(spark, released).count() == 5
