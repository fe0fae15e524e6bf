"""NaN-aware float stats (round 15, VERDICT r14 task #5 — the Iceberg
``nan_value_counts`` shape): commits record a per-file ``__nan`` flag
for every float/double column, so `table_minmax` answers exactly and
predicate pruning bites on provably NaN-free float files, while
NaN-holding or NaN-unknown (pre-r15 manifest) files keep r14's
conservative behavior — minmax fail-closed, pruning fail-open."""

from __future__ import annotations

import json
import math
import pathlib

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.versioned import (
    append_table,
    create_table,
    files_scanned,
    read_table,
    table_minmax,
)


def _floats(spark, start, n, nan_ids=()):
    rows = [
        (
            i,
            float("nan") if i in nan_ids else float(i) * 1.5,
        )
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(rows, "doc_id long, score double")


def test_minmax_exact_on_nan_free_float_column(spark, tmp_path):
    path = str(tmp_path / "tbl")
    create_table(_floats(spark, 0, 100).repartitionByRange(4, "doc_id"), path)
    append_table(_floats(spark, 100, 50), path)
    lo, hi = table_minmax(path, "score")
    want = read_table(spark, path).agg(
        F.min("score"), F.max("score")
    ).first()
    assert (lo, hi) == (want[0], want[1]) == (0.0, 149 * 1.5)


def test_minmax_fails_closed_when_any_file_holds_nan(spark, tmp_path):
    path = str(tmp_path / "tbl")
    create_table(_floats(spark, 0, 100).coalesce(1), path)
    append_table(_floats(spark, 100, 50, nan_ids={120}).coalesce(1), path)
    with pytest.raises(ValueError, match="NaN"):
        table_minmax(path, "score")
    # the scan-side truth Spark reports: NaN IS the max
    got = read_table(spark, path).agg(F.max("score")).first()[0]
    assert math.isnan(got)


def test_minmax_fails_closed_without_recorded_flag(spark, tmp_path):
    """A pre-r15 manifest (no __nan key) must stay fail-closed."""
    path = str(tmp_path / "tbl")
    create_table(_floats(spark, 0, 100).coalesce(1), path)
    mpath = next(
        (pathlib.Path(path) / "_manifests").glob("v*.json")
    )
    man = json.loads(mpath.read_text())
    for fs in man["file_stats"].values():
        fs.pop("__nan", None)
    mpath.write_text(json.dumps(man))
    with pytest.raises(ValueError, match="no NaN flag"):
        table_minmax(path, "score")


def test_float_pruning_bites_on_nan_free_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    create_table(
        _floats(spark, 0, 400).repartitionByRange(8, "score"), path
    )
    assert files_scanned(path) == 8
    opened = files_scanned(path, prune=("score", ">=", 400 * 1.5 - 10))
    assert opened <= 2  # range-clustered: the top slice only
    got = read_table(
        spark, path, prune=("score", ">=", 400 * 1.5 - 10)
    ).where(F.col("score") >= 400 * 1.5 - 10)
    assert got.count() == 6  # scores 394..399 * 1.5


def test_float_pruning_never_drops_a_nan_file(spark, tmp_path):
    """Spark and DuckDB treat NaN as larger than every value, so a
    NaN row satisfies `score > huge` even though its file's footer
    range tops out low — the NaN-holding file must survive pruning."""
    path = str(tmp_path / "tbl")
    create_table(_floats(spark, 0, 100).coalesce(1), path)          # clean
    append_table(_floats(spark, 100, 50, nan_ids={120}).coalesce(1), path)
    assert files_scanned(path) == 2
    # huge probe: the clean file prunes, the NaN file survives
    assert files_scanned(path, prune=("score", ">", 1e12)) == 1
    got = read_table(spark, path, prune=("score", ">", 1e12)).where(
        F.col("score") > 1e12
    )
    rows = got.collect()
    assert len(rows) == 1 and math.isnan(rows[0].score)
    # equality on a clean value still prunes the NaN file by range?
    # no: a NaN-holding file survives EVERY float predicate (fail-open)
    assert files_scanned(path, prune=("score", "==", 3.0)) == 2


def test_float_pruning_fails_open_without_recorded_flag(spark, tmp_path):
    """Pre-r15 manifests (no __nan flag) must never float-prune."""
    path = str(tmp_path / "tbl")
    create_table(
        _floats(spark, 0, 400).repartitionByRange(8, "score"), path
    )
    mpath = next(
        (pathlib.Path(path) / "_manifests").glob("v*.json")
    )
    man = json.loads(mpath.read_text())
    for fs in man["file_stats"].values():
        fs.pop("__nan", None)
    mpath.write_text(json.dumps(man))
    assert files_scanned(path, prune=("score", ">=", 1e12)) == 8
    # integer pruning on the same manifest is unaffected
    assert files_scanned(path, prune=("doc_id", "==", 0)) < 8
