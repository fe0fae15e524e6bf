"""Small-file compaction (sources/compact.py): file-count reduction,
lossless rewrite, narrow (no-shuffle) plan, and the sorted variant."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.catalog import load_table
from optimal_parallel_fp_growth_spark.sources.compact import compact_files


@pytest.fixture()
def fragmented(spark, sf_small, tmp_path):
    """documents written as ~50 tiny files."""
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "frag")
    docs.repartition(50).write.parquet(out)
    return docs, out


def test_compacts_and_preserves_rows(spark, fragmented):
    docs, out = fragmented
    before = len(glob.glob(f"{out}/*.parquet"))
    assert before == 50
    stats = compact_files(spark, out, target_mb=128)
    assert stats["files_before"] == 50
    after = len(glob.glob(f"{out}/*.parquet"))
    assert after == stats["files_after"] <= 2  # tiny corpus → 1 target file
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }


def test_compaction_plan_is_narrow(spark, fragmented):
    _, out = fragmented
    plan = (
        spark.read.parquet(out)
        .coalesce(1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # coalesce is a narrow rewrite


def test_sorted_compaction_clusters(spark, fragmented, tmp_path):
    import pyarrow.parquet as pq

    spark_, out = None, fragmented[1]
    stats = compact_files(fragmented[0].sparkSession, out, target_mb=1,
                          sorted_by=("doc_id",))
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert len(files) == stats["files_after"] >= 1
    rs = []
    for f in files:
        md = pq.read_metadata(f)
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "doc_id"
        )
        mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
        rs.append((min(mins), max(maxs)))
    rs.sort()
    for (_, hi), (lo, _) in zip(rs, rs[1:]):
        assert hi < lo


def test_empty_dir_raises(spark, tmp_path):
    import os

    p = str(tmp_path / "empty")
    os.makedirs(p)
    with pytest.raises(ValueError):
        compact_files(spark, p)


def test_stale_tmp_dirs_from_crash_are_cleared(spark, fragmented):
    import os

    docs, out = fragmented
    # simulate a crashed prior run leaving both siblings behind
    os.makedirs(out + "._compact_tmp/junk", exist_ok=True)
    os.makedirs(out + "._compact_old/junk", exist_ok=True)
    stats = compact_files(spark, out, target_mb=128)
    assert stats["files_after"] <= 2
    assert not os.path.exists(out + "._compact_tmp")
    assert not os.path.exists(out + "._compact_old")
    assert spark.read.parquet(out).count() == docs.count()


def test_crash_between_swap_renames_recovers(spark, fragmented):
    """A crash in the swap window leaves the table stranded at
    ._compact_old with `path` missing; the next run must roll it back
    and proceed instead of erroring or deleting the only copy
    (ADVICE r5)."""
    import os

    _, path = fragmented
    before = spark.read.parquet(path).count()
    os.rename(path, path.rstrip("/") + "._compact_old")
    stats = compact_files(spark, path, target_mb=128)
    assert stats["files_after"] <= stats["files_before"]
    assert spark.read.parquet(path).count() == before
