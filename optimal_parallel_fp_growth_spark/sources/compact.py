"""Small-file compaction (100 TB stance, engine addition).

Streaming sinks, incremental batches, and per-task writes leave
tables as thousands of KB-sized files; every later scan then pays
per-file open/footer costs and the driver pays listing/planning costs
— at 100 TB the file count, not the byte count, becomes the scan
bottleneck. ``compact_files`` rewrites a parquet directory to
~``target_mb`` files:

- sizing comes from the actual on-disk bytes (filesystem listing, no
  data read);
- the rewrite uses ``coalesce`` — a NARROW dependency, no shuffle:
  tasks concatenate input splits, which is exactly what compaction
  needs (``repartition`` would shuffle every row to re-balance
  perfectly; pointless for a size-driven rewrite);
- pass ``sorted_by`` to re-cluster while compacting (then the rewrite
  IS a shuffle — ``write_sorted``'s range partitioning — and buys the
  data-skipping layout at the same time);
- the rewrite lands in a temp sibling directory and swaps in with two
  renames, so a concurrent reader sees either the old or the new
  layout, never a half-written mix. (On object stores use a
  table-format commit instead; the swap here is the filesystem
  equivalent.)
"""

from __future__ import annotations

import os
import pathlib
import shutil

from pyspark.sql import DataFrame, SparkSession

from optimal_parallel_fp_growth_spark.sources.sinks import write_sorted

__all__ = ["compact_files"]


def _dir_bytes(path: str) -> tuple[int, int]:
    """(total_bytes, n_data_files) of the parquet files under path."""
    total = 0
    n = 0
    for p in pathlib.Path(path).rglob("*.parquet"):
        total += p.stat().st_size
        n += 1
    return total, n


def compact_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sorted_by: tuple[str, ...] = (),
) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(bytes / target_mb)`` files (narrow coalesce; or a
    range-partitioned sorted layout when ``sorted_by`` is given).
    Returns {"files_before", "files_after", "bytes", "target_files"}.
    """
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    # crash recovery FIRST: the swap below has a window where `path`
    # does not exist (between its two renames). A crash there strands
    # the table at `old` — if we find that state, roll it back before
    # anything else (in particular before the stale-sibling sweep,
    # which would otherwise delete the only copy of the data).
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    total, before = _dir_bytes(path)
    if before == 0:
        raise ValueError(f"no parquet files under {path!r}")
    target = max(1, -(-total // (target_mb * 1024 * 1024)))
    df: DataFrame = spark.read.parquet(path)
    # a crashed previous run may have left either sibling behind; the
    # live table at `path` is authoritative (recovered above if
    # needed), so both are safe to clear
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    if sorted_by:
        write_sorted(df, tmp, sorted_by, num_files=target)
    else:
        df.coalesce(target).write.mode("overwrite").parquet(tmp)
    # Swap window: between these two renames NO directory exists at
    # `path` — a concurrent reader listing in that instant errors (the
    # "old or new, never mixed" guarantee holds only for readers that
    # opened the directory before/after the window), and a crash here
    # strands the table at `old`. Both are bounded by the rename pair
    # (microseconds, no data copy) and the crash case is healed by the
    # rollback at the top of this function on the next run. True
    # read-isolation needs a manifest commit (sources/versioned.py).
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    _, after = _dir_bytes(path)
    return {
        "files_before": before,
        "files_after": after,
        "bytes": total,
        "target_files": target,
    }
