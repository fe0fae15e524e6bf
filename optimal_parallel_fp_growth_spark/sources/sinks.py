"""File sinks — absent from the reference (its only sink is
collect()+println, SURVEY §2.1), but mandatory for a real engine.

Thin, opinionated wrappers over ``df.write``: parquet is the default
interchange format (columnar, statistics, predicate-pushdown-able on
re-read); ``partition_by`` turns a write into a hive-layout table so
downstream scans get partition pruning — the 100 TB pattern where e.g.
events are laid out by day and a day-ranged query touches 1/365th of
the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def _auto_num_files(df: DataFrame, floor: int = 8) -> int:
    """Default output-file count for the clustered writers: one file
    per input partition (≈ one per maxPartitionBytes of source data),
    floored. A FIXED small count is a scale trap: at 100× the data,
    8 range partitions each sort 100× the bytes and spill — measured
    826 MB of sort spill for the z-order rewrite of the sf10 lineitem
    at num_files=8, zero at the derived count."""
    return max(floor, df.rdd.getNumPartitions())


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: tuple[str, ...],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Data-skipping layout: global range partitioning on ``sort_cols``
    + sort within each partition, one file per range. Files then carry
    DISJOINT parquet min/max statistics on the sort columns, so a
    selective re-read filter skips whole row groups/files instead of
    scanning everything — the linear-clustering half of what Z-ordering
    buys, for the dominant filter column (time, id range). At 100 TB
    this is the difference between a range query touching one file
    range and touching every shard; the range exchange samples the sort
    key distribution, so skew produces balanced files without manual
    bounds. Combine with hive ``partition_by`` (coarse pruning at
    planning time) — this layer prunes WITHIN partitions at read time."""
    (
        df.repartitionByRange(
            num_files if num_files is not None else _auto_num_files(df),
            *sort_cols,
        )
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key(
    df: DataFrame,
    cols: tuple[str, ...],
    bits: int = 10,
):
    """Morton (Z-order) interleave key over 2+ numeric columns as a
    pure codegen expression: each column min-max-normalizes into a
    ``bits``-bit bucket (one tiny driver-side agg for the bounds), and
    the buckets' bits interleave into one long. Sorting by this key
    clusters the data so EVERY listed column's per-file min/max range
    is narrow — multi-dimensional data skipping, where a single-column
    sort only clusters its first key. Equal-width bucketing is
    deliberate (rank-based bucketing needs a global sort just to
    bucket); heavy skew in a column costs resolution in that dimension
    only."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs >= 2 columns; use write_sorted for 1")
    if bits * n > 62:
        raise ValueError(f"bits*len(cols) must fit a long, got {bits}*{n}")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    bucket_cols = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        span = (mx - mn) or 1.0
        norm = (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
        bucket_cols.append(
            F.least(F.floor(norm * (top + 1)).cast("long"), F.lit(top))
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, bc in enumerate(bucket_cols):
            z = z + F.shiftleft(
                F.shiftright(bc, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    bits: int = 10,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered parquet layout: range-partition + sort on the
    Morton key of ``cols``, so selective filters on ANY of the listed
    columns skip most files/row groups (each file covers a small
    hyper-rectangle of the key space). The multi-column counterpart of
    :func:`write_sorted`. ``num_files=None`` derives one file per
    input partition (see :func:`_auto_num_files` — a fixed count is a
    measured spill trap at 100×)."""
    z = zorder_key(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(
            num_files if num_files is not None else _auto_num_files(df),
            "__z",
        )
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (native Spark format; same columnar statistics +
    predicate-pushdown story as parquet, for ORC-standardized lakes)."""
    df.write.mode(mode).orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV with header; arrays/structs are not CSV-representable — cast
    or json-encode them first."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_back(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    reader = spark.read
    if fmt == "csv":
        return reader.option("header", "true").option("inferSchema", "true").csv(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "orc":
        return reader.orc(path)
    return reader.parquet(path)


def write_sharded(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str,
    mode: str = "overwrite",
    salt: str = "shard",
) -> None:
    """Training-data shard layout: hive directories ``shard=0..n-1``,
    exactly ONE parquet file per shard, near-equal row counts.

    Shard membership is the salted md5 bucket of the row id (same scheme
    as ``operators/sampling.py``): deterministic in the data, so re-runs,
    task retries, and different cluster sizes produce byte-identical
    shard membership — `spark_partition_id()`-style sharding does not
    survive any of those. One shuffle (`repartition(n, shard)`), then
    each task's rows split by `partitionBy` into its shard directory;
    hash collisions between shard values only co-locate two shards in
    one task, never split a shard across files."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    if "shard" in df.columns:
        # withColumn would silently REPLACE it, corrupting user data and
        # changing shard membership.
        raise ValueError(
            "input already has a 'shard' column - rename or drop it before "
            "write_sharded (the shard layout reserves that name)"
        )
    from pyspark.sql import functions as F

    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % num_shards
    )
    (
        df.withColumn("shard", shard)
        .repartition(num_shards, "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
