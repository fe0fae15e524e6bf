"""Differential pin: the pure-python Murmur3 (functions/spark_hash.py)
must match Spark's F.hash — and bucket_of must match the partition id
df.repartition(n, col) actually assigns — on every supported type.
A silent divergence here would make manifest-side bucket pruning skip
files that DO hold the key."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.spark_hash import (
    bucket_of,
    spark_hash,
)


def _spark_hashes(spark, values, dtype):
    df = spark.createDataFrame([(v,) for v in values], f"v {dtype}")
    return [r.h for r in df.select(F.hash("v").alias("h")).collect()]


def test_matches_spark_hash_longs(spark):
    rng = random.Random(13)
    vals = (
        [0, 1, -1, 42, 2**31 - 1, -(2**31), 2**63 - 1, -(2**63)]
        + [rng.randint(-(2**63), 2**63 - 1) for _ in range(200)]
    )
    got = [spark_hash(v, "bigint") for v in vals]
    want = _spark_hashes(spark, vals, "bigint")
    assert got == want


def test_matches_spark_hash_ints(spark):
    rng = random.Random(17)
    vals = [0, 1, -1, 2**31 - 1, -(2**31)] + [
        rng.randint(-(2**31), 2**31 - 1) for _ in range(200)
    ]
    got = [spark_hash(v, "int") for v in vals]
    want = _spark_hashes(spark, vals, "int")
    assert got == want


def test_matches_spark_hash_strings(spark):
    rng = random.Random(19)
    alphabet = "abcXYZ0189_-./:äö€漢字🚀 "
    vals = ["", "a", "ab", "abc", "abcd", "abcde", "é", "🚀"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(200)
    ]
    got = [spark_hash(v, "string") for v in vals]
    want = _spark_hashes(spark, vals, "string")
    assert got == want


def test_null_hashes_to_seed(spark):
    df = spark.createDataFrame([(None,)], "v string")
    want = df.select(F.hash("v").alias("h")).collect()[0].h
    assert spark_hash(None, "string") == want == 42


def test_bucket_of_matches_repartition_assignment(spark):
    """The end-to-end contract: the file a row lands in under
    df.repartition(n, col) is exactly bucket_of(key)."""
    n = 16
    rng = random.Random(23)
    keys = [rng.randint(-(2**62), 2**62) for _ in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    got = {
        r.k: r.pid
        for r in df.repartition(n, "k")
        .select("k", F.spark_partition_id().alias("pid"))
        .collect()
    }
    for k in keys:
        assert got[k] == bucket_of(k, "bigint", n), k
    # strings too — the uuid-shaped key case bucketing exists for
    skeys = [f"doc-{rng.getrandbits(64):016x}" for _ in range(300)]
    sdf = spark.createDataFrame([(k,) for k in skeys], "k string")
    sgot = {
        r.k: r.pid
        for r in sdf.repartition(n, "k")
        .select("k", F.spark_partition_id().alias("pid"))
        .collect()
    }
    for k in skeys:
        assert sgot[k] == bucket_of(k, "string", n), k


def test_matches_spark_hash_dates(spark):
    """Round 17: DateType hashes its physical form — epoch DAYS via
    hashInt — so canon_date_days + hashInt must equal F.hash(date)."""
    import datetime

    rng = random.Random(29)
    epoch = datetime.date(1970, 1, 1)
    vals = [
        epoch,
        datetime.date(1969, 12, 31),
        datetime.date(2024, 2, 29),
        datetime.date(1, 1, 1),
        datetime.date(9999, 12, 31),
    ] + [
        epoch + datetime.timedelta(days=rng.randint(-50_000, 50_000))
        for _ in range(200)
    ]
    got = [spark_hash(v, "date") for v in vals]
    want = _spark_hashes(spark, vals, "date")
    assert got == want
    # ISO strings canonicalize to the same hash
    assert spark_hash("2024-02-29", "date") == spark_hash(
        datetime.date(2024, 2, 29), "date"
    )


def test_matches_spark_hash_timestamps(spark):
    """TimestampType hashes epoch MICROSECONDS via hashLong. Naive
    datetimes are UTC by the engine's session-timezone pin."""
    import datetime

    rng = random.Random(31)
    epoch = datetime.datetime(1970, 1, 1)
    vals = [
        epoch,
        datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),
        datetime.datetime(2024, 2, 29, 12, 34, 56, 789012),
    ] + [
        epoch
        + datetime.timedelta(
            seconds=rng.randint(-(2**31), 2**31),
            microseconds=rng.randint(0, 999_999),
        )
        for _ in range(200)
    ]
    got = [spark_hash(v, "timestamp") for v in vals]
    want = _spark_hashes(spark, vals, "timestamp")
    assert got == want
    # tz-aware probes fold into UTC before hashing
    aware = datetime.datetime(
        2024, 2, 29, 13, 34, 56, 789012,
        tzinfo=datetime.timezone(datetime.timedelta(hours=1)),
    )
    assert spark_hash(aware, "timestamp") == spark_hash(
        datetime.datetime(2024, 2, 29, 12, 34, 56, 789012), "timestamp"
    )


def test_bucket_of_matches_repartition_assignment_temporal(spark):
    import datetime

    n = 8
    rng = random.Random(37)
    epoch = datetime.date(1970, 1, 1)
    dates = sorted(
        {
            epoch + datetime.timedelta(days=rng.randint(0, 20_000))
            for _ in range(150)
        }
    )
    df = spark.createDataFrame([(d,) for d in dates], "k date")
    got = {
        r.k: r.pid
        for r in df.repartition(n, "k")
        .select("k", F.spark_partition_id().alias("pid"))
        .collect()
    }
    for k in dates:
        assert got[k] == bucket_of(k, "date", n), k


def test_unsupported_dtype_fails_closed():
    with pytest.raises(ValueError, match="bucket keys"):
        spark_hash(1.5, "double")
    # a non-canonicalizable temporal probe fails closed too
    with pytest.raises(ValueError, match="date"):
        spark_hash("not-a-date", "date")
    with pytest.raises(ValueError, match="timestamp"):
        spark_hash("nope", "timestamp")
