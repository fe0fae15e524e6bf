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


def test_unsupported_dtype_fails_closed():
    with pytest.raises(ValueError, match="integral and string"):
        spark_hash(1.5, "double")
