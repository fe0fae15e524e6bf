"""SQL-text numeric literals (round 17, functions/literals.py): the
py4j ListConverter pays one gateway round trip PER ELEMENT, so the
vector operators' centroid/plane/projection matrices are built as one
parsed SQL expression instead. These pins hold the whole scheme up:
every finite double must reproduce bit-for-bit through repr() +
Catalyst's parser, and the rewritten operators' struct typing must
match what per-element literals produced."""

from __future__ import annotations

import math
import random
import struct

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.literals import (
    lit_double_array,
    lit_double_matrix,
    lit_int_array,
    lit_long_array,
    sql_double,
)

HOSTILE = [
    0.0,
    -0.0,
    5e-324,  # smallest subnormal
    1e-308,
    1.7976931348623157e308,  # max double
    0.1,
    1 / 3,
    2**-52,
    1e16 + 2.0,
    123456789.123456789,
    -2.5e-15,
    float("nan"),
    float("inf"),
    float("-inf"),
]


def _bits(x: float) -> bytes:
    return struct.pack(">d", x)


def test_double_array_bit_exact(spark):
    rng = random.Random(17)
    xs = HOSTILE + [
        rng.uniform(-1, 1) * 10 ** rng.randint(-300, 300) for _ in range(200)
    ]
    row = spark.range(1).select(
        lit_double_array(xs).alias("a"), F.lit(xs).alias("b")
    ).first()
    assert [_bits(v) for v in row.a] == [_bits(v) for v in row.b]


def test_double_matrix_matches_py4j_lit(spark):
    rng = random.Random(7)
    M = [[rng.uniform(-100, 100) for _ in range(8)] for _ in range(5)]
    df = spark.range(1).select(
        lit_double_matrix(M).alias("a"), F.lit(M).alias("b")
    )
    row = df.first()
    assert [[_bits(v) for v in r] for r in row.a] == [
        [_bits(v) for v in r] for r in row.b
    ]


def test_int_and_long_arrays(spark):
    df = spark.range(1).select(
        lit_int_array([1, -(2**31), 2**31 - 1]).alias("i"),
        lit_long_array([1, -(2**63), 2**63 - 1]).alias("l"),
    )
    assert df.schema["i"].dataType.simpleString() == "array<int>"
    assert df.schema["l"].dataType.simpleString() == "array<bigint>"
    row = df.first()
    assert row.i == [1, -(2**31), 2**31 - 1]
    assert row.l == [1, -(2**63), 2**63 - 1]


def test_sql_double_nonfinite_spellings():
    assert "NaN" in sql_double(float("nan"))
    assert "-Infinity" in sql_double(float("-inf"))
    assert math.isinf(float("inf"))  # sanity


def test_cell_scores_typing_and_values_match_per_element_form(spark):
    """The transform-based _cell_scores must reproduce the retired
    per-element form exactly — field names, field types (cid stays
    int when ids fit int32), sort order, and every rounded value."""
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        _cell_scores,
    )

    rng = random.Random(3)
    cents = [
        (i * 3 + 1, [rng.uniform(-1, 1) for _ in range(16)], rng.uniform(1, 16))
        for i in range(7)
    ]

    def old_scores():
        def cos_to(cv, cn):
            dot = F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(float(x)) for x in cv]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            return F.round(dot / F.sqrt(F.col("norm2") * F.lit(cn)), 6)

        return F.array_sort(
            F.array(
                *[
                    F.struct(
                        (-cos_to(cv, cn)).alias("neg_cos"),
                        F.lit(cid).alias("cid"),
                    )
                    for cid, cv, cn in cents
                ]
            )
        )

    df = (
        spark.range(50)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda j: ((F.col("id") % 13 + j) / 13.0).cast("double"),
            ).alias("v"),
        )
        .withColumn(
            "norm2",
            F.aggregate(
                F.zip_with("v", "v", lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
        )
    )
    a = df.select("vec_id", old_scores().alias("s"))
    b = df.select("vec_id", _cell_scores(cents).alias("s"))
    assert a.schema == b.schema
    assert a.collect() == b.collect()
