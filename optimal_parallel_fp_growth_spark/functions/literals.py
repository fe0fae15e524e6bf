"""Cheap construction of large numeric literals (round 17).

PySpark's ``F.lit(list)`` converts the value through py4j's
ListConverter, which makes ONE GATEWAY ROUND TRIP PER ELEMENT — a
16x64 centroid matrix costs ~0.7-1.5 s of driver time before any
planning starts, and the vector operators rebuild such literals once
per Lloyd iteration / probe batch (measured: the knn_ivf_index probe
spent 1.5 s of its 5.3 s wall constructing expressions, guide §1.2's
"driver does no data work" applied to plan BUILD time).

A SQL-text literal (``F.expr("array(array(1.5D, ...), ...)")``) is a
single py4j call; Catalyst's parser builds the tree JVM-side in
microseconds. Exactness: ``repr(float)`` is the shortest string that
round-trips IEEE-754, and both Java's ``Double.parseDouble`` and
Catalyst's double lexer are correctly rounded, so every finite double
(including -0.0, subnormals, and 1.7976931348623157e308) reproduces
bit-for-bit — pinned by tests/test_literals.py. Non-finite values go
through CAST('NaN'/'Infinity' AS DOUBLE), the documented Spark
spellings.

Integer ids ride the same path (no rounding concerns at all).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_double(x: float) -> str:
    """The SQL token for one double, bit-exact (see module docstring)."""
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(x) + "D"


def lit_double_array(xs) -> Column:
    """``array<double>`` literal in one py4j call."""
    xs = list(xs)
    if not xs:
        return F.expr("CAST(array() AS ARRAY<DOUBLE>)")
    return F.expr("array(" + ",".join(sql_double(x) for x in xs) + ")")


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal in one py4j call."""
    rows = [list(r) for r in rows]
    if not rows:
        return F.expr("CAST(array() AS ARRAY<ARRAY<DOUBLE>>)")
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(sql_double(x) for x in r) + ")" for r in rows
        )
        + ")"
    )


def lit_long_array(xs) -> Column:
    """``array<bigint>`` literal in one py4j call."""
    xs = [int(x) for x in xs]
    if not xs:
        return F.expr("CAST(array() AS ARRAY<BIGINT>)")
    return F.expr("array(" + ",".join(f"{x}L" for x in xs) + ")")


def lit_int_array(xs) -> Column:
    """``array<int>`` literal in one py4j call (values must fit)."""
    xs = [int(x) for x in xs]
    if any(not (-(2**31) <= x < 2**31) for x in xs):
        raise ValueError("lit_int_array value out of int32 range")
    if not xs:
        return F.expr("CAST(array() AS ARRAY<INT>)")
    return F.expr("array(" + ",".join(str(x) for x in xs) + ")")
