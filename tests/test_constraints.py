"""Round-13 CHECK constraints on versioned tables (the Delta ALTER
TABLE ADD CONSTRAINT shape): recorded in the table spec, every write
path validates the files it is about to commit and aborts — nothing
commits, staged data is reclaimed — on violation."""

from __future__ import annotations

import pathlib

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.versioned import (
    add_constraint,
    append_table,
    create_table,
    describe_table,
    drop_constraint,
    merge_table,
    overwrite_table,
    read_table,
    table_constraints,
    table_history,
    update_where,
)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, [(i, i * 2) for i in range(20)]), path)
    add_constraint(spark, path, "v_nonneg", "v >= 0")
    return path


def test_add_validates_existing_head(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, [(1, -5), (2, 4)]), path)
    with pytest.raises(ValueError, match="existing rows violate"):
        add_constraint(spark, path, "v_nonneg", "v >= 0")
    assert table_constraints(path) == {}
    add_constraint(spark, path, "k_pos", "k > 0")
    assert table_constraints(path) == {"k_pos": "k > 0"}
    with pytest.raises(ValueError, match="identifier"):
        add_constraint(spark, path, "bad name", "k > 0")


def test_append_aborts_atomically_on_violation(spark, table):
    v_before = table_history(table)[-1]["version"]
    with pytest.raises(ValueError, match="v_nonneg"):
        append_table(_kv(spark, [(100, 7), (101, -1)]), table)
    # nothing committed, no staged debris, table still writable
    assert table_history(table)[-1]["version"] == v_before
    assert not list(
        (pathlib.Path(table) / "data").glob(f"v{v_before + 1:08d}*")
    )
    append_table(_kv(spark, [(100, 7)]), table)
    assert read_table(spark, table).count() == 21


def test_merge_update_overwrite_validate(spark, table):
    with pytest.raises(ValueError, match="v_nonneg"):
        merge_table(_kv(spark, [(3, -9)]), table, "k")
    with pytest.raises(ValueError, match="v_nonneg"):
        update_where(spark, table, ("k", "<", 5), {"v": F.lit(-1).cast("long")})
    with pytest.raises(ValueError, match="v_nonneg"):
        overwrite_table(_kv(spark, [(1, -1)]), table)
    # the failed writes left the table fully intact
    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got == {i: i * 2 for i in range(20)}
    # valid versions of the same writes pass
    merge_table(_kv(spark, [(3, 99)]), table, "k")
    update_where(spark, table, ("k", "==", 4), {"v": F.lit(0).cast("long")})
    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got[3] == 99 and got[4] == 0


def test_null_passes_sql_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(
        spark.createDataFrame([(1, 5)], "k long, v long"), path
    )
    add_constraint(spark, path, "v_nonneg", "v >= 0")
    # NULL satisfies a CHECK (SQL standard): an append that omits the
    # column entirely is legal even with the constraint recorded
    append_table(
        spark.createDataFrame([(2,)], "k long"), path
    )
    assert read_table(spark, path).count() == 2
    # ...and so is an explicit NULL
    append_table(
        spark.createDataFrame(
            [(3, None)], "k long, v long"
        ),
        path,
    )
    rows = {r.k: r.v for r in read_table(spark, path).collect()}
    assert rows[3] is None


def test_drop_and_describe(spark, table):
    assert describe_table(table)["constraints"] == {"v_nonneg": "v >= 0"}
    drop_constraint(table, "v_nonneg")
    assert table_constraints(table) == {}
    with pytest.raises(KeyError):
        drop_constraint(table, "v_nonneg")
    append_table(_kv(spark, [(50, -1)]), table)  # no longer enforced
    assert read_table(spark, table).count() == 21


def test_multiple_constraints_named_in_error(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(_kv(spark, [(1, 1)]), path)
    add_constraint(spark, path, "v_nonneg", "v >= 0")
    add_constraint(spark, path, "k_small", "k < 1000")
    with pytest.raises(ValueError) as ei:
        append_table(_kv(spark, [(5000, -2)]), path)
    msg = str(ei.value)
    assert "v_nonneg" in msg and "k_small" in msg
