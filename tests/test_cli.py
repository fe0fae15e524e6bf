"""CLI entry points (parity with the reference's mains) — run in-process
against the textbook fixture."""

from __future__ import annotations

import pytest

TRAIN = "I1 I2 I5\nI2 I4\nI2 I3\nI1 I3\nI4 I2 I5 I1\n"
TEST = "I1\nI2\nI5 I2 I3\n"


@pytest.fixture()
def txt(tmp_path):
    train = tmp_path / "train.txt"
    train.write_text(TRAIN)
    test = tmp_path / "test.txt"
    test.write_text(TEST)
    return str(train), str(test)


def test_cli_mine(spark, txt, capsys):
    from optimal_parallel_fp_growth_spark.cli import main

    train, _ = txt
    rc = main(["mine", train, "--min-support", "0.4", "--min-confidence", "0.5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Elapsed time:" in out
    assert "{I5} => {I1}: 1.0" in out  # textbook certainty rule


def test_cli_transform_pandas_kernel(spark, txt, capsys):
    from optimal_parallel_fp_growth_spark.cli import main

    train, test = txt
    rc = main(
        ["transform", train, test, "--min-support", "0.4",
         "--min-confidence", "0.5", "--kernel", "pandas"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "->" in out and out.count("\n") >= 3
