"""bench.py must survive a single broken stage (VERDICT r9 task #3).

Round 9's driver bench artifact was lost (rc=1, parsed:null) because
one broken registry entry raised inside the timed loop with no guard.
The guard lives in ``bench._timed`` so it can be exercised without a
Spark session or a full sf0.1 run.
"""

import importlib.util
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]

spec = importlib.util.spec_from_file_location("bench_mod", REPO / "bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_broken_stage_is_recorded_not_raised(capsys):
    timings, errors = {}, {}

    def boom():
        raise NotImplementedError("unrecognized video container")

    bench._timed("broken_entry", boom, timings, errors)  # must not raise
    bench._timed("good_entry", lambda: None, timings, errors)
    assert "broken_entry" not in timings
    assert errors["broken_entry"].startswith("NotImplementedError:")
    assert timings["good_entry"] >= 0
    err = capsys.readouterr().err
    assert "broken_entry: ERROR" in err and "good_entry:" in err


def test_error_messages_are_bounded():
    # BENCH_FULL must stay small even for pathological exception text
    timings, errors = {}, {}

    def boom():
        raise ValueError("x" * 10_000)

    bench._timed("big", boom, timings, errors)
    assert len(errors["big"]) <= 300


def test_bench_survives_a_missing_data_directory_end_to_end():
    """Review finding (round 10): the eager flagship setup (persist +
    count) originally ran OUTSIDE the per-stage guard, so a broken
    input directory still reproduced the BENCH_r09 failure (rc=1, no
    JSON line). Run the real bench against a nonexistent SF_DIR: every
    stage must fail individually, the process must exit 0, and the
    final stdout line must parse with a full error count."""
    import json
    import os
    import subprocess
    import sys

    import tempfile

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/nonexistent/sfX"
    env["SPARK_GRAFT_CPUS"] = "2"
    # keep the committed BENCH_FULL.json ledger out of blast range
    tmp = tempfile.NamedTemporaryFile(suffix=".json", delete=False)
    env["SPARK_GRAFT_BENCH_OUT"] = tmp.name
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["errors"] > 100  # every stage failed, none fatally
    assert out["n_stages"] == 0


def test_stdout_line_carries_an_error_count():
    # the driver parses only the final stdout JSON line; the error
    # count must ride on it so a partial bench is visibly partial
    src = (REPO / "bench.py").read_text()
    tail = src.split('"full": "BENCH_FULL.json"')[1]
    assert '"errors": len(errors)' in tail


def test_timed_records_per_stage_steal_pct():
    """VERDICT r11 task #3: every timed stage must carry a steal_pct
    sample so a >2x wall can be adjudicated mechanically (true
    regression when steal is low, host noise when it is not)."""
    timings, errors, steals = {}, {}, {}
    bench._timed("s", lambda: None, timings, errors, steals)
    assert "s" in timings
    # /proc/stat exists on this host, so the sample must be present:
    # (steal_pct, iowait_pct), each a sane percentage
    assert all(0.0 <= v <= 100.0 for v in steals["s"])
    # errored stages record no steal row (no wall to adjudicate)
    bench._timed(
        "b", lambda: (_ for _ in ()).throw(ValueError("x")),
        timings, errors, steals,
    )
    assert "b" not in steals and "b" in errors


def test_cpu_counters_parse_proc_stat():
    got = bench._cpu_counters()
    assert got is not None
    steal, iowait, total = got
    assert 0 <= steal <= total and 0 <= iowait <= total


def test_bench_full_artifact_carries_steal_pct():
    """The BENCH_FULL.json writer and the stdout summary must both
    carry the steal fields (the driver records the stdout line; the
    baseline protocol reads the full artifact)."""
    src = (REPO / "bench.py").read_text()
    assert '"steal_pct"' in src and '"iowait_pct"' in src
    assert '"steal": steal_summary' in src
