"""Build the OPTIMIZATION_r17.md closing per-stage table: baseline
median (plans/r17/BENCH_r17_base{1,2,3}.json) vs closing median
(BENCH JSON paths passed as argv), with per-stage steal from the
closing runs so noisy rows are flagged instead of over-read.

Usage: python scripts/r17_close_table.py CLOSE1.json [CLOSE2.json ...]
Prints markdown to stdout.
"""

from __future__ import annotations

import json
import pathlib
import statistics
import sys

HERE = pathlib.Path(__file__).resolve().parents[1]


def main() -> None:
    base_runs = [
        json.loads((HERE / "plans/r17" / f"BENCH_r17_base{i}.json").read_text())
        for i in (1, 2, 3)
    ]
    close_runs = [json.loads(pathlib.Path(p).read_text()) for p in sys.argv[1:]]
    stages = list(base_runs[0]["queries"])
    rows = []
    for s in stages:
        b = statistics.median(r["queries"][s] for r in base_runs if s in r["queries"])
        cs = [r["queries"][s] for r in close_runs if s in r["queries"]]
        c = statistics.median(cs) if cs else float("nan")
        st = max((r.get("steal_pct", {}).get(s, 0.0) for r in close_runs), default=0.0)
        rows.append((s, b, c, st))
    new = [
        s for r in close_runs for s in r["queries"] if s not in set(stages)
    ]
    print("| stage | base median (s) | close median (s) | Δ | max steal % |")
    print("|---|---|---|---|---|")
    for s, b, c, st in sorted(rows, key=lambda r: -r[1]):
        d = c - b
        flag = " ⚠" if st >= 2 else ""
        print(f"| {s} | {b:.2f} | {c:.2f} | {d:+.2f} | {st:.1f}{flag} |")
    if new:
        print("\nstages only in closing runs:", ", ".join(sorted(set(new))))
    be2e = [r["value"] for r in base_runs]
    ce2e = [r["value"] for r in close_runs]
    print(f"\ne2e base runs: {be2e}; closing runs: {ce2e}")


if __name__ == "__main__":
    main()
