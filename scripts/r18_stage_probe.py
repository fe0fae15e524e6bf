"""Isolated warm probe of arbitrary bench stages (round 18).

Usage: python scripts/r18_stage_probe.py <sf_dir> <reps> <query> [query ...]
Noop-sink timed, one warm-up rep untimed, queries alternate per rep.
"""

from __future__ import annotations

import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    from optimal_parallel_fp_growth_spark.functions.caching import (
        release_cached_inputs,
    )
    from optimal_parallel_fp_growth_spark.queries import QUERIES
    from optimal_parallel_fp_growth_spark.session import get_session

    sf = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_session("r18-stage-probe")
    for n in names:
        out = QUERIES[n](spark, sf)
        out.write.format("noop").mode("overwrite").save()
        release_cached_inputs(out)
    walls: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"probe:{n}")
            t0 = time.perf_counter()
            out = QUERIES[n](spark, sf)
            out.write.format("noop").mode("overwrite").save()
            release_cached_inputs(out)
            walls[n].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    for n in names:
        print(f"{n}: {walls[n]} median {statistics.median(walls[n]):.3f}")


if __name__ == "__main__":
    main()
