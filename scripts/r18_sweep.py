"""Targeted (or full) oracle sweep for round-18 optimization work.

Usage: python scripts/r18_sweep.py [sf_dir] [query ...]
  - no query args: sweep EVERY registry entry (full gate, slow)
  - query args: only those entries (fast re-check after a change)

Compares each Spark query against its DuckDB oracle (rows canonical-
sorted, floats rounded to 9 dp — the driver's comparison shape) and
prints one line per query plus a FAIL summary; exit 1 on any mismatch.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def f(v):
        return round(v, 9) if isinstance(v, float) else v

    return sorted(tuple(f(r[i]) for i in order) for r in rows)


def main() -> None:
    import duckdb

    import __spark_entry__ as em
    from optimal_parallel_fp_growth_spark.session import get_session
    from optimal_parallel_fp_growth_spark.sources.catalog import TABLES

    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]

    spark = get_session("r18-sweep", 8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    qs = em.queries()
    oracles = em.oracle_sql()
    targets = names or sorted(qs)
    failed = []
    for name in targets:
        q = qs[name]
        try:
            sdf = q(spark, sf)
            s = [tuple(r) for r in sdf.collect()]
            sql = oracles.get(name)
            if sql is None:
                print(f"{name}: rows-only {len(s)}")
                continue
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            ok = canon(s, sdf.columns) == canon(res.fetchall(), dcols)
        except Exception as e:  # noqa: BLE001 — sweep isolation
            print(f"{name}: ERROR {type(e).__name__}: {e}"[:300])
            failed.append(name)
            continue
        print(f"{name}: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            failed.append(name)
    spark.stop()
    if failed:
        print("FAILED:", ", ".join(failed))
        sys.exit(1)
    print(f"all {len(targets)} green")


if __name__ == "__main__":
    main()
