"""spark.sql() over the registered catalog views — the user-facing SQL
surface. The same SQL text must run on Spark and DuckDB (ANSI overlap)."""

from __future__ import annotations

import duckdb

from optimal_parallel_fp_growth_spark.sources.catalog import TABLES, register_views

PORTABLE_SQL = """
SELECT n_name, count(*) AS n_cust, round(avg(c_acctbal), 4) AS avg_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def test_same_sql_runs_on_spark_and_duckdb(spark, sf_oracle):
    register_views(spark, sf_oracle)
    got = {tuple(r) for r in spark.sql(PORTABLE_SQL).collect()}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_oracle}/{t}.parquet')"
        )
    want = {tuple(r) for r in con.execute(PORTABLE_SQL).fetchall()}
    con.close()
    assert got == want and len(want) > 0


def test_views_cover_all_tables(spark, sf_oracle):
    register_views(spark, sf_oracle)
    for t in TABLES:
        assert spark.table(t).count() > 0
