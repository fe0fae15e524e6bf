"""Generate an sf1-scale replica set from the driver's sf0.1 testdata.

The driver ships sf{0.001,0.01,0.1}; the 100×-design claims need at
least one measured decade of scaling. This script builds sfN = R×sf0.1
(default R=10) by unioning R key-shifted copies of each table —
deterministic, no RNG — with two care points so the scaled workload is
a fair ~linear probe rather than a degenerate one:

- ``documents.text`` is alphabet-rotated per replica (``translate``
  with a rotated a-z map). Identical text across replicas would make
  every document a 10-way exact/near dup: minhash-LSH candidate pairs
  would grow quadratically in R by construction and the probe would
  measure the replication artifact, not the operator. Rotation keeps
  every within-replica similarity structure EXACTLY (char-level
  bijection ⇒ shingle sets map 1:1) and sends cross-replica shingle
  overlap to ~0.
- ``embeddings.embedding`` gets a per-replica deterministic sign-flip
  pattern per dimension. A signed permutation is an isometry, so each
  replica's internal geometry (norms, dot products, k-means structure)
  is EXACTLY sf0.1's, while cross-replica cosines decorrelate — the
  embedding-space analogue of the text rotation.

Dimension tables (region, nation) are copied as-is: replicated fact
keys still reference the same 25 nations, as a real 10× corpus would.

Usage:
    python scripts/make_scale.py DEST_DIR [replicas] [src_dir]
"""

from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, functions as F

STRIDE = 1_000_000_000  # key shift per replica; far above any sf0.1 key
ALPHA = "abcdefghijklmnopqrstuvwxyz"

# (table, int64 key columns to shift per replica)
SHIFTS = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _replica(df: DataFrame, table: str, i: int) -> DataFrame:
    if table in ("region", "nation"):
        return df if i == 0 else None
    out = df
    for c in SHIFTS[table]:
        out = out.withColumn(c, F.col(c) + F.lit(i * STRIDE))
    if table == "documents" and i > 0:
        rot = ALPHA[i % 26 :] + ALPHA[: i % 26]
        out = out.withColumn("text", F.translate("text", ALPHA, rot))
    if table == "embeddings" and i > 0:
        # deterministic per-(replica, dim) sign flip; (p+1)*(i+1)*K
        # stays well inside int64 (p<inf dims, i<26)
        sign = (
            f"CASE WHEN pmod((p + 1) * {i + 1} * 2654435761, 97) < 48 "
            "THEN CAST(1.0 AS FLOAT) ELSE CAST(-1.0 AS FLOAT) END"
        )
        out = out.withColumn(
            "embedding",
            F.expr(f"transform(embedding, (x, p) -> CAST(x * ({sign}) AS FLOAT))"),
        )
    return out


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    dest = sys.argv[1].rstrip("/")
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = (sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1").rstrip("/")

    from optimal_parallel_fp_growth_spark.session import get_session

    spark = get_session("make-scale")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for table in SHIFTS:
        raw = spark.read.parquet(f"{src}/{table}.parquet")
        parts = [
            r
            for i in range(replicas)
            if (r := _replica(raw, table, i)) is not None
        ]
        df = functools.reduce(DataFrame.unionByName, parts)
        df.write.mode("overwrite").parquet(f"{dest}/{table}.parquet")
        print(f"{table}: {spark.read.parquet(f'{dest}/{table}.parquet').count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
