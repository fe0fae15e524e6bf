"""Vector-similarity query registry — ANN over the ``embeddings`` table
(driver north star; SURVEY §7.2 M7).

Query set = every 50th vector (deterministic). Scoring is double-
precision with left-to-right fold order on both engines, and ranking
uses the rounded cosine with vec_id tiebreak, so the DuckDB oracle is
exact (verified incl. tie cases at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.similarity import (
    ANN_BITS,
    IVF_CELLS,
    IVF_PROBE,
    ann_topk,
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
    label_centroids,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

QUERY_STRIDE = 50
TOP_K = 10
NEARDUP_THRESHOLD = 0.4  # synthetic embeddings top out near cos 0.51


def _emb_and_queries(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb, emb.where(F.col("vec_id") % QUERY_STRIDE == 0)


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, queries = _emb_and_queries(spark, sf_dir)
    return cosine_topk(emb, queries, k=TOP_K)


def q_knn_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, queries = _emb_and_queries(spark, sf_dir)
    return ann_topk(emb, queries, k=TOP_K)


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, queries = _emb_and_queries(spark, sf_dir)
    return ivf_topk(emb, queries, k=TOP_K)


def q_knn_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index twin of `knn_ivf`: build the corpus IVF index
    (centroids + cell-bucketed assignments), probe the query batch
    against it, drop the session-temp index after materializing —
    identical answers to `ivf_topk` by construction (same seeded
    centroids over the same corpus), so it shares the same oracle."""
    import uuid

    from optimal_parallel_fp_growth_spark.functions.caching import (
        RddBlockHandle,
        persistent_rdd_ids,
        tag_cached_inputs,
    )
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        ann_against_index,
        build_ivf_index,
        drop_ivf_index,
    )

    emb, queries = _emb_and_queries(spark, sf_dir)
    name = f"opfpg_ivf_{uuid.uuid4().hex}"
    build_ivf_index(emb, name)
    out = ann_against_index(queries, name, k=TOP_K)
    seen = persistent_rdd_ids(spark)
    res = out.localCheckpoint()
    block_ids = persistent_rdd_ids(spark) - seen
    drop_ivf_index(spark, name)
    return tag_cached_inputs(res, RddBlockHandle(spark, block_ids))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=NEARDUP_THRESHOLD)


_PREP_CTE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT vec_id, v, list_dot_product(v, v) AS norm2 FROM e)
"""

ORACLE_KNN_COSINE = (
    _PREP_CTE
    + f""",
q AS (SELECT vec_id AS query_id, v AS qv, norm2 AS qnorm2 FROM p
      WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (SELECT query_id, c.vec_id,
                  round(list_dot_product(qv, c.v) / sqrt(qnorm2 * c.norm2), 6) AS cosine
           FROM q CROSS JOIN p c WHERE query_id <> c.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id ASC) AS rn
      FROM scored)
SELECT query_id, vec_id, cosine, rn FROM r WHERE rn <= {TOP_K}
"""
)

_BUCKET_SQL = " + ".join(
    f"(CASE WHEN v[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)" for i in range(ANN_BITS)
)
_PROBES_SQL = "[bucket, " + ", ".join(
    f"xor(bucket, {1 << j})" for j in range(ANN_BITS)
) + "]"

ORACLE_KNN_ANN = (
    _PREP_CTE
    + f""",
b AS (SELECT vec_id, v, norm2, {_BUCKET_SQL} AS bucket FROM p),
q AS (SELECT vec_id AS query_id, qv, qnorm2, unnest(probes) AS bucket
      FROM (SELECT vec_id, v AS qv, norm2 AS qnorm2,
                   list_distinct({_PROBES_SQL}) AS probes
            FROM b WHERE vec_id % {QUERY_STRIDE} = 0)),
scored AS (SELECT query_id, c.vec_id,
                  round(list_dot_product(qv, c.v) / sqrt(qnorm2 * c.norm2), 6) AS cosine
           FROM q JOIN b c USING (bucket) WHERE query_id <> c.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id ASC) AS rn
      FROM scored)
SELECT query_id, vec_id, cosine, rn FROM r WHERE rn <= {TOP_K}
"""
)

ORACLE_NEARDUP = (
    _PREP_CTE
    + f""",
b AS (SELECT vec_id, v, norm2, {_BUCKET_SQL} AS bucket FROM p),
pr AS (SELECT vec_id AS doc_a, unnest(probes) AS bucket
       FROM (SELECT vec_id, list_distinct({_PROBES_SQL}) AS probes FROM b)),
cand AS (SELECT DISTINCT pr.doc_a, c.vec_id AS doc_b
         FROM pr JOIN b c USING (bucket) WHERE pr.doc_a < c.vec_id),
scored AS (SELECT doc_a, doc_b,
                  round(list_dot_product(a.v, bb.v)
                        / sqrt(a.norm2 * bb.norm2), 6) AS cosine
           FROM cand JOIN p a ON cand.doc_a = a.vec_id
                     JOIN p bb ON cand.doc_b = bb.vec_id)
SELECT doc_a, doc_b, cosine FROM scored WHERE cosine >= {NEARDUP_THRESHOLD}
"""
)

ORACLE_KNN_IVF = (
    _PREP_CTE
    + f""",
c AS (SELECT vec_id AS cid, v AS cv, norm2 AS cn FROM p
      ORDER BY vec_id LIMIT {IVF_CELLS}),
cellscore AS (SELECT p.vec_id, p.v, p.norm2, c.cid,
                     round(list_dot_product(p.v, c.cv)
                           / sqrt(p.norm2 * c.cn), 6) AS ccos
              FROM p CROSS JOIN c),
ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                        ORDER BY ccos DESC, cid ASC) AS cr
           FROM cellscore),
corpus AS (SELECT vec_id, v, norm2, cid AS cell FROM ranked WHERE cr = 1),
qprobe AS (SELECT vec_id AS query_id, v AS qv, norm2 AS qnorm2, cid AS cell
           FROM ranked WHERE cr <= {IVF_PROBE} AND vec_id % {QUERY_STRIDE} = 0),
scored AS (SELECT query_id, c2.vec_id,
                  round(list_dot_product(qv, c2.v) / sqrt(qnorm2 * c2.norm2), 6) AS cosine
           FROM qprobe JOIN corpus c2 USING (cell)
           WHERE query_id <> c2.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id ASC) AS rn
      FROM scored)
SELECT query_id, vec_id, cosine, rn FROM r WHERE rn <= {TOP_K}
"""
)

def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization under the oracle gate (round 14;
    operators/similarity.py::quantize_embeddings): per-vector
    ``scale = max|x|``, codes ``round(x/scale*127)`` — the 4× memory
    cut that keeps a 100 TB embedding corpus ANN-searchable in RAM.
    Pure whole-stage-codegen projection (two transform lambdas + an
    array_max; no UDF, no shuffle). Fails closed in-query unless every
    code is within [-127, 127] AND every element re-expands to within
    the quantization bound scale/254 (+ float slack) of its source —
    the two properties the downstream int8 dot products rely on. The
    oracle recomputes scale and the code-sum/min/max per vector with
    DuckDB list lambdas (both sides promote the float32 inputs to
    double BEFORE any arithmetic, so the rounding is bit-identical)."""
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        quantize_embeddings,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb, "embedding")
    bad = q.where(
        F.expr(
            "exists(codes, c -> c > 127 OR c < -127) OR ("
            "scale > 0d AND exists(zip_with(embedding, codes, "
            "(x, c) -> abs(cast(x as double) - cast(c as double) * scale "
            "/ 127.0d)), e -> e > scale / 254.0d * 1.0000001d + 1e-12))"
        )
    ).count()
    if bad:
        raise AssertionError(
            f"int8 quantization violated its bound on {bad} vectors"
        )
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale6"),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda a, c: a + c
        ).alias("code_sum"),
        F.array_min("codes").alias("code_min"),
        F.array_max("codes").alias("code_max"),
    )


ORACLE_EMBEDDING_QUANTIZE = """
WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS s,
         embedding
  FROM embeddings),
c AS (
  SELECT vec_id, s,
         CASE WHEN s = 0 THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding,
                   x -> round(x::DOUBLE / s * 127.0)::INT) END AS codes
  FROM q)
SELECT vec_id, round(s, 6) AS scale6,
       list_aggregate(codes, 'sum')::BIGINT AS code_sum,
       list_aggregate(codes, 'min')::INT AS code_min,
       list_aggregate(codes, 'max')::INT AS code_max
FROM c
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    c = label_centroids(emb)
    return c.select(
        "label", "pos", F.round("mean_val", 9).alias("mean_val"), "n_vectors"
    )


# float32 widened to double before avg on both engines; rounded to the
# comparison precision (1e-9) to absorb summation-order ulps.
ORACLE_LABEL_CENTROIDS = """
WITH pe AS (SELECT label, i - 1 AS pos, embedding[i] AS v
            FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i))
SELECT label, pos::INT AS pos, round(AVG(v), 9) AS mean_val,
       COUNT(*) AS n_vectors
FROM pe GROUP BY label, pos
"""

def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from optimal_parallel_fp_growth_spark.operators.clustering import kmeans_assign

    return kmeans_assign(load_table(spark, sf_dir, "embeddings"), impl="sql")


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from optimal_parallel_fp_growth_spark.operators.clustering import semdedup

    return semdedup(
        load_table(spark, sf_dir, "embeddings"),
        threshold=NEARDUP_THRESHOLD,
        impl="sql",
    )


def q_semdedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-k twin of ``semdedup``: the sf1 scale probe (BASELINE.md
    §sf1) measured pinned k=8 trending quadratic (cell sizes grow with
    the corpus, pair volume with their square) while ``k=None`` keeps
    cells at ``KMEANS_TARGET_CELL`` and scaled 1.9× for 10× data — this
    entry keeps the scale default under driver verification."""
    from optimal_parallel_fp_growth_spark.operators.clustering import semdedup

    return semdedup(
        load_table(spark, sf_dir, "embeddings"),
        threshold=NEARDUP_THRESHOLD,
        k=None,
        impl="sql",
    )


def q_kmeans_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-k twin of ``kmeans_clusters``: ``k=None`` derives the
    cluster count from the corpus size (``kmeans_k_for`` — the scale
    default that keeps per-cluster size flat as the corpus grows), so
    the driver exercises the 100-TB operating point, not just the
    pinned-k one."""
    from optimal_parallel_fp_growth_spark.operators.clustering import kmeans_assign

    return kmeans_assign(
        load_table(spark, sf_dir, "embeddings"), k=None, impl="sql"
    )


def q_kmeans_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/BLAS deployment path under driver verification: identical
    auto-k setup to ``kmeans_auto`` but with ``impl="arrow"`` pinned, so
    the 31×-at-sf10 matmul assignment (``_assign_arrow``) runs against
    the SAME DuckDB oracle as the SQL path — cluster choice and round-6
    dist2 are reassociation-stable (pinned by
    ``test_arrow_assignment_matches_sql``), so the oracle transfers."""
    from optimal_parallel_fp_growth_spark.operators.clustering import kmeans_assign

    return kmeans_assign(
        load_table(spark, sf_dir, "embeddings"), k=None, impl="arrow"
    )


def q_semdedup_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow twin of ``semdedup_auto`` (Gram-matmul within-cell prune +
    matmul assignment, 29× at sf10) against the same oracle —
    keep/drop decisions are made on the same round-6 cosines
    (``test_semdedup_arrow_matches_sql``)."""
    from optimal_parallel_fp_growth_spark.operators.clustering import semdedup

    return semdedup(
        load_table(spark, sf_dir, "embeddings"),
        threshold=NEARDUP_THRESHOLD,
        k=None,
        impl="arrow",
    )


def _oracle_kmeans_cte(k: int | str, n_iter: int) -> str:
    """Unrolled-Lloyd CTE chain mirroring operators/clustering.py
    stage-for-stage: first-k-by-id seeds, per-iteration
    round(avg, 9) centroids with empty-cluster carry-over, assignment
    by round(|v|²−2·v·c+|c|², 6) with centroid-id tiebreak. Ends with
    ``afin(vec_id, v, norm2, cid, dist2)`` — the final assignment."""

    def assign(name: str, cents: str) -> str:
        return f"""
{name} AS (
  SELECT vec_id, v, norm2, cid, dist2 FROM (
    SELECT p.vec_id, p.v, p.norm2, c.cid,
           round(p.norm2 - 2 * list_dot_product(p.v, c.cv) + c.cn, 6) AS dist2,
           row_number() OVER (PARTITION BY p.vec_id
                              ORDER BY round(p.norm2 - 2 * list_dot_product(p.v, c.cv) + c.cn, 6),
                                       c.cid) AS rn
    FROM p CROSS JOIN {cents} c)
  WHERE rn = 1)"""

    parts = [
        f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT vec_id, v, list_dot_product(v, v) AS norm2 FROM e),
c0 AS (SELECT vec_id AS cid, v AS cv, norm2 AS cn FROM p
       ORDER BY vec_id LIMIT {k})"""
    ]
    for i in range(1, n_iter + 1):
        parts.append("," + assign(f"a{i}", f"c{i - 1}"))
        parts.append(
            f""",
m{i} AS (SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS val
         FROM a{i}),
mm{i} AS (SELECT cid, pos, round(avg(val), 9) AS val
          FROM m{i} GROUP BY cid, pos),
cl{i} AS (SELECT cid, generate_subscripts(cv, 1) AS pos, unnest(cv) AS val
          FROM c{i - 1}),
c{i} AS (SELECT cid, cv, list_dot_product(cv, cv) AS cn FROM (
           SELECT cl.cid, list(coalesce(mm.val, cl.val) ORDER BY cl.pos) AS cv
           FROM cl{i} cl LEFT JOIN mm{i} mm
             ON cl.cid = mm.cid AND cl.pos = mm.pos
           GROUP BY cl.cid))"""
        )
    parts.append("," + assign("afin", f"c{n_iter}"))
    return "".join(parts)


from optimal_parallel_fp_growth_spark.operators.clustering import (  # noqa: E402
    KMEANS_ITER,
    KMEANS_K,
    KMEANS_MAX_K,
    KMEANS_TARGET_CELL,
)

ORACLE_KMEANS = (
    _oracle_kmeans_cte(KMEANS_K, KMEANS_ITER)
    + """
SELECT vec_id, cid AS cluster, dist2 FROM afin
"""
)

# kmeans_k_for as SQL: ceil(n / target_cell) clamped to [2, max_k],
# evaluated by DuckDB as a scalar-subquery LIMIT on the seed CTE — the
# oracle stays exact at every sf without baking in a row count.
_AUTO_K_LIMIT = (
    f"(SELECT greatest(2, least({KMEANS_MAX_K}, "
    f"CAST(ceil(count(*) / {KMEANS_TARGET_CELL}.0) AS BIGINT))) FROM p)"
)

ORACLE_KMEANS_AUTO = (
    _oracle_kmeans_cte(_AUTO_K_LIMIT, KMEANS_ITER)
    + """
SELECT vec_id, cid AS cluster, dist2 FROM afin
"""
)

_SEMDEDUP_TAIL = f""",
dropped AS (SELECT DISTINCT b.vec_id
            FROM afin a JOIN afin b
              ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v)
                        / sqrt(a.norm2 * b.norm2), 6) >= {NEARDUP_THRESHOLD})
SELECT a.vec_id, a.cid AS cluster, (d.vec_id IS NULL) AS kept
FROM afin a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""

ORACLE_SEMDEDUP = _oracle_kmeans_cte(KMEANS_K, KMEANS_ITER) + _SEMDEDUP_TAIL

ORACLE_SEMDEDUP_AUTO = _oracle_kmeans_cte(_AUTO_K_LIMIT, KMEANS_ITER) + _SEMDEDUP_TAIL

HYP_SEED = 9


def q_knn_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane multi-probe ANN (same candidate contract as
    `knn_ann`, decorrelated buckets); oracle embeds the same seeded
    ±1 plane matrix."""
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        ann_topk_hyperplane,
    )

    emb, q = _emb_and_queries(spark, sf_dir)
    return ann_topk_hyperplane(emb, q, k=TOP_K, bits=ANN_BITS, seed=HYP_SEED)


def _hyp_bucket_sql(prefix: str = "v") -> str:
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        hyperplane_planes,
    )

    planes = hyperplane_planes(ANN_BITS, 64, HYP_SEED)
    terms = []
    for j, row in enumerate(planes):
        lits = "[" + ", ".join(repr(float(x)) for x in row) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({prefix}, {lits}) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


HN_LO = 0.2
HN_HI = 0.45


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: top-k per query among hyperplane-bucket
    candidates whose exact cosine sits in the informative
    [0.2, 0.45] band (the synthetic corpus tops out near 0.51, so the
    band is genuinely sub-near-dup)."""
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        hard_negatives,
    )

    emb, q = _emb_and_queries(spark, sf_dir)
    return hard_negatives(
        emb, q, lo=HN_LO, hi=HN_HI, k=TOP_K, bits=ANN_BITS, seed=HYP_SEED
    )


def _oracle_hard_negatives() -> str:
    return f"""
{_PREP_CTE.rstrip()},
b AS (SELECT vec_id, v, norm2, {_hyp_bucket_sql()} AS bucket FROM p),
q AS (SELECT vec_id AS query_id, qv, qnorm2, unnest(probes) AS bucket
      FROM (SELECT vec_id, v AS qv, norm2 AS qnorm2,
                   list_distinct({_PROBES_SQL}) AS probes
            FROM b WHERE vec_id % {QUERY_STRIDE} = 0)),
scored AS (SELECT query_id, c.vec_id,
                  round(list_dot_product(qv, c.v) / sqrt(qnorm2 * c.norm2), 6) AS cosine
           FROM q JOIN b c USING (bucket) WHERE query_id <> c.vec_id),
banded AS (SELECT * FROM scored WHERE cosine >= {HN_LO} AND cosine <= {HN_HI}),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id ASC) AS rn
      FROM banded)
SELECT query_id, vec_id, cosine, rn FROM r WHERE rn <= {TOP_K}
"""


RP_DIM = 8
RP_SEED = 5


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL sign-matrix projection 64→8 dims, long layout (vec_id, pos,
    val rounded to 1e-6) so the float compare is oracle-safe. The
    DuckDB twin embeds the SAME seeded sign matrix as literals, so the
    comparison pins the whole transform including R."""
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        random_projection,
    )

    proj = random_projection(
        load_table(spark, sf_dir, "embeddings"), RP_DIM, seed=RP_SEED
    )
    return proj.select(
        "vec_id", F.posexplode("proj").alias("pos", "val")
    ).select("vec_id", "pos", F.round("val", 6).alias("val"))


def _rp_matrix_sql() -> str:
    """The same R as random_projection(seed=RP_SEED) — numpy is the
    single source of truth; literals are exact (±1/sqrt(8) renders as
    repr of the double)."""
    import numpy as np

    rng = np.random.default_rng(RP_SEED)
    scale = 1.0 / float(np.sqrt(RP_DIM))
    R = rng.choice((-scale, scale), size=(RP_DIM, 64))
    rows = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in row) + "]" for row in R
    )
    return "[" + rows + "]"


ORACLE_RANDOM_PROJECTION = f"""
WITH p AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
r AS (SELECT {_rp_matrix_sql()} AS m),
proj AS (SELECT vec_id, g.pos - 1 AS pos,
                round(list_dot_product(v, m[g.pos]), 6) AS val
         FROM p, r, LATERAL (SELECT unnest(range(1, {RP_DIM} + 1)) AS pos) g)
SELECT vec_id, pos::INT AS pos, val FROM proj
"""


ORACLE_KNN_HYPERPLANE_TEMPLATE = """
{prep},
b AS (SELECT vec_id, v, norm2, {bucket} AS bucket FROM p),
q AS (SELECT vec_id AS query_id, qv, qnorm2, unnest(probes) AS bucket
      FROM (SELECT vec_id, v AS qv, norm2 AS qnorm2,
                   list_distinct({probes}) AS probes
            FROM b WHERE vec_id % {stride} = 0)),
scored AS (SELECT query_id, c.vec_id,
                  round(list_dot_product(qv, c.v) / sqrt(qnorm2 * c.norm2), 6) AS cosine
           FROM q JOIN b c USING (bucket) WHERE query_id <> c.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id ASC) AS rn
      FROM scored)
SELECT query_id, vec_id, cosine, rn FROM r WHERE rn <= {k}
"""


def _oracle_knn_hyperplane() -> str:
    return ORACLE_KNN_HYPERPLANE_TEMPLATE.format(
        prep=_PREP_CTE.rstrip(),
        bucket=_hyp_bucket_sql(),
        probes=_PROBES_SQL,
        stride=QUERY_STRIDE,
        k=TOP_K,
    )


VEC_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "random_projection": q_random_projection,
    "knn_hyperplane": q_knn_hyperplane,
    "hard_negatives": q_hard_negatives,
    "knn_cosine": q_knn_cosine,
    "knn_ann": q_knn_ann,
    "knn_ivf": q_knn_ivf,
    "knn_ivf_index": q_knn_ivf_index,
    "embedding_neardup": q_embedding_neardup,
    "embedding_quantize": q_embedding_quantize,
    "label_centroids": q_label_centroids,
    "kmeans_clusters": q_kmeans,
    "kmeans_auto": q_kmeans_auto,
    "kmeans_arrow": q_kmeans_arrow,
    "semdedup": q_semdedup,
    "semdedup_auto": q_semdedup_auto,
    "semdedup_arrow": q_semdedup_arrow,
}

VEC_ORACLES: dict[str, str] = {
    "random_projection": ORACLE_RANDOM_PROJECTION,
    "knn_hyperplane": _oracle_knn_hyperplane(),
    "hard_negatives": _oracle_hard_negatives(),
    "knn_cosine": ORACLE_KNN_COSINE,
    "knn_ann": ORACLE_KNN_ANN,
    "knn_ivf": ORACLE_KNN_IVF,
    # identical construction over the same corpus → same oracle
    "knn_ivf_index": ORACLE_KNN_IVF,
    "embedding_neardup": ORACLE_NEARDUP,
    "embedding_quantize": ORACLE_EMBEDDING_QUANTIZE,
    "label_centroids": ORACLE_LABEL_CENTROIDS,
    "kmeans_clusters": ORACLE_KMEANS,
    "kmeans_auto": ORACLE_KMEANS_AUTO,
    "kmeans_arrow": ORACLE_KMEANS_AUTO,
    "semdedup": ORACLE_SEMDEDUP,
    "semdedup_auto": ORACLE_SEMDEDUP_AUTO,
    "semdedup_arrow": ORACLE_SEMDEDUP_AUTO,
}
