"""Distributed Lloyd k-means and SemDeDup-style semantic deduplication
over the ``embeddings`` table (LLM-curation north star; no reference
counterpart — the reference mines itemsets only, cf.
``epfp/FPGrowthCore.scala``).

``kmeans_assign`` is deliberately the deterministic, oracle-checkable
variant of Lloyd's algorithm rather than a wrapper over
``pyspark.ml.clustering.KMeans`` (whose k-means|| init is seeded-random
and whose BLAS summation order is not reproducible in an external SQL
engine). The dataflow is the one that survives 100 TB:

- Centroids live on the DRIVER as ``k × dim`` rounded doubles (a few
  KB) and enter each iteration as broadcast literals — the corpus is
  never collected.
- One iteration = one scan of the corpus: assign each vector to its
  nearest centroid (argmin over k literal arrays, pure codegen'd
  expressions, no shuffle), then ONE shuffle of ``k × dim`` partial
  (cluster, pos, sum, count) rows — ``posexplode`` + ``avg`` with
  map-side partial aggregation, identical shape to
  ``similarity.label_centroids``.
- Iteration count is a fixed small hyper-parameter (Lloyd converges in
  quality, not exactness, after a handful of rounds at web scale), so
  the whole job is ``n_iter + 1`` scans and ``n_iter`` tiny collects.

Cross-engine exactness (the DuckDB oracle reproduces assignments
bit-for-bit): seeds are the first ``k`` vectors by id; per-iteration
centroid coordinates are ``round(avg, 9)`` (the proven
``label_centroids`` parity recipe); distances compare as
``round(|v|² − 2·v·c + |c|², 6)`` with centroid-id tiebreak, every dot
product a left-to-right double fold on both engines; empty clusters
keep their previous centroid.

``semdedup`` composes the final k-means assignment with a
within-cluster pairwise cosine prune — the SemDeDup recipe (Abbas et
al. 2023, arXiv:2303.09540): a document is dropped when a smaller-id
document in the SAME cluster has cosine ≥ threshold. Clustering first
is what makes semantic dedup tractable at scale: the quadratic
candidate work is confined to one cluster at a time (choose ``k``
so n/k bounds the per-cluster pair volume), exactly like the LSH
buckets of ``dedup.minhash_lsh_pairs`` but in embedding space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.caching import tag_cached_inputs
from optimal_parallel_fp_growth_spark.functions.literals import (
    lit_double_array,
    lit_double_matrix,
    lit_long_array,
)
from optimal_parallel_fp_growth_spark.operators.similarity import _dot, _prepared

KMEANS_K = 8
KMEANS_ITER = 2
CENTROID_DECIMALS = 9
DIST_DECIMALS = 6

KMEANS_TARGET_CELL = 512  # docs per cluster the auto-k path aims at
KMEANS_MAX_K = 65536  # seed collect stays ≤ k × dim ≈ MBs at dim 64

# impl="auto" switches assignment to the Arrow/BLAS matmul when the
# per-row interpreted-HOF work (k·dim fold steps) crosses this line.
# Measured at sf0.1 (n=2000, dim=64, local[8], round 5): SQL assignment
# is linear in k (k=16: 2.6 s, k=64: 7.5 s, k=256: 28.9 s) while Arrow
# is flat (~0.7 s from k=16 up, ~parity at k=8 where Arrow transfer
# overhead balances the 512-step fold); sf10 auto-k measured 31×
# (BASELINE.md §sf10). k·dim = 1024 is the first decade where Arrow's
# win is unambiguous (≥3.5×) at dim 64.
ARROW_CROSSOVER = 1024


def _arrow_available() -> bool:
    try:  # the deployment containers ship these; degrade to SQL if not
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
    except ImportError:
        return False
    return True


def _resolve_impl(impl: str, k: int, dim: int) -> str:
    """``auto`` → ``arrow`` past the measured interpreted-HOF crossover
    (and when the Arrow stack is importable), else ``sql``. Explicit
    ``sql``/``arrow`` pass through — the oracle-checked queries pin
    ``sql`` for bit-exact fold order against the DuckDB twin."""
    if impl != "auto":
        return impl
    if k * dim >= ARROW_CROSSOVER and _arrow_available():
        return "arrow"
    return "sql"


def kmeans_k_for(
    n_corpus: int,
    target_cell_size: int = KMEANS_TARGET_CELL,
    min_k: int = 2,
    max_k: int = KMEANS_MAX_K,
) -> int:
    """Cluster count for a corpus of ``n_corpus`` vectors: ``k`` ≈
    n / target_cell_size (ceil), clamped to [min_k, max_k] — the
    ``ann_bits_for`` / ``ivf_cells_for`` recipe applied to k-means.
    SemDeDup's pairwise prune does Σ_c |c|² work, so a frozen ``k``
    goes quadratic as the corpus grows; deriving k from n keeps the
    expected per-cluster size (and hence per-cluster pair volume) flat
    at ``target_cell_size`` — the SemDeDup paper's own operating point
    (k = 110k over LAION-440M ≈ 4k docs/cluster, arXiv:2303.09540).
    ``max_k`` bounds the driver-side centroid state (k × dim doubles)
    and the per-iteration k × dim-row shuffle."""
    if n_corpus <= 0:
        return min_k
    k = -(-n_corpus // target_cell_size)  # ceil division
    return max(min_k, min(max_k, k))

# centroid: (cid, coords, norm2) — cid is the seed vector's id.
_Centroid = tuple[int, list[float], float]


def _fold_norm2(coords: list[float]) -> float:
    """Left-to-right ``acc + x·x`` double fold — the same IEEE sequence
    as the engines' ``F.aggregate(zip_with(...))`` / DuckDB
    ``list_dot_product(cv, cv)``."""
    acc = 0.0
    for x in coords:
        acc = acc + x * x
    return acc


def _dist2_sorted(
    coords: list[list[float]],
    norms: list[float],
    ids: list[int],
    id_field: str,
    id_type: str,
) -> Column:
    """Sorted ``(dist2, <id_field>)`` struct array scoring a row's
    ``v``/``norm2`` against every centroid — round(|v|² − 2·v·c +
    |c|², 6), same left-to-right fold per centroid as before.

    Built as ONE transform over an index sequence against matrix/array
    SQL-text literals (functions/literals.py) instead of one
    aggregate+zip_with expression pair per centroid: each HOF lambda
    costs ~20 ms of py4j traffic to CONSTRUCT and ``F.lit(list)`` one
    gateway round trip per element, so the per-centroid form spent
    more driver time building the plan each Lloyd iteration than the
    executors spent running it (guide §1.2). 3 lambdas total,
    independent of k; values, fold order, rounding and struct typing
    are unchanged."""
    if not coords:
        # F.sequence(1, 0) infers step -1 and yields [1, 0] — phantom
        # element_at probes on empty literals (ADVICE r17), where the
        # old per-centroid form produced an empty array. No caller may
        # score against zero centroids.
        raise ValueError("at least one centroid is required")
    cvs = lit_double_matrix(coords)
    cns = lit_double_array(norms)
    ids_arr = lit_long_array(ids)
    if id_type != "bigint":
        ids_arr = ids_arr.cast(f"array<{id_type}>")
    return F.array_sort(
        F.transform(
            F.sequence(F.lit(1), F.lit(len(coords))),
            lambda i: F.struct(
                F.round(
                    F.col("norm2")
                    - 2
                    * F.aggregate(
                        F.zip_with(
                            F.col("v"),
                            F.element_at(cvs, i),
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    + F.element_at(cns, i),
                    DIST_DECIMALS,
                ).alias("dist2"),
                F.element_at(ids_arr, i).alias(id_field),
            ),
        )
    )


def _assign(prepared: DataFrame, cents: list[_Centroid]) -> DataFrame:
    """(vec_id, v, norm2) + (cluster, dist2): nearest centroid by
    (dist2, cid) — argmin via array_sort over k scored structs, the
    ivf_topk cell-assignment shape: zero shuffles, no exchange."""
    # long, not the lit-default int: cluster ids are seed vec_ids and
    # the driver hasher is dtype-sensitive
    scored = _dist2_sorted(
        [cv for _, cv, _ in cents],
        [cn for _, _, cn in cents],
        [cid for cid, _, _ in cents],
        "cid",
        "bigint",
    )
    return prepared.withColumn("__c", scored[0]).select(
        "vec_id",
        "v",
        "norm2",
        F.col("__c.cid").alias("cluster"),
        F.col("__c.dist2").alias("dist2"),
    )


def _py_dist2(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc += d * d
    return acc


def _coarse_groups(
    cents: list[_Centroid], c: int, n_iter: int = 3
) -> list[tuple[list[float], float, list[_Centroid]]]:
    """Driver-side Lloyd over the k CENTROID vectors (k ≤ 65536 — a few
    MB): c coarse cells, deterministic first-c seeds, empty cells
    dropped. → [(coarse_coords, coarse_norm2, member_centroids)]."""
    coords = [cv for _, cv, _ in cents]
    seeds = [list(v) for v in coords[:c]]
    assign = [0] * len(cents)
    for _ in range(n_iter):
        for i, v in enumerate(coords):
            assign[i] = min(
                range(len(seeds)), key=lambda s: (_py_dist2(v, seeds[s]), s)
            )
        for s in range(len(seeds)):
            members = [coords[i] for i in range(len(coords)) if assign[i] == s]
            if members:
                seeds[s] = [sum(col) / len(members) for col in zip(*members)]
    groups = []
    for s in range(len(seeds)):
        members = [cents[i] for i in range(len(cents)) if assign[i] == s]
        if members:
            groups.append((seeds[s], _fold_norm2(seeds[s]), members))
    return groups


def _assign_two_level(
    prepared: DataFrame, cents: list[_Centroid], probe: int = 1
) -> DataFrame:
    """Approximate nearest-centroid assignment in O(√k) per row instead
    of O(k) — the IVF/two-level-codebook recipe the sf10 probe
    identified as the auto-k scale step (BASELINE.md §sf10): flat
    assignment is n·k, and with k ∝ n (the SemDeDup operating point)
    that is n²/cell.

    The k fine centroids are grouped into c ≈ √k coarse cells by a
    driver-side Lloyd over the centroids themselves; each vector argmins
    over the c coarse centroids, then over only the fine centroids of
    its ``probe`` nearest coarse cells (a when-chain — codegen evaluates
    just the matched branches, so per-row work is c + probe·k/c ≈
    (1+probe)·√k). Same zero-shuffle pure-codegen shape as ``_assign``;
    deterministic; boundary vectors may land in a neighbouring cell
    (raise ``probe`` to trade compute for recall, exactly like
    ``ivf_topk``'s n_probe)."""
    import math

    c = max(1, int(round(math.sqrt(len(cents)))))
    groups = _coarse_groups(cents, c)
    if len(groups) == 1:
        return _assign(prepared, cents)
    probe = max(1, min(probe, len(groups)))
    coarse_sorted = _dist2_sorted(
        [gc for gc, _gn, _m in groups],
        [gn for _gc, gn, _m in groups],
        list(range(len(groups))),
        "g",
        "int",
    )
    # The probe-nearest coarse ids MUST be materialized behind a
    # projection boundary before the when-chain touches them: the chain
    # references them ~c times, HOFs evaluate interpreted with no CSE,
    # and an inline reference would recompute the full c-fold coarse
    # argmin per branch test — measured to erase the entire two-level
    # win (the _doc_shingles lesson applied to centroids). The multi-
    # reference also keeps CollapseProject from re-inlining the alias.
    step1 = prepared.select(
        "vec_id", "v", "norm2", F.slice(coarse_sorted, 1, probe).alias("__cg")
    )
    fine_best = []
    for _g, (_gc, _gn, members) in enumerate(groups):
        fine_best.append(
            _dist2_sorted(
                [cv for _, cv, _ in members],
                [cn for _, _, cn in members],
                [cid for cid, _, _ in members],
                "cid",
                "bigint",
            )[0]
        )
    candidates = []
    for j in range(probe):
        gj = F.col("__cg")[j]["g"]
        expr = fine_best[-1]
        for g in range(len(groups) - 1):
            expr = F.when(gj == g, fine_best[g]).otherwise(expr)
        candidates.append(expr)
    best = F.array_sort(F.array(*candidates))[0]
    return step1.withColumn("__c", best).select(
        "vec_id",
        "v",
        "norm2",
        F.col("__c.cid").alias("cluster"),
        F.col("__c.dist2").alias("dist2"),
    )


def _assign_arrow(
    prepared: DataFrame, cents: list[_Centroid], with_v: bool = False
) -> DataFrame:
    """Arrow/numpy twin of ``_assign``: one BLAS matmul per batch
    (dist² = |v|² − 2·V·Cᵀ + |c|², rounded like the SQL path, argmin
    with cid tiebreak via a masked min). Per-row cost is a dense
    n×k×d matmul instead of k interpreted HOF folds — the measured
    fast path when k is large; the SQL path stays the oracle-exact
    default (matmul reassociates the sum, so last-ulp dist2 values can
    differ before rounding; cluster choice is round(6)-stable)."""
    import numpy as np
    import pandas as pd

    C = np.array([cv for _, cv, _ in cents], dtype=np.float64)
    cn = np.array([n for _, _, n in cents], dtype=np.float64)
    cids = np.array([cid for cid, _, _ in cents], dtype=np.int64)
    sentinel = cids.max() + 1
    schema = (
        "vec_id long, v array<double>, norm2 double, cluster long, dist2 double"
        if with_v
        else "vec_id long, cluster long, dist2 double"
    )

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy())
            n2 = pdf["norm2"].to_numpy(dtype=np.float64)
            D = np.round(n2[:, None] - 2.0 * (V @ C.T) + cn[None, :], DIST_DECIMALS)
            dmin = D.min(axis=1, keepdims=True)
            cand = np.where(D == dmin, cids[None, :], sentinel)
            out = {
                "vec_id": pdf["vec_id"],
                "cluster": cand.min(axis=1),
                "dist2": dmin[:, 0],
            }
            if with_v:
                out = {
                    "vec_id": pdf["vec_id"],
                    "v": pdf["v"],
                    "norm2": pdf["norm2"],
                    "cluster": cand.min(axis=1),
                    "dist2": dmin[:, 0],
                }
            yield pd.DataFrame(out)

    return prepared.mapInPandas(fn, schema)


def _seed_centroids(prepared: DataFrame, k: int) -> list[_Centroid]:
    rows = prepared.orderBy("vec_id").limit(k).collect()  # tiny: k × dim
    return [(int(r.vec_id), list(r.v), _fold_norm2(list(r.v))) for r in rows]


def _pick_assign(two_level: bool, probe: int, impl: str, with_v: bool):
    if impl not in ("sql", "arrow"):
        raise ValueError(f"impl must be 'sql' or 'arrow', got {impl!r}")
    if impl == "arrow":
        # BLAS matmul handles full k directly; two_level is a SQL-path
        # mitigation and is ignored here
        return lambda p, c: _assign_arrow(p, c, with_v=with_v)
    if two_level:
        return lambda p, c: _assign_two_level(p, c, probe)
    return _assign


def _lloyd_centroids(
    prepared: DataFrame,
    k: int,
    n_iter: int,
    two_level: bool = False,
    probe: int = 1,
    impl: str = "sql",
) -> tuple[list[_Centroid], str]:
    """Run ``n_iter`` Lloyd updates from the deterministic seeds and
    return ``(final centroids, resolved impl)`` — ``impl="auto"``
    resolves here (first point where both k and dim are known) so the
    caller's final assignment uses the same engine as the updates."""
    cents = _seed_centroids(prepared, k)
    if not cents:
        raise ValueError("k-means needs a non-empty corpus")
    dim = len(cents[0][1])
    impl = _resolve_impl(impl, k, dim)
    assign_fn = _pick_assign(two_level, probe, impl, with_v=True)
    for _ in range(n_iter):
        means = (
            assign_fn(prepared, cents)
            .select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), CENTROID_DECIMALS).alias("val"))
            .collect()
        )  # ≤ k × dim rows — the only data leaving the cluster
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(int(r.cluster), {})[int(r.pos)] = float(r.val)
        nxt: list[_Centroid] = []
        for cid, coords, _cn in cents:
            got = by_cid.get(cid)
            # empty cluster keeps its previous centroid
            new = coords if got is None else [got[p] for p in range(dim)]
            nxt.append((cid, new, _fold_norm2(new)))
        cents = nxt
    return cents, impl


def kmeans_assign(
    emb: DataFrame,
    k: int | None = KMEANS_K,
    n_iter: int = KMEANS_ITER,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    two_level: bool = False,
    probe: int = 1,
    impl: str = "auto",
) -> DataFrame:
    """Deterministic Lloyd k-means: ``n_iter`` centroid updates from
    first-``k``-by-id seeds, then the final assignment.
    → (vec_id, cluster, dist2); ``cluster`` is the seed vector's id.
    ``k=None`` derives the cluster count from the corpus size via
    ``kmeans_k_for`` (one extra count job).

    ``impl`` picks the assignment engine; the default ``"auto"``
    dispatches on the measured crossover (``ARROW_CROSSOVER``) so a
    user calling ``kmeans_assign(k=None)`` at scale gets the fast path
    with no knob:

    - ``"arrow"``: each assignment pass is one Arrow-batched BLAS
      matmul (``_assign_arrow``) — same cluster choice (rounding-
      stable), dense-compute speed; measured 31× at sf10 auto-k.
    - ``"sql"``: flat codegen'd fold — bit-exact left-to-right order
      against the DuckDB twin; what the oracle-checked queries pin.
    - ``two_level=True`` (SQL path only): coarse→fine codebook
      assignment, per-row O(k) → O((1+probe)·√k); approximate at cell
      boundaries (raise ``probe`` for recall)."""
    if k is not None and k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    prepared = _prepared(emb, id_col, vec_col)
    if n_iter > 0 or k is None:
        prepared.persist()
    if k is None:
        k = kmeans_k_for(prepared.count())
    cents, impl = _lloyd_centroids(prepared, k, n_iter, two_level, probe, impl)
    if prepared.is_cached:
        prepared.unpersist()
    assign_fn = _pick_assign(two_level, probe, impl, with_v=False)
    return assign_fn(prepared, cents).select("vec_id", "cluster", "dist2")


def _semdedup_prune_arrow(assigned: DataFrame, threshold: float) -> DataFrame:
    """Within-cluster prune as one Gram matrix per cell: cosine =
    round((V·Vᵀ)/√(n2⊗n2), 6) on id-sorted rows, drop every column with
    a ≥-threshold entry strictly above the diagonal — the exact
    keep-smallest-id rule of the SQL pair join, decided by the same
    rounded values. Cells are ~target_cell_size rows, so each Gram
    matrix is tiny; the one shuffle is the cluster groupBy (the SQL
    path shuffles the same data twice, once per join side)."""
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        order = pdf["vec_id"].to_numpy().argsort()
        ids = pdf["vec_id"].to_numpy()[order]
        V = np.stack(pdf["v"].to_numpy()[order])
        n2 = pdf["norm2"].to_numpy(dtype=np.float64)[order]
        C = np.round((V @ V.T) / np.sqrt(np.outer(n2, n2)), DIST_DECIMALS)
        dropped = np.triu(C >= threshold, k=1).any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"].to_numpy()[order],
                "kept": ~dropped,
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        fn, "vec_id long, cluster long, kept boolean"
    )


def semdedup(
    emb: DataFrame,
    threshold: float = 0.4,
    k: int | None = KMEANS_K,
    n_iter: int = KMEANS_ITER,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "auto",
) -> DataFrame:
    """SemDeDup: k-means-cluster the embeddings, then inside each
    cluster drop every vector that has a smaller-id neighbour with
    cosine ≥ ``threshold``. → (vec_id, cluster, kept).

    The pairwise join is equi-keyed on ``cluster``, so candidate volume
    is Σ_c |c|² — bounded by choosing ``k`` ≈ n / target_cluster_size
    (the SemDeDup paper runs k = 110k on LAION-440M, same ratio).
    ``k=None`` (the scale default) derives exactly that via
    ``kmeans_k_for``, so per-cluster pair volume stays flat as the
    corpus grows. The keep-smallest-id rule is the greedy tier of
    ``dedup.deduped_corpus``; feed the pairs to
    ``dedup.connected_components`` instead when cluster-canonical
    survivors are needed. ``impl="arrow"`` runs every k-means pass as a
    BLAS matmul (see ``kmeans_assign``) — at 100 TB with auto-k this is
    the difference between the clustering stage dominating and it
    disappearing under the pairwise prune (BASELINE.md round-4
    addendum), and the prune becomes one Gram matmul per cell
    (``applyInPandas`` grouped on cluster) instead of an interpreted
    per-pair cosine join — same round-6 keep/drop decisions. The
    default ``impl="auto"`` picks arrow past the measured
    ``ARROW_CROSSOVER`` (the oracle-checked queries pin ``sql``)."""
    prepared = _prepared(emb, id_col, vec_col)
    prepared.persist()
    if k is None:
        k = kmeans_k_for(prepared.count())
    cents, impl = _lloyd_centroids(prepared, k, n_iter, impl=impl)
    assigned = _pick_assign(False, 1, impl, with_v=True)(prepared, cents)
    if impl == "arrow":
        return tag_cached_inputs(
            _semdedup_prune_arrow(assigned, threshold), prepared
        )
    a = assigned.select(
        "cluster",
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("norm2").alias("na"),
    )
    b = assigned.select(
        "cluster",
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("norm2").alias("nb"),
    )
    cos = F.round(
        _dot(F.col("va"), F.col("vb")) / F.sqrt(F.col("na") * F.col("nb")),
        DIST_DECIMALS,
    )
    dropped = (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cos >= threshold)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    out = (
        assigned.select("vec_id", "cluster")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
        )
    )
    # the returned plan reads `prepared` three times (both pair sides +
    # the output base) — keep it cached, caller releases after
    # materializing (functions/caching.py contract)
    return tag_cached_inputs(out, prepared)
