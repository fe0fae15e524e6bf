"""Lloyd k-means + SemDeDup (operators/clustering.py): differential
test against a pure-Python Lloyd replica, seed/empty-cluster edge
cases, and the SemDeDup drop rule verified by brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.caching import release_cached_inputs
from optimal_parallel_fp_growth_spark.operators.clustering import (
    kmeans_assign,
    semdedup,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def _py_lloyd(vecs: dict[int, list[float]], k: int, n_iter: int):
    """Reference Lloyd with the operator's exact rules: first-k-by-id
    seeds, round(dist2, 6) + cid tiebreak, round(avg, 9) centroids,
    empty clusters carry the previous centroid."""

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    ids = sorted(vecs)
    cents = {i: list(vecs[i]) for i in ids[:k]}

    def assign():
        out = {}
        for vid in ids:
            v = vecs[vid]
            n2 = dot(v, v)
            best = min(
                (round(n2 - 2 * dot(v, cv) + dot(cv, cv), 6), cid)
                for cid, cv in cents.items()
            )
            out[vid] = (best[1], best[0])
        return out

    for _ in range(n_iter):
        a = assign()
        members: dict[int, list[int]] = {}
        for vid, (cid, _d) in a.items():
            members.setdefault(cid, []).append(vid)
        for cid in cents:
            vids = members.get(cid)
            if not vids:
                continue  # carry previous centroid
            dim = len(cents[cid])
            cents[cid] = [
                round(sum(vecs[v][p] for v in vids) / len(vids), 9)
                for p in range(dim)
            ]
    return assign(), cents


@pytest.fixture(scope="module")
def tiny_vectors(spark):
    rows = [
        (0, [0.0, 0.0]),
        (1, [4.0, 4.1]),
        (2, [0.3, -0.2]),
        (3, [4.2, 3.9]),
        (4, [-3.8, 4.0]),
        (5, [0.1, 0.2]),
        (6, [-4.1, 4.2]),
        (7, [4.0, 4.0]),
        (8, [-4.0, 3.8]),
    ]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_kmeans_matches_python_reference(tiny_vectors):
    rows, df = tiny_vectors
    vecs = {vid: v for vid, v in rows}
    for n_iter in (0, 1, 3):
        got = {
            r.vec_id: (r.cluster, r.dist2)
            for r in kmeans_assign(df, k=3, n_iter=n_iter).collect()
        }
        want, _ = _py_lloyd(vecs, 3, n_iter)
        assert got == want, f"n_iter={n_iter}"


def test_kmeans_niter0_is_seed_assignment(tiny_vectors):
    _, df = tiny_vectors
    out = kmeans_assign(df, k=3, n_iter=0)
    # seeds are their own nearest centroid at distance 0
    seed_rows = {r.vec_id: r for r in out.where("vec_id < 3").collect()}
    for vid, r in seed_rows.items():
        assert r.cluster == vid and r.dist2 == 0.0


def test_kmeans_cost_nonincreasing(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    costs = [
        kmeans_assign(emb, k=8, n_iter=i)
        .agg(F.sum("dist2").alias("c"))
        .collect()[0]
        .c
        for i in (0, 1, 2)
    ]
    assert costs[0] >= costs[1] >= costs[2]
    assert costs[2] < costs[0]  # it actually moved


def test_kmeans_empty_cluster_carries_previous_centroid(spark):
    # duplicate seed vectors: every point prefers cid 0 on the tie, so
    # cluster 1 is empty after the first assignment and must keep its
    # seed centroid instead of crashing or NaN-ing
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [0.0]), (2, [5.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r.cluster for r in kmeans_assign(df, k=2, n_iter=1).collect()}
    # after the update c0 = mean(0,0,5) = 5/3, c1 = carried [0.0]:
    # the two zero-vectors now prefer the carried centroid
    assert out == {0: 1, 1: 1, 2: 0}


def test_kmeans_param_validation(tiny_vectors):
    _, df = tiny_vectors
    with pytest.raises(ValueError, match="k must be"):
        kmeans_assign(df, k=0)
    with pytest.raises(ValueError, match="n_iter"):
        kmeans_assign(df, n_iter=-1)


def test_semdedup_drop_rule_brute_force(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    out = semdedup(emb, threshold=0.4, k=8, n_iter=2)
    rows = out.collect()
    release_cached_inputs(out)
    cluster = {r.vec_id: r.cluster for r in rows}
    kept = {r.vec_id: r.kept for r in rows}
    assert len(rows) == emb.count()  # one verdict per vector

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.select("vec_id", "embedding").collect()
    }

    def cos(a, b):
        d = n1 = n2 = 0.0
        for x, y in zip(a, b):
            d += x * y
            n1 += x * x
            n2 += y * y
        return round(d / (n1 * n2) ** 0.5, 6)

    by_cluster: dict[int, list[int]] = {}
    for vid, cid in cluster.items():
        by_cluster.setdefault(cid, []).append(vid)
    for cid, vids in by_cluster.items():
        vids.sort()
        for i, b in enumerate(vids):
            has_smaller_dup = any(
                cos(vecs[a], vecs[b]) >= 0.4 for a in vids[:i]
            )
            assert kept[b] == (not has_smaller_dup), (cid, b)


def test_semdedup_threshold_above_one_keeps_all(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    out = semdedup(emb, threshold=1.01, k=8, n_iter=1)
    assert out.where(~F.col("kept")).count() == 0
    release_cached_inputs(out)


def test_kmeans_k_for_bounds_cell_size():
    """The auto-k knob keeps expected cluster size flat as n grows
    (until the max_k clamp), so SemDeDup's Σ|c|² pair volume scales
    linearly with the corpus instead of quadratically."""
    from optimal_parallel_fp_growth_spark.operators.clustering import (
        KMEANS_MAX_K,
        KMEANS_TARGET_CELL,
        kmeans_k_for,
    )

    prev_k = 0
    for n in [0, 1, 100, 1_000, 10_000, 1_000_000, 10_000_000, 10**9, 10**11]:
        k = kmeans_k_for(n)
        assert k >= prev_k, "k must be monotone in n"
        prev_k = k
        assert 2 <= k <= KMEANS_MAX_K
        if n > 0 and k < KMEANS_MAX_K:
            # expected per-cell size never exceeds the target
            assert n / k <= KMEANS_TARGET_CELL
    # respects explicit clamps
    assert kmeans_k_for(10**9, max_k=128) == 128
    assert kmeans_k_for(5, target_cell_size=1, min_k=2) == 5


def test_kmeans_auto_k_runs_and_matches_explicit(spark, sf_small):
    """k=None derives k from the corpus count; at sf_small (500 rows,
    target 512) that is the min clamp k=2 — verify against explicit."""
    from optimal_parallel_fp_growth_spark.operators.clustering import kmeans_k_for

    emb = load_table(spark, sf_small, "embeddings")
    n = emb.count()
    expect_k = kmeans_k_for(n)
    auto = kmeans_assign(emb, k=None).orderBy("vec_id").collect()
    manual = kmeans_assign(emb, k=expect_k).orderBy("vec_id").collect()
    assert auto == manual
    assert len({r.cluster for r in auto}) <= expect_k


def test_semdedup_auto_k_bounds_observed_cells(spark, sf_small):
    """semdedup(k=None): every observed cluster stays within a small
    multiple of the target cell size (uniform-ish test embeddings)."""
    from optimal_parallel_fp_growth_spark.operators.clustering import (
        KMEANS_TARGET_CELL,
    )

    emb = load_table(spark, sf_small, "embeddings")
    out = semdedup(emb, threshold=0.9, k=None)
    sizes = [
        r.n for r in out.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    ]
    release_cached_inputs(out)
    assert sum(sizes) == emb.count()
    # generous skew slack: 8× the target expected size
    assert max(sizes) <= 8 * KMEANS_TARGET_CELL


def _blobs(spark, n_blobs=16, per_blob=12, dim=8):
    """Well-separated deterministic blobs: centers on a coarse integer
    lattice (spacing 100), points jittered ±0.5 — every vector is
    unambiguously nearest its own blob center, so approximate
    assignment has no boundary cases to miss."""
    rows = []
    vid = 0
    for b in range(n_blobs):
        center = [100.0 * ((b >> (d % 4)) & 1) + 10.0 * b if d == 0 else 100.0 * ((b >> (d % 4)) & 1) for d in range(dim)]
        for j in range(per_blob):
            jit = [((vid * 7 + d * 3 + j) % 10) / 10.0 - 0.5 for d in range(dim)]
            rows.append((vid, [c + e for c, e in zip(center, jit)]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_two_level_assignment_agrees_with_flat_on_blobs(spark):
    """On well-separated blobs the coarse→fine path has no boundary
    ambiguity: it must reproduce the flat assignment exactly (probe=1
    and probe=2), and be deterministic under repartitioning."""
    emb = _blobs(spark)
    flat = {r.vec_id: r.cluster for r in kmeans_assign(emb, k=16).collect()}
    p1 = {
        r.vec_id: r.cluster
        for r in kmeans_assign(emb, k=16, two_level=True).collect()
    }
    p2 = {
        r.vec_id: r.cluster
        for r in kmeans_assign(emb, k=16, two_level=True, probe=2).collect()
    }
    assert set(flat) == set(p1) == set(p2)
    n = len(flat)
    agree1 = sum(1 for v in flat if p1[v] == flat[v]) / n
    agree2 = sum(1 for v in flat if p2[v] == flat[v]) / n
    assert agree1 == 1.0, agree1
    assert agree2 == 1.0, agree2
    again = {
        r.vec_id: r.cluster
        for r in kmeans_assign(
            emb.repartition(13), k=16, two_level=True
        ).collect()
    }
    assert again == p1


def test_two_level_falls_back_flat_for_tiny_k(tiny_vectors):
    """k small enough that the coarse grouping collapses ⇒ the
    two-level path matches the exact flat assignment."""
    _, df = tiny_vectors
    flat = kmeans_assign(df, k=2).orderBy("vec_id").collect()
    two = (
        kmeans_assign(df, k=2, two_level=True)
        .orderBy("vec_id")
        .collect()
    )
    assert flat == two


def test_arrow_assignment_matches_sql(spark, sf_small):
    """impl='arrow' (BLAS matmul) must pick the same clusters as the
    SQL fold path — the round(6) grid absorbs matmul reassociation —
    and dist2 must agree to the rounding grain."""
    emb = load_table(spark, sf_small, "embeddings")
    sql_rows = {r.vec_id: (r.cluster, r.dist2)
                for r in kmeans_assign(emb, k=8).collect()}
    arrow_rows = {r.vec_id: (r.cluster, r.dist2)
                  for r in kmeans_assign(emb, k=8, impl="arrow").collect()}
    assert set(sql_rows) == set(arrow_rows)
    for vid, (c, d) in sql_rows.items():
        ac, ad = arrow_rows[vid]
        assert ac == c, (vid, c, ac)
        assert abs(ad - d) <= 1e-6, (vid, d, ad)


def test_arrow_impl_validation(tiny_vectors):
    _, df = tiny_vectors
    import pytest as _pytest

    with _pytest.raises(ValueError, match="impl"):
        kmeans_assign(df, k=2, impl="nope")


def test_semdedup_arrow_matches_sql(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    a = sorted(map(tuple, semdedup(emb, threshold=0.4, k=None).collect()))
    release_cached_inputs(None)
    b = sorted(
        map(tuple, semdedup(emb, threshold=0.4, k=None, impl="arrow").collect())
    )
    release_cached_inputs(None)
    assert a == b and a


def test_resolve_impl_auto_dispatch():
    """impl='auto' must pick arrow past the measured k*dim crossover
    (ARROW_CROSSOVER, sf0.1 round-5 measurement) and sql below it, so
    kmeans_assign(k=None) at scale takes the fast path with no knob."""
    from optimal_parallel_fp_growth_spark.operators.clustering import (
        ARROW_CROSSOVER,
        _resolve_impl,
    )

    dim = 64
    assert _resolve_impl("auto", 8, dim) == "sql"  # 512 < crossover
    assert _resolve_impl("auto", ARROW_CROSSOVER // dim, dim) == "arrow"
    assert _resolve_impl("auto", 1024, dim) == "arrow"
    # explicit settings pass through untouched
    assert _resolve_impl("sql", 1024, dim) == "sql"
    assert _resolve_impl("arrow", 2, dim) == "arrow"


def test_auto_impl_matches_pinned_sql(spark, sf_small):
    """Above the crossover the default engine switches to arrow; the
    assignment must still equal the pinned-sql path (round-6 grid)."""
    emb = load_table(spark, sf_small, "embeddings")
    # k=16, dim=64 -> k*dim=1024 == crossover -> auto resolves to arrow
    auto = {r.vec_id: r.cluster for r in kmeans_assign(emb, k=16).collect()}
    sql = {
        r.vec_id: r.cluster
        for r in kmeans_assign(emb, k=16, impl="sql").collect()
    }
    assert auto == sql and auto


def test_dist2_sorted_empty_centroids_raises(spark):
    """ADVICE r17: F.sequence(1, 0) yields [1, 0] (step -1), so an
    empty centroid list would score phantom entries — guard it."""
    import pytest as _pytest

    from optimal_parallel_fp_growth_spark.operators.clustering import (
        _dist2_sorted,
    )

    with _pytest.raises(ValueError, match="centroid"):
        _dist2_sorted([], [], [], "cid", "bigint")
