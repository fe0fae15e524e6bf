"""Round-15 GROUND_TRUTH pins for nine unpinned vector/sampling
entries: full-semantics pure-python recomputation over the collected
sf0.001 embeddings/documents tables. Every dot product is the SAME
left-to-right IEEE double fold the engine codegen runs (`_dot` /
`_fold_norm2`), and every round() is decimal HALF_UP like Spark's
F.round — so cosines, buckets, cell assignments, ranks and md5
tiebreaks match bit-for-bit; only Lloyd's per-(cluster,pos) MEAN can
differ in summation order, absorbed by the operator's own round-9."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pytest

from optimal_parallel_fp_growth_spark.operators.clustering import (
    CENTROID_DECIMALS,
    KMEANS_ITER,
    KMEANS_K,
    kmeans_k_for,
)
from optimal_parallel_fp_growth_spark.operators.similarity import (
    ANN_BITS,
    IVF_CELLS,
    IVF_PROBE,
    hyperplane_planes,
)
from optimal_parallel_fp_growth_spark.queries_docs import q_negative_pairs
from optimal_parallel_fp_growth_spark.queries_vectors import (
    HN_HI,
    HN_LO,
    HYP_SEED,
    NEARDUP_THRESHOLD,
    QUERY_STRIDE,
    TOP_K,
    q_hard_negatives,
    q_kmeans,
    q_kmeans_auto,
    q_knn_ann,
    q_knn_ivf,
    q_label_centroids,
    q_semdedup,
    q_semdedup_auto,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _rnd(x: float, d: int = 6) -> float:
    """Spark F.round on double: BigDecimal(shortest-repr).setScale(d,
    HALF_UP) — python repr() is the same shortest round-trip string."""
    q = Decimal(1).scaleb(-d)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


@pytest.fixture(scope="module")
def emb(spark):
    rows = load_table(spark, SF, "embeddings").collect()
    return [
        (int(r.vec_id), r.label, [float(x) for x in r.embedding])
        for r in rows
    ]


def _prepared(emb):
    return [(i, v, _fold_dot(v, v)) for i, _, v in (
        (i, lab, v) for i, lab, v in emb
    )]


def test_label_centroids_matches_python(spark, emb):
    cells = defaultdict(list)
    for _, lab, v in emb:
        for pos, x in enumerate(v):
            cells[(lab, pos)].append(x)
    got = q_label_centroids(spark, SF).collect()
    assert len(got) == len(cells)
    for r in got:
        vals = cells[(r.label, r.pos)]
        assert r.n_vectors == len(vals)
        assert abs(r.mean_val - round(math.fsum(vals) / len(vals), 9)) <= 2e-9


def _lloyd(prepared, k, n_iter=KMEANS_ITER):
    """The engine's deterministic Lloyd: first-k-by-id seeds, rounded
    dist2 with cid tiebreak, per-(cluster,pos) mean rounded to 9,
    empty clusters keep their centroid."""
    pts = sorted(prepared)
    cents = [(i, list(v), _fold_dot(v, v)) for i, v, _ in pts[:k]]

    def assign(cents):
        out = {}
        for i, v, n2 in prepared:
            best = min(
                (_rnd(n2 - 2 * _fold_dot(v, cv) + cn), cid)
                for cid, cv, cn in cents
            )
            out[i] = best  # (dist2, cid)
        return out

    for _ in range(n_iter):
        a = assign(cents)
        members = defaultdict(list)
        for i, v, _ in prepared:
            members[a[i][1]].append(v)
        new = []
        for cid, cv, cn in cents:
            vs = members.get(cid)
            if not vs:
                new.append((cid, cv, cn))
                continue
            coords = [
                _rnd(math.fsum(col) / len(vs), CENTROID_DECIMALS)
                for col in zip(*vs)
            ]
            new.append((cid, coords, _fold_dot(coords, coords)))
        cents = new
    return cents, assign(cents)


def _check_kmeans(spark, emb, qfn, k):
    prepared = _prepared(emb)
    _, a = _lloyd(prepared, k)
    got = qfn(spark, SF).collect()
    assert len(got) == len(prepared)
    for r in got:
        d2, cid = a[r.vec_id]
        assert r.cluster == cid
        assert abs(r.dist2 - d2) <= 1.5e-6


def test_kmeans_clusters_matches_python(spark, emb):
    _check_kmeans(spark, emb, q_kmeans, KMEANS_K)


def test_kmeans_auto_matches_python(spark, emb):
    _check_kmeans(spark, emb, q_kmeans_auto, kmeans_k_for(len(emb)))


def _check_semdedup(spark, emb, qfn, k):
    prepared = _prepared(emb)
    _, a = _lloyd(prepared, k)
    by_cluster = defaultdict(list)
    for i, v, n2 in prepared:
        by_cluster[a[i][1]].append((i, v, n2))
    dropped = set()
    for rows in by_cluster.values():
        rows.sort()
        for x in range(len(rows)):
            ia, va, na = rows[x]
            for y in range(x + 1, len(rows)):
                ib, vb, nb = rows[y]
                cos = _rnd(_fold_dot(va, vb) / math.sqrt(na * nb))
                if cos >= NEARDUP_THRESHOLD:
                    dropped.add(ib)
    got = qfn(spark, SF).collect()
    assert len(got) == len(prepared)
    for r in got:
        assert r.cluster == a[r.vec_id][1]
        assert r.kept == (r.vec_id not in dropped)
    assert dropped  # the prune actually bites on the fixture


def test_semdedup_matches_python(spark, emb):
    _check_semdedup(spark, emb, q_semdedup, KMEANS_K)


def test_semdedup_auto_matches_python(spark, emb):
    _check_semdedup(spark, emb, q_semdedup_auto, kmeans_k_for(len(emb)))


def _topk(scored, k=TOP_K):
    """(query_id -> [(cosine, vec_id)]) → {(q, vec): (cos, rn)} by
    (cosine desc, vec_id asc)."""
    out = {}
    for q, rows in scored.items():
        rows.sort(key=lambda t: (-t[0], t[1]))
        for rn, (cos, i) in enumerate(rows[:k], start=1):
            out[(q, i)] = (cos, rn)
    return out


def test_knn_ann_matches_python(spark, emb):
    prepared = _prepared(emb)
    by_id = {i: (v, n2) for i, v, n2 in prepared}

    def bucket(v):
        return sum(1 << i for i in range(ANN_BITS) if v[i] > 0)

    buckets = defaultdict(list)
    for i, v, n2 in prepared:
        buckets[bucket(v)].append(i)
    scored = defaultdict(list)
    for qid, (qv, qn2) in by_id.items():
        if qid % QUERY_STRIDE != 0:
            continue
        qb = bucket(qv)
        probes = {qb} | {qb ^ (1 << j) for j in range(ANN_BITS)}
        for b in probes:
            for i in buckets.get(b, ()):
                if i == qid:
                    continue
                v, n2 = by_id[i]
                scored[qid].append(
                    (_rnd(_fold_dot(qv, v) / math.sqrt(qn2 * n2)), i)
                )
    want = _topk(scored)
    got = q_knn_ann(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        cos, rn = want[(r.query_id, r.vec_id)]
        assert (r.cosine, r.rn) == (cos, rn)


def test_knn_ivf_matches_python(spark, emb):
    prepared = _prepared(emb)
    pts = sorted(prepared)
    cents = [(i, v, n2) for i, v, n2 in pts[:IVF_CELLS]]

    def cells_for(v, n2):
        return sorted(
            (-_rnd(_fold_dot(v, cv) / math.sqrt(n2 * cn)), cid)
            for cid, cv, cn in cents
        )

    cell_members = defaultdict(list)
    for i, v, n2 in prepared:
        cell_members[cells_for(v, n2)[0][1]].append(i)
    by_id = {i: (v, n2) for i, v, n2 in prepared}
    scored = defaultdict(list)
    for qid, (qv, qn2) in by_id.items():
        if qid % QUERY_STRIDE != 0:
            continue
        probe = [c for _, c in cells_for(qv, qn2)[:IVF_PROBE]]
        for c in probe:
            for i in cell_members.get(c, ()):
                if i == qid:
                    continue
                v, n2 = by_id[i]
                scored[qid].append(
                    (_rnd(_fold_dot(qv, v) / math.sqrt(qn2 * n2)), i)
                )
    want = _topk(scored)
    got = q_knn_ivf(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        cos, rn = want[(r.query_id, r.vec_id)]
        assert (r.cosine, r.rn) == (cos, rn)


def test_hard_negatives_matches_python(spark, emb):
    prepared = _prepared(emb)
    d = len(prepared[0][1])
    planes = hyperplane_planes(ANN_BITS, d, HYP_SEED)

    def bucket(v):
        b = 0
        for j, row in enumerate(planes):
            if _fold_dot(v, row) > 0:
                b += 1 << j
        return b

    buckets = defaultdict(list)
    for i, v, n2 in prepared:
        buckets[bucket(v)].append(i)
    by_id = {i: (v, n2) for i, v, n2 in prepared}
    scored = defaultdict(list)
    for qid, (qv, qn2) in by_id.items():
        if qid % QUERY_STRIDE != 0:
            continue
        qb = bucket(qv)
        probes = {qb} | {qb ^ (1 << j) for j in range(ANN_BITS)}
        for b in probes:
            for i in buckets.get(b, ()):
                if i == qid:
                    continue
                v, n2 = by_id[i]
                cos = _rnd(_fold_dot(qv, v) / math.sqrt(qn2 * n2))
                if HN_LO <= cos <= HN_HI:
                    scored[qid].append((cos, i))
    want = _topk(scored)
    got = q_hard_negatives(spark, SF).collect()
    assert len(got) == len(want) and want
    for r in got:
        cos, rn = want[(r.query_id, r.vec_id)]
        assert (r.cosine, r.rn) == (cos, rn)


def test_negative_pairs_matches_python(spark):
    docs = load_table(spark, SF, "documents").collect()
    ids = [r.doc_id for r in docs]
    B = max(1, len(ids) // 8)

    def h8(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    targets = defaultdict(list)
    for t in ids:
        targets[h8(f"neg:t:{t}") % B].append(t)
    want = {}
    for i in ids:
        for j in range(2):
            cand = [
                t for t in targets.get(h8(f"neg:p:{j}:{i}") % B, ()) if t != i
            ]
            if cand:
                want[(i, j)] = min(
                    cand,
                    key=lambda t: hashlib.md5(
                        f"neg:x:{i}:{j}:{t}".encode()
                    ).hexdigest(),
                )
    got = q_negative_pairs(spark, SF).collect()
    assert len(got) == len(want) and want
    for r in got:
        assert want[(r.doc_id, r.pair_idx)] == r.neg_id
