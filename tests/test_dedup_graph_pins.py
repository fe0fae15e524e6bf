"""Round-15 GROUND_TRUTH pins for five dedup/graph/mining entries:
full-semantics pure-python recomputation over the collected sf0.001
tables — python-hashlib minhash signatures and simhash votes, a
union-find connected-components pass, a pure-python power iteration,
and an Apriori-style brute-force itemset lattice."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from itertools import combinations

import pytest

from optimal_parallel_fp_growth_spark.operators.dedup import (
    MINHASH_AB,
    MINHASH_P,
    NUM_BANDS,
    NUM_HASHES,
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_BITS,
)
from optimal_parallel_fp_growth_spark.operators.graph import (
    PR_DAMPING,
    PR_ITER,
)
from optimal_parallel_fp_growth_spark.queries import (
    DOCS_MIN_SUPPORT,
    q_freq_itemsets_docs,
)
from optimal_parallel_fp_growth_spark.queries_docs import (
    q_dedup_minhash_lsh,
    q_dedup_simhash,
    q_deduped_corpus_cc,
)
from optimal_parallel_fp_growth_spark.queries_relational import (
    q_supplier_pagerank,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

ROWS_PER_BAND = NUM_HASHES // NUM_BANDS


def _shingles(text: str, k: int = 2) -> list[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return []
    seen, out = set(), []
    for i in range(len(toks) - k + 1):
        g = " ".join(toks[i: i + k])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _minhash_pairs(docs, threshold: float):
    """(pairs {(a,b): jaccard}, shingle sets by id) — the engine's
    banded-LSH candidates + exact verify, recomputed with hashlib."""
    sh = {}
    sig = {}
    for r in docs:
        s = _shingles(r.text)
        if not s:
            continue
        sh[r.doc_id] = set(s)
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in s]
        sig[r.doc_id] = [
            min((h * a + b) % MINHASH_P for h in hs) for a, b in MINHASH_AB
        ]
    buckets = defaultdict(list)
    for i, sg in sig.items():
        for band in range(NUM_BANDS):
            key = (band, tuple(sg[band * ROWS_PER_BAND:(band + 1) * ROWS_PER_BAND]))
            buckets[key].append(i)
    cand = set()
    for ids in buckets.values():
        for a, b in combinations(sorted(ids), 2):
            cand.add((a, b))
    pairs = {}
    for a, b in cand:
        inter = len(sh[a] & sh[b])
        j = round(inter / len(sh[a] | sh[b]), 6)
        if j >= threshold:
            pairs[(a, b)] = j
    return pairs, sh


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").collect()


def test_dedup_minhash_lsh_matches_python(spark, docs):
    want, _ = _minhash_pairs(docs, threshold=0.2)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in q_dedup_minhash_lsh(spark, SF).collect()
    }
    assert got == want and want


def test_deduped_corpus_cc_matches_python(spark, docs):
    pairs, _ = _minhash_pairs(docs, threshold=0.2)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = defaultdict(list)
    for x in {i for p in pairs for i in p}:
        members[find(x)].append(x)
    drop = {
        x for root, xs in members.items() for x in xs if x != min(xs)
    }
    exact_keep = {}
    for r in docs:
        h = hashlib.sha256(r.text.encode()).hexdigest()
        if h not in exact_keep or r.doc_id < exact_keep[h]:
            exact_keep[h] = r.doc_id
    keep = set(exact_keep.values())
    want = {
        (r.doc_id, r.lang, r.source)
        for r in docs
        if r.doc_id in keep and r.doc_id not in drop
    }
    got = {
        (r.doc_id, r.lang, r.source)
        for r in q_deduped_corpus_cc(spark, SF).collect()
    }
    assert got == want
    assert drop  # the near-dup arm really removes documents


def test_dedup_simhash_matches_python(spark, docs):
    def fp_of(text: str) -> int:
        votes = [0] * SIMHASH_BITS
        for tok in dict.fromkeys(text.split(" ")):
            h = hashlib.md5(tok.encode()).hexdigest()
            lo, hi = int(h[:8], 16), int(h[8:16], 16)
            for i in range(SIMHASH_BITS):
                bit = (lo >> i if i < 32 else hi >> (i - 32)) & 1
                votes[i] += 1 if bit else -1
        fp = 0
        for i in range(SIMHASH_BITS):
            if votes[i] > 0:
                fp += -(1 << 63) if i == 63 else (1 << i)
        return fp

    fps = {r.doc_id: fp_of(r.text) for r in docs}
    buckets = defaultdict(list)
    for i, fp in fps.items():
        for b in range(SIMHASH_BANDS):
            val = (fp >> (b * SIMHASH_BAND_BITS)) & ((1 << SIMHASH_BAND_BITS) - 1)
            buckets[(b, val)].append(i)
    cand = set()
    for ids in buckets.values():
        for a, b in combinations(sorted(ids), 2):
            cand.add((a, b))
    want = {}
    for a, b in cand:
        ham = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
        if ham <= 6:
            want[(a, b)] = ham
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in q_dedup_simhash(spark, SF).collect()
    }
    assert got == want and want


def test_supplier_pagerank_matches_python(spark):
    orders = load_table(spark, SF, "orders").collect()
    li = load_table(spark, SF, "lineitem").collect()
    ocust = {r.o_orderkey: r.o_custkey for r in orders}
    cs = set()
    for r in li:
        ck = ocust.get(r.l_orderkey)
        if ck is not None:
            cs.add((f"c{ck}", f"s{r.l_suppkey}"))
    edges = cs | {(b, a) for a, b in cs}
    nodes = {x for e in edges for x in e}
    outdeg = Counter(a for a, _ in edges)
    n = len(nodes)
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(PR_ITER):
        incoming = defaultdict(list)
        for a, b in edges:
            incoming[b].append(rank[a] / outdeg[a])
        rank = {
            x: round(
                (1.0 - PR_DAMPING) / n
                + PR_DAMPING * math.fsum(incoming.get(x, ())),
                9,
            )
            for x in nodes
        }
    got = {r.node: r.rank for r in q_supplier_pagerank(spark, SF).collect()}
    assert set(got) == nodes
    for x in nodes:
        assert abs(got[x] - rank[x]) <= 2e-9


def test_freq_itemsets_docs_matches_python(spark, docs):
    baskets = [set(dict.fromkeys(r.text.split(" "))) for r in docs]
    min_count = math.ceil(DOCS_MIN_SUPPORT * len(baskets))
    item_counts = Counter(t for b in baskets for t in b)
    frequent = {
        frozenset([t]): c for t, c in item_counts.items() if c >= min_count
    }
    want = dict(frequent)
    level = list(frequent)
    size = 1
    while level:
        size += 1
        cand = {
            a | b
            for a in level
            for b in frequent
            if len(a | b) == size
        } if size == 2 else {
            a | frozenset([t])
            for a in level
            for t in item_counts
            if t not in a and item_counts[t] >= min_count
        }
        nxt = []
        for c in cand:
            cnt = sum(1 for b in baskets if c <= b)
            if cnt >= min_count:
                want[c] = cnt
                nxt.append(c)
        level = nxt
    got = {
        frozenset(r.itemset.split("|")): r.freq
        for r in q_freq_itemsets_docs(spark, SF).collect()
    }
    assert got == want
    assert any(len(s) >= 2 for s in want)  # the lattice goes past k=1
