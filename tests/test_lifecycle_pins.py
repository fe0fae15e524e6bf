"""Round-15 GROUND_TRUTH pins for six lifecycle/pipeline entries:
pure-python recomputation of each entry's closed-form final state over
the collected sf0.001 tables — the versioned create/append/overwrite
and COW-merge lifecycles, the z-order rewrite's lossless filter, the
deterministic HTML template census, the add-alpha bigram LM, and the
full curation pipeline (greedy minhash dedup → quality gate → split →
pack)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pytest

from optimal_parallel_fp_growth_spark.functions.text import EN_STOPWORDS
from optimal_parallel_fp_growth_spark.queries_docs import (
    VERSIONED_MIN_DOC_ID,
    q_curate_corpus,
    q_html_extract,
    q_lm_perplexity,
    q_versioned_merge,
    q_versioned_read,
)
from optimal_parallel_fp_growth_spark.queries_relational import (
    q_zorder_layout_read,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table
from tests.test_dedup_graph_pins import _minhash_pairs

SF = "/root/testdata/sf0.001"

SIX = Decimal("0.000001")


def _dec6(x: float) -> Decimal:
    return Decimal(x).quantize(SIX, rounding=ROUND_HALF_UP)


def _round2(d: Decimal) -> float:
    return float(d.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))


def _rnd(x: float, d: int = 6) -> float:
    q = Decimal(1).scaleb(-d)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").collect()


def test_versioned_read_matches_python(spark, docs):
    cells = defaultdict(lambda: [0, 0])
    for r in docs:
        if r.doc_id % 3 < 2 and r.doc_id >= VERSIONED_MIN_DOC_ID:
            a = cells[(r.lang, r.source)]
            a[0] += 1
            a[1] += r.n_chars
    got = q_versioned_read(spark, SF).collect()
    assert len(got) == len(cells)
    for r in got:
        assert cells[(r.lang, r.source)] == [r.n_docs, r.total_chars]


def test_versioned_merge_matches_python(spark, docs):
    cells = defaultdict(lambda: [0, 0, 0])  # n, chars, inserted
    for r in docs:
        a = cells[r.lang]
        a[0] += 1
        a[1] += -1 if r.doc_id % 10 == 0 else r.n_chars
        if r.doc_id % 10 == 5:  # the shifted twin insert
            a[0] += 1
            a[1] += r.n_chars
            a[2] += 1
    got = q_versioned_merge(spark, SF).collect()
    assert len(got) == len(cells)
    for r in got:
        assert cells[r.lang] == [r.n_docs, r.total_chars, r.n_inserted]


def test_zorder_layout_read_matches_python(spark):
    li = load_table(spark, SF, "lineitem").collect()
    qty = price = Decimal(0)
    n = 0
    for r in li:
        if r.l_orderkey <= 1000 and r.l_partkey <= 300:
            n += 1
            qty += _dec6(r.l_quantity)
            price += _dec6(r.l_extendedprice)
    got = q_zorder_layout_read(spark, SF).collect()[0]
    assert got.n_rows == n and n > 0
    assert abs(got.sum_qty - _round2(qty)) < 1e-9
    assert abs(got.sum_price - _round2(price)) < 1e-9


def test_html_extract_matches_python(spark, docs):
    """The deterministic page template's hand-derived census: 5 text
    blocks, only the article paragraph survives the link-density gate
    with the ORIGINAL text, and the page link density is the closed
    form of the template's link/text character counts."""
    got = {r.doc_id: r for r in q_html_extract(spark, SF).collect()}
    assert len(got) == len(docs)
    for d in docs:
        r = got[d.doc_id]
        dens = _rnd(
            (37.0 + 2 * len(str(d.doc_id)))
            / (52.0 + 2 * len(str(d.doc_id)) + len(d.text))
        )
        assert (r.n_blocks, r.n_kept) == (5, 1)
        assert r.main_text == d.text
        assert r.n_chars == len(d.text)
        assert abs(r.link_density - dens) <= 1.5e-6


def test_lm_perplexity_matches_python(spark, docs):
    per_doc = {}
    bg = Counter()
    for r in docs:
        toks = r.text.split(" ")
        grams = list(zip(toks, toks[1:]))
        per_doc[r.doc_id] = grams
        bg.update(grams)
    ctx = Counter()
    vocab = set()
    for (w1, w2), c in bg.items():
        ctx[w1] += c
        vocab.add(w1)
        vocab.add(w2)
    V = float(len(vocab))
    logp = {
        g: math.log((c + 0.5) / (ctx[g[0]] + 0.5 * V))
        for g, c in bg.items()
    }
    got = {r.doc_id: r for r in q_lm_perplexity(spark, SF).collect()}
    scored = {d: g for d, g in per_doc.items() if g}
    assert len(got) == len(scored)
    for d, grams in scored.items():
        r = got[d]
        nll = -math.fsum(logp[g] for g in grams) / len(grams)
        assert r.n_bigrams == len(grams)
        assert abs(r.avg_nll - round(nll, 6)) <= 2e-6
        assert abs(r.ppl - round(math.exp(nll), 4)) <= 2e-4 + 1e-6 * r.ppl


def test_curate_corpus_matches_python(spark, docs):
    # near-dup arm: GREEDY at threshold 0.5 — drop doc_b of every pair
    pairs, _ = _minhash_pairs(docs, threshold=0.5)
    near_drop = {b for _, b in pairs}
    exact_keep = {}
    for r in docs:
        h = hashlib.sha256(r.text.encode()).hexdigest()
        if h not in exact_keep or r.doc_id < exact_keep[h]:
            exact_keep[h] = r.doc_id
    keep = set(exact_keep.values()) - near_drop
    stop = set(EN_STOPWORDS)
    kept_rows = []
    for r in docs:
        if r.doc_id not in keep:
            continue
        toks = r.text.split(" ")
        n = len(toks)
        length_term = min(n / 50.0, 1.0)
        diversity = len(set(toks)) / max(n, 1)
        stop_term = min(
            (sum(1 for t in toks if t in stop) / max(n, 1)) * 5.0, 1.0
        )
        q = _rnd(0.4 * length_term + 0.4 * diversity + 0.2 * stop_term)
        if q >= 0.5:
            kept_rows.append(r)
    # train split (md5 bucket < 9000) then contiguous packs per source
    def bucket(doc_id):
        return int(
            hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:8], 16
        ) % 10_000

    train = [r for r in kept_rows if bucket(r.doc_id) < 9000]
    by_source = defaultdict(list)
    for r in train:
        by_source[r.source].append((r.doc_id, len(r.text.split(" "))))
    want = {}
    for src, rows in by_source.items():
        rows.sort()
        start = 0
        for doc_id, n in rows:
            want[doc_id] = (src, n, start // 256)
            start += n
    got = q_curate_corpus(spark, SF).collect()
    assert len(got) == len(want) and want
    for r in got:
        assert want[r.doc_id] == (r.source, r.n_tokens, r.pack_id)
    # every arm of the pipeline genuinely filtered something
    assert near_drop and len(kept_rows) < len(keep) and len(train) < len(
        kept_rows
    )
