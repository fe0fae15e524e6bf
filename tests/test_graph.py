"""PageRank (operators/graph.py): differential test vs a Python
replica, dangling-mass semantics, and conservation on symmetric
graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.graph import pagerank


def _py_pagerank(edges, damping=0.85, n_iter=3):
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        s = {v: 0.0 for v in nodes}
        for u, v in e:
            s[v] += r[u] / outdeg[u]
        r = {
            v: round((1.0 - damping) / n + damping * s[v], 9) for v in nodes
        }
    return r


@pytest.fixture(scope="module")
def web_graph(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "a"), ("e", "d"), ("b", "e"),
    ]
    return edges, spark.createDataFrame(edges, "src string, dst string")


def test_pagerank_matches_python_reference(web_graph):
    edges, df = web_graph
    for n_iter in (0, 1, 4):
        got = {r.node: r.rank for r in pagerank(df, n_iter=n_iter).collect()}
        assert got == _py_pagerank(edges, n_iter=n_iter), f"n_iter={n_iter}"


def test_pagerank_dangling_mass_leaks(spark):
    # a -> b, b has no out-edges: b's mass vanishes each round (the
    # documented non-redistributing variant)
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, n_iter=1).collect()}
    assert got == {"a": 0.075, "b": 0.5}
    total = sum(got.values())
    assert total < 1.0


def test_pagerank_symmetric_graph_conserves_mass(web_graph):
    _, df = web_graph
    sym = df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(sym, n_iter=3)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)
    # high-degree node c outranks the leaf e
    got = {r.node: r.rank for r in ranks.collect()}
    assert got["c"] > got["e"]


def test_pagerank_duplicate_edges_collapse(spark):
    once = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    twice = once.union(once)
    assert (
        {r.node: r.rank for r in pagerank(twice, n_iter=2).collect()}
        == {r.node: r.rank for r in pagerank(once, n_iter=2).collect()}
    )


def test_pagerank_param_validation(web_graph):
    _, df = web_graph
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=-1)
