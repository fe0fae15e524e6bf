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


def _py_pagerank_redistribute(edges, damping=0.85, n_iter=3):
    """Replica with the classic dangling-mass correction: leaked mass
    is spread uniformly over all nodes each round."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dm = sum(r[v] for v in nodes if v not in outdeg)
        s = {v: 0.0 for v in nodes}
        for u, v in e:
            s[v] += r[u] / outdeg[u]
        r = {
            v: round((1.0 - damping) / n + damping * (s[v] + dm / n), 9)
            for v in nodes
        }
    return r


def test_pagerank_redistribute_dangling_matches_python(spark):
    # b and d are dangling; redistribution keeps Σr = 1
    edges = [("a", "b"), ("a", "c"), ("c", "d"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    for n_iter in (1, 3):
        got = {
            r.node: r.rank
            for r in pagerank(
                df, n_iter=n_iter, redistribute_dangling=True
            ).collect()
        }
        assert got == _py_pagerank_redistribute(edges, n_iter=n_iter)
    total = sum(got.values())
    assert total == pytest.approx(1.0, abs=1e-6)


def test_pagerank_redistribute_noop_without_dangling(web_graph):
    # every node in the symmetrized graph has out-edges → the corrected
    # variant must equal the plain one exactly
    _, df = web_graph
    sym = df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    plain = {r.node: r.rank for r in pagerank(sym, n_iter=2).collect()}
    redis = {
        r.node: r.rank
        for r in pagerank(sym, n_iter=2, redistribute_dangling=True).collect()
    }
    assert plain == redis


def test_pagerank_reliable_checkpoint_matches_local(web_graph):
    edges, df = web_graph
    # local[*] has no cluster checkpoint dir, so reliable=True falls
    # back with an intentional RuntimeWarning — capture it here so the
    # suite's warning channel stays clean for real signals (VERDICT
    # r11 nit); the advice itself is correct and should keep firing
    with pytest.warns(RuntimeWarning, match="checkpoint"):
        out = pagerank(df, n_iter=2, reliable=True).collect()
    got = {r.node: r.rank for r in out}
    assert got == _py_pagerank(edges, n_iter=2)


def test_pagerank_bucketed_edges_matches_default(web_graph):
    edges, df = web_graph
    spark = df.sparkSession
    before = {t.name for t in spark.catalog.listTables()}
    got = {
        r.node: r.rank
        for r in pagerank(df, bucketed_edges=True, n_buckets=4).collect()
    }
    assert got == _py_pagerank(edges)
    # the temp bucketed edge table must be dropped before returning
    assert {t.name for t in spark.catalog.listTables()} == before


def test_bucketed_edge_join_exchanges_only_rank_side(spark):
    """The point of bucketed_edges: an src-keyed join against the
    bucketed scan must shuffle ONLY the rank side — the bucketed
    layout satisfies the edge side's distribution requirement."""
    from pyspark.sql import functions as F_

    from optimal_parallel_fp_growth_spark.operators.graph import (
        _bucketed_edge_table,
    )

    ed = spark.createDataFrame(
        [(i % 7, i, 2) for i in range(100)], "src long, dst long, outdeg long"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    name = None
    try:
        name, scan = _bucketed_edge_table(spark, ed, 8)
        r = spark.range(7).select(
            F_.col("id").alias("node"), F_.lit(0.1).alias("rank")
        )
        joined = scan.join(r, scan.src == r.node)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        if name:
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_pagerank_auto_dispatch_crossover(web_graph, monkeypatch):
    """auto counts the edge list and flips to the bucketed layout at
    the crossover; ranks are identical either side of it."""
    from optimal_parallel_fp_growth_spark.operators import graph as G

    edges, df = web_graph
    want = _py_pagerank(edges)
    # 16 sym edges >= 1: auto takes the bucketed branch
    monkeypatch.setattr(G, "BUCKETED_EDGE_CROSSOVER", 1)
    spark = df.sparkSession
    before = {t.name for t in spark.catalog.listTables()}
    got = {r.node: r.rank for r in G.pagerank(df).collect()}
    assert got == want
    assert {t.name for t in spark.catalog.listTables()} == before


def test_bucketed_edge_table_window_outdeg_matches_join(spark):
    """r18: the bucketed write annotates out-degrees with a window
    count riding the alignment exchange (ONE edge-list shuffle)
    instead of the former edges ⋈ groupBy(src).count input (three).
    The annotated table must be row-identical to the join form."""
    from pyspark.sql import functions as F_

    from optimal_parallel_fp_growth_spark.operators.graph import (
        _bucketed_edge_table,
    )

    e = spark.createDataFrame(
        [(i % 5, (i * 3) % 11) for i in range(40)], "src long, dst long"
    ).distinct()
    deg = e.groupBy("src").agg(F_.count(F_.lit(1)).alias("outdeg"))
    want = sorted(map(tuple, e.join(deg, "src").collect()))
    name = None
    try:
        name, scan = _bucketed_edge_table(spark, e, 4, outdeg_over="src")
        got = sorted(
            map(tuple, scan.select("src", "dst", "outdeg").collect())
        )
        assert got == want
    finally:
        if name:
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_pagerank_bucketed_redistribute_dangling_matches_python(spark):
    """r18: dangling detection now derives from the materialized edge
    table (ed.src), so the bucketed path must still redistribute
    leaked mass exactly like the python reference."""
    edges = [("a", "b"), ("a", "c"), ("c", "d"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: r.rank
        for r in pagerank(
            df,
            n_iter=2,
            redistribute_dangling=True,
            bucketed_edges=True,
            n_buckets=4,
        ).collect()
    }
    assert got == _py_pagerank_redistribute(edges, n_iter=2)
