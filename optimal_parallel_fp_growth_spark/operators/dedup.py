"""Deduplication operators — the core of an LLM training-data pipeline
(no reference counterpart; SURVEY §7.2 M7 / driver north star).

Four tiers, all pure DataFrame (no Python UDFs anywhere):

- exact          — sha256 hash-groupBy; one shuffle on the hash.
- ngram_jaccard  — EXACT set-similarity via an inverted shingle index
                   (explode → self-join on shingle → pair-intersection
                   counts). Quadratic only within a shingle's posting
                   list; at 100 TB add prefix filtering / drop ultra-
                   common shingles (df > threshold) before the join.
- minhash_lsh    — the scale path: md5-based minhash signatures (md5 so
                   the DuckDB oracle reproduces hashes bit-for-bit),
                   banded LSH bucketing, candidate pairs verified with
                   exact jaccard. Shuffle volume is O(docs · bands), not
                   O(pairs).
- simhash        — 64-bit simhash fingerprints, 16-bit band join
                   (hamming≤3 recall guaranteed by pigeonhole),
                   hamming-distance verify via xor + bit_count.

All outputs are deterministic: pair keys ordered (doc_a < doc_b),
similarities rounded to 1e-6.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.caching import (
    RddBlockHandle,
    materialize_pending_caches,
    persistent_rdd_ids,
    tag_cached_inputs,
    unpersist_blocks,
)
from optimal_parallel_fp_growth_spark.functions.layout import fan_out_scan
from optimal_parallel_fp_growth_spark.functions.text import tokens


def _shingles_of(t: Column, k: int = 2) -> Column:
    """Distinct word k-grams over a token array. ``t`` MUST be a bound
    attribute (a materialized column), not an inline split() expression:
    higher-order functions evaluate interpreted (no codegen CSE), so an
    inline split would re-tokenize the text for every element_at —
    O(tokens²) per document (measured 6s → 0.5s at sf0.1)."""
    if k == 1:
        return F.array_distinct(t)
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(t, i + off) for off in range(k)]
    )
    # Guard: sequence(1, 0) DESCENDS in Spark, so short texts must yield []
    # explicitly rather than via an empty sequence.
    return F.when(
        F.size(t) >= k,
        F.array_distinct(F.transform(F.sequence(F.lit(1), F.size(t) - (k - 1)), gram)),
    ).otherwise(F.array().cast("array<string>"))


def _doc_shingles(
    docs: DataFrame,
    text_col: str,
    k: int = 2,
    keep_cols: tuple[str, ...] = (),
    min_tokens: int | None = None,
) -> DataFrame:
    """→ (doc_id, *keep_cols, sh) with tokens materialized behind a
    projection boundary so the lambda sees an attribute, not the split
    expression. The pruned (doc_id, text) projection is fanned out
    BEFORE tokenization (functions/layout.py): on a single-split
    source the whole tokenize→shingle chain would otherwise run as one
    serial task (measured r17: 5.4 s of dedup_clusters' 8.8 s wall was
    this chain on one core); a healthy scan passes through untouched.

    ``min_tokens=k`` replaces a caller-side ``size(sh) > 0`` filter:
    equivalent row-for-row (``sh`` is empty/NULL exactly when the doc
    has < k tokens — see ``_shingles_of``'s guard), but a filter over
    the DERIVED ``sh`` gets predicate-pushed below the fan-out exchange
    with the whole shingle expression substituted, re-computing the
    chain once per row in the (possibly serial) scan stage and AGAIN in
    the projection (measured r17: an 8.5 s single-task scan-stage job
    in dedup_clusters). The cheap token-count form pushes to the scan
    as one split() per row and prunes rows before the exchange
    (guide §2.3 — shuffle fewer bytes)."""
    pruned = docs.select("doc_id", *keep_cols, F.col(text_col))
    if min_tokens is not None:
        pruned = pruned.where(F.size(tokens(text_col)) >= min_tokens)
    base = fan_out_scan(pruned, "doc_id")
    return base.select(
        "doc_id", *keep_cols, tokens(text_col).alias("toks")
    ).select("doc_id", *keep_cols, _shingles_of(F.col("toks"), k).alias("sh"))


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: one row per distinct text, keeping the smallest
    doc_id. → (text_sha256, doc_id_kept, n_dups)."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("text_sha256"))
        .agg(F.min("doc_id").alias("doc_id_kept"), F.count("*").alias("n_dups"))
    )


NGRAM_MAX_DF_FLOOR = 50


def ngram_max_df_for(n_corpus: int, floor: int = NGRAM_MAX_DF_FLOOR) -> int:
    """Stop-shingle cutoff for a corpus of ``n_corpus`` documents:
    ``max(floor, ceil(sqrt(n)))`` — the ``kmeans_k_for`` /
    ``ann_bits_for`` recipe applied to the posting join. A shingle with
    document frequency df contributes ~df² candidate pairs, so a FROZEN
    cutoff lets the vocabulary head (which occurs in a constant
    FRACTION of documents — measured 7–9 % of docs at sf0.01/sf0.1)
    go quadratic with corpus growth: the exact tier spilled 1.66 GB at
    sf1 independent of partitioning (BASELINE.md §sf1). Capping df at
    √n bounds per-hot-shingle pair work at n — head work then grows
    LINEARLY with the corpus, the same rate as every other shuffle in
    the engine. The floor keeps small corpora effectively exact (the
    sf0.01 oracle corpus tops out at df 46 < 50 — identical pair set,
    measured round 5); sf1 derives 224, bracketing the measured
    no-spill max_df=200 probe (6.56 s vs 46.6 s exact)."""
    if n_corpus <= 0:
        return floor
    r = math.isqrt(n_corpus)
    if r * r < n_corpus:
        r += 1  # ceil(sqrt(n)) in exact integer arithmetic
    return max(floor, r)


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 2,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by k-gram Jaccard ≥ threshold, via inverted index:
    |A∩B| from a shingle-keyed self-join, sizes joined back.
    → (doc_a, doc_b, jaccard).

    ``max_df`` prunes stop-shingles from the candidate join — pairs
    must share at least one shingle whose document frequency is ≤ the
    cutoff, which skips the quadratic hot posting lists; jaccard for
    surviving candidates is still computed exactly over the full
    shingle sets, so reported values are identical to the exact tier
    and only recall (pairs overlapping solely in ubiquitous shingles)
    is approximate.

    - ``None`` (default): derive the cutoff from the corpus size via
      :func:`ngram_max_df_for` — the scale-safe default.
    - ``0``: EXACT — no pruning; the oracle-exact tier. Spills at
      sf1+ (BASELINE.md §sf1); keep for small corpora / verification.
    - ``N > 0``: explicit cutoff.
    """
    sh = _doc_shingles(docs, text_col, k)
    sh.persist()
    if max_df is None:
        # one count over the (cached) shingle frame — the same
        # one-extra-job pattern as kmeans_assign(k=None)
        max_df = ngram_max_df_for(sh.count())
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    posting = sh.select("doc_id", F.explode("sh").alias("shingle"))
    if max_df:
        rare = (
            posting.groupBy("shingle")
            .count()
            .where(F.col("count") <= max_df)
            .select("shingle")
        )
        cand = (
            posting.join(F.broadcast(rare), "shingle")
            .alias("a")
            .join(
                posting.join(F.broadcast(rare), "shingle").alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
        sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
        sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
        jac = F.round(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
            6,
        )
        return tag_cached_inputs(
            cand.join(sh_a, "doc_a")
            .join(sh_b, "doc_b")
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= threshold),
            sh,
        )
    inter = (
        posting.alias("a")
        .join(posting.alias("b"),
              (F.col("a.shingle") == F.col("b.shingle"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return tag_cached_inputs(out, sh)


def ngram_jaccard_prefix(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT ≥ τ jaccard pairs via PREFIX FILTERING (the
    Chaudhuri/Bayardo ppjoin family) — same output contract as
    ``ngram_jaccard_pairs(max_df=0)`` with a candidate volume that
    scales: each document indexes only its ``|sh| − ⌈τ·|sh|⌉ + 1``
    RAREST shingles (global (df, shingle) order), and the prefix
    theorem guarantees any pair with J ≥ τ shares a prefix shingle
    under a common total order — no pair is lost, but the hot
    vocabulary head (max df) sorts to the END of every document and
    almost never enters a prefix, which removes the df² pair blowup
    that made the all-postings exact tier spill (BASELINE.md §sf1:
    1.66 GB, partition-independent) WHEN the vocabulary is Zipfian —
    i.e. most shingles rare, as in real text. A symmetric length
    filter (τ·na ≤ nb ≤ na/τ) prunes candidates further; survivors
    verify with the same exact jaccard formula, so results equal the
    exact tier's bit-for-bit (oracle transfers).

    MEASURED VERDICT on the benchmark fixture (BASELINE.md round-5
    prefix probe): the synthetic corpus has only 931 distinct
    2-gram shingles at sf0.1 (mean df ≈ 275 — NO rare tail), so
    prefixes stay hot and the candidate join loses to the postings
    tier at every τ tried (τ=0.2: 9.2 M candidates; even τ=0.8 only
    ties). Use this operator for real corpora whose shingle
    vocabulary grows with the text (the usual case); on dense-vocab
    inputs prefer ``max_df`` pruning or the minhash tier. The win
    case is pinned by ``tests/test_ngram_prefix.py``'s hot-token
    corpus (sparse tail + one stop shingle: candidate volume
    collapses 4×+ while results stay exact).

    Boundary care: τ is a double, so every ⌈τ·n⌉ / τ·n comparison
    subtracts 1e-9 first — mathematical boundary pairs (J exactly τ)
    stay INCLUDED even when the product lands an ulp high.

    Implementation notes (the measured version — a first cut paid its
    win back in overhead): shingles travel the candidate machinery as
    64-bit ``xxhash64`` longs, not strings (16-byte exchange rows; a
    collision merges two shingles' identities, which is ~2⁻⁶⁴-per-pair
    — verification stays exact either way), and
    the per-doc prefix comes from ``sort_array(collect_list(...))`` +
    ``slice`` (one doc-keyed exchange, per-doc array sorts) instead of
    a ``row_number`` window, whose whole-partition sort spilled 3.2 GB
    at sf1. → (doc_a, doc_b, jaccard)."""
    eps = 1e-9
    sh = _doc_shingles(docs, text_col, k, min_tokens=k)
    sh.persist()
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    # xxhash64, not md5 (r18, VERDICT r17 task #9): the hash only names
    # shingle identities inside the candidate machinery (df counting,
    # the common total order, the equi-join key) — survivors verify
    # with the exact jaccard over the REAL shingle arrays, so the
    # output is hash-independent (the oracle recomputes pairs from the
    # shingles and stays green either way). One 64-bit JVM-native hash
    # per posting replaces digest+hex+substring+base-16 conv per
    # posting (guide §4.2 per-task work; measured on the Zipf corpus:
    # the posting/dfreq tier is the query's hottest expression).
    # Collisions merge two shingles' identities at ~2⁻⁶⁴/pair — rarer
    # than the 60-bit md5 prefix this replaces, same failure envelope.
    posting = sh.select("doc_id", F.explode("sh").alias("shingle")).select(
        "doc_id",
        F.xxhash64("shingle").alias("h"),
    )
    dfreq = posting.groupBy("h").agg(F.count("*").alias("df"))
    plen = (
        F.col("n_sh")
        - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(eps))
        + 1
    ).cast("int")
    pref = (
        posting.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "h"))).alias("o"))
        .join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_sh",
            F.explode(F.slice(F.col("o"), F.lit(1), plen)).alias("e"),
        )
        .select("doc_id", "n_sh", F.col("e.h").alias("h"))
    )
    # both sides re-alias the hash column: a's and b's `h` share the
    # same attribute lineage (both project `pref`), so joining on
    # `a.h == b.h` resolves to the trivially-true `h == h` — Spark
    # WARNs and rewrites it, but that is exactly how accidental
    # cartesians start (VERDICT r14 task #6); distinct names make the
    # equi-join key unambiguous
    a = pref.select(
        F.col("doc_id").alias("doc_a"),
        F.col("h").alias("ha"),
        F.col("n_sh").alias("na"),
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"),
        F.col("h").alias("hb"),
        F.col("n_sh").alias("nb"),
    )
    cand = (
        a.join(
            b,
            (F.col("ha") == F.col("hb"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.col("nb") >= F.lit(threshold) * F.col("na") - F.lit(eps))
            & (F.col("na") >= F.lit(threshold) * F.col("nb") - F.lit(eps)),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    na = F.size("sh_a")
    nb = F.size("sh_b")
    jac = F.round(n_inter / (na + nb - n_inter), 6)
    out = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
    return tag_cached_inputs(out, sh)


def deduped_corpus(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    policy: str = "greedy",
) -> DataFrame:
    """The consumable pipeline output: documents surviving BOTH exact
    dedup (keep smallest doc_id per identical text) and near-dup
    removal. Two policies:

    - ``greedy`` — for every minhash-LSH pair a<b with jaccard ≥
      threshold, drop b. One pass, no iteration; under non-transitive
      similarity (A~C, B~C, A≁B) it keeps both A and B yet drops C, so
      cluster boundaries depend on id order.
    - ``cc`` — one survivor per connected component of the pair graph
      (the component's min doc_id, via :func:`dedup_clusters`): the
      production policy — a canonical representative per transitive
      similarity cluster — at the cost of the CC iteration."""
    keep_exact = (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    if policy == "greedy":
        near_drop = (
            minhash_lsh_pairs(docs, text_col, threshold=threshold)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
    elif policy == "cc":
        near_drop = (
            dedup_clusters(docs, text_col, threshold=threshold)
            .where(F.col("cluster_id") != F.col("doc_id"))
            .select("doc_id")
        )
    else:
        raise ValueError(f"unknown dedup policy {policy!r} (greedy|cc)")
    # carry the standard metadata columns when present (the oracle-checked
    # documents schema) without requiring them of arbitrary corpora
    cols = ["doc_id"] + [c for c in ("lang", "source") if c in docs.columns]
    return (
        docs.join(keep_exact, "doc_id", "left_semi")
        .join(near_drop, "doc_id", "left_anti")
        .select(*cols)
    )


# ---------------------------------------------------------------------------
# Connected-components clustering over near-dup pairs


def _graph_bucketed_crossover() -> int:
    # function-level import: graph.py is independent of this module,
    # and the constant (with its measurement rationale) lives there
    from optimal_parallel_fp_growth_spark.operators.graph import (
        BUCKETED_EDGE_CROSSOVER,
    )

    return BUCKETED_EDGE_CROSSOVER


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 25,
    algorithm: str = "label",
    bucketed_edges: bool | str = "auto",
) -> DataFrame:
    """Distributed connected components. → (u, component) for every
    node appearing in ``edges``; component = smallest node id in the
    component. Two interchangeable algorithms (differential-tested
    against each other and a union-find reference):

    - ``label`` (default): min-label propagation — each round one
      shuffle join (pull neighbours' labels) + one min aggregation.
      Rounds needed = graph DIAMETER; near-dup graphs are unions of
      small near-cliques (diameter ≤ ~3), so this converges in 2–4
      rounds and each round touches only (edges + nodes).
    - ``star``: alternating large-star/small-star (Kiveris et al.
      2014, "Connected Components in MapReduce and Beyond") —
      converges in O(log²·n) rounds INDEPENDENT of diameter, the
      safe choice for adversarial long-chain graphs where label
      propagation would need diameter rounds.

    Both checkpoint per round so plans stay flat regardless of
    iteration count.

    ``bucketed_edges=True`` (label variant only): the loop-invariant
    symmetrized edge list is written ONCE as a parquet table bucketed
    on the join key ``v`` instead of block-manager persist — each
    round's edges⋈labels join then reads the pre-partitioned scan, so
    only the (small) label side is exchanged per round and the edge
    working set never occupies executor storage. Same big-graph trade
    as ``graph.pagerank(bucketed_edges=True)`` (measured 2.3x faster
    at the 117 M-edge decade, ~1.2x slower below 12 M — BASELINE.md
    §round-5 scale probe). The default ``"auto"`` rides the count the
    operator already takes on the materialized edge list and flips at
    ``graph.BUCKETED_EDGE_CROSSOVER`` — near-dup pair graphs rarely
    reach it, so the common case stays on the persist path with zero
    extra work.
    """
    if algorithm == "star":
        if bucketed_edges is True:
            # "auto" simply doesn't apply: star REWRITES its edge set
            # every round, so there is no loop-invariant side to bucket
            raise ValueError(
                "bucketed_edges applies to the label variant only: the "
                "star algorithm REWRITES its edge set every round, so "
                "there is no loop-invariant side to bucket"
            )
        return _cc_star(edges, src, dst, max_iterations)
    if algorithm != "label":
        raise ValueError(f"unknown CC algorithm {algorithm!r} (label|star)")
    und = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    und = und.union(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    spark = edges.sparkSession
    edge_table = None
    if bucketed_edges is True:
        from optimal_parallel_fp_growth_spark.operators.graph import (
            _bucketed_edge_table,
        )

        materialize_pending_caches()
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # bucket on v — the per-round join key (labels are pulled from
        # the neighbour side)
        edge_table, und = _bucketed_edge_table(
            spark, und, n_buckets, key="v"
        )
        und.count()
    else:
        # Materialize und (and, through the edge-plan scan, any
        # upstream registry-pending caches such as the minhash
        # signature cache under dedup_clusters) BEFORE snapshotting the
        # persistent-id baseline. A lazy persist would otherwise first
        # materialize inside the first localCheckpoint below, land its
        # cache id in round 1's block diff, and be unpersisted after
        # round 1 — silently recomputing the union+distinct edge list
        # every later round.
        und = und.persist()
        materialize_pending_caches()
        n_edges = und.count()
        if (
            bucketed_edges == "auto"
            and n_edges >= _graph_bucketed_crossover()
        ):
            from optimal_parallel_fp_growth_spark.operators.graph import (
                _bucketed_edge_table,
            )

            persisted = und
            n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
            # the bucketed write reads from the persisted blocks, then
            # those blocks are released — past the crossover the edge
            # set must NOT stay resident for the whole iteration
            edge_table, und = _bucketed_edge_table(
                spark, persisted, n_buckets, key="v"
            )
            persisted.unpersist()
    seen = persistent_rdd_ids(spark)
    labels = (
        und.select("u").distinct().withColumn("component", F.col("u"))
    ).localCheckpoint()
    # Round N−1's checkpoint blocks are dead once round N materializes:
    # free them eagerly instead of letting 25 rounds of blocks sit in
    # executor storage for the session (at 100 TB that accumulation is
    # real memory). Only the FINAL round's blocks survive the loop —
    # they back the returned plan — and those are handed to the
    # tag/release lifecycle by the callers that wrap this operator.
    prev_ids = persistent_rdd_ids(spark) - seen
    for _ in range(max_iterations):
        nbr_min = (
            und.join(
                labels.select(F.col("u").alias("v"), "component"), "v"
            )
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        # One materialization per round: the convergence test and the next
        # round's labels both read this checkpoint (keeping the old
        # new-vs-old join would cost a second shuffle job per round).
        seen = persistent_rdd_ids(spark)
        joined = labels.join(nbr_min, "u", "left").localCheckpoint()
        changed = joined.where(F.col("nbr_min") < F.col("component")).count()
        unpersist_blocks(spark, prev_ids)
        prev_ids = persistent_rdd_ids(spark) - seen
        labels = joined.select(
            "u",
            F.least(
                F.col("component"), F.coalesce("nbr_min", "component")
            ).alias("component"),
        )
        if changed == 0:
            break
    else:
        und.unpersist()
        if edge_table is not None:
            spark.sql(f"DROP TABLE IF EXISTS {edge_table}")
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds; the pair graph has a longer chain than near-dup "
            "graphs should — raise max_iterations or rerun with "
            "algorithm='star' (diameter-independent rounds)"
        )
    und.unpersist()
    if edge_table is not None:
        # labels' final plan derives from the last round's materialized
        # checkpoint, never the table scan — safe to drop
        spark.sql(f"DROP TABLE IF EXISTS {edge_table}")
    return tag_cached_inputs(labels, RddBlockHandle(spark, prev_ids))


def _cc_star(
    edges: DataFrame, src: str, dst: str, max_iterations: int
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al. 2014).

    Edge state is kept in parent-pointer form (u, v) with v < u.
    Each round:

    - large-star: symmetrize, and for every node u hook each LARGER
      neighbour v > u onto m = min(Γ(u) ∪ {u}).
    - small-star: group the parent pointers by child u and re-hang u
      and all its parents ≠ m onto m = min(parents ∪ {u}).

    Both steps preserve connectivity and strictly shrink potential;
    at fixpoint the edge set is a star per component centred on its
    minimum, reached in O(log² n) rounds regardless of graph diameter
    (label propagation needs diameter rounds). Each step is the same
    join + min-aggregation shuffle primitive as the label variant;
    per-round localCheckpoint keeps the plan flat. Convergence test:
    new ⊆ old with equal counts (both sides are distinct sets).
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
    )
    spark = edges.sparkSession
    # Upstream registry-pending caches must materialize before the id
    # baseline, not inside the first checkpoint's diff window (same
    # guard as the label variant — see comment there).
    materialize_pending_caches()
    seen = persistent_rdd_ids(spark)
    e = e.localCheckpoint()
    n_edges = e.count()
    # same per-round block hygiene as the label variant: round N−1's
    # checkpoint blocks are freed once round N's convergence check (the
    # last reader of BOTH rounds) has run.
    prev_ids = persistent_rdd_ids(spark) - seen
    for _ in range(max_iterations):
        # --- large-star ---
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        m = F.least(F.col("u"), F.col("mn")).alias("m")
        ls = (
            sym.join(mins, "u")
            .select("u", "v", m)
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star (input is parent-pointer form: v < u) ---
        pmins = ls.groupBy("u").agg(F.min("v").alias("m"))
        rehang = (
            ls.join(pmins, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        hang_self = pmins.select("u", F.col("m").alias("v"))
        seen = persistent_rdd_ids(spark)
        new = rehang.union(hang_self).distinct().localCheckpoint()
        n_new = new.count()
        converged = n_new == n_edges and new.exceptAll(e).count() == 0
        unpersist_blocks(spark, prev_ids)
        prev_ids = persistent_rdd_ids(spark) - seen
        e, n_edges = new, n_new
        if converged:
            break
    else:
        raise RuntimeError(
            f"star CC did not converge in {max_iterations} rounds — "
            "O(log² n) bound exceeded; raise max_iterations"
        )
    # fixpoint edges are (node, component-min) stars; centres map to
    # themselves
    centres = e.select(F.col("v").alias("u")).distinct().withColumn(
        "component", F.col("u")
    )
    return tag_cached_inputs(
        e.withColumnRenamed("v", "component").union(centres).distinct(),
        RddBlockHandle(spark, prev_ids),
    )


def dedup_clusters(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """Cluster-canonical near-dup assignment, the production-standard
    alternative to the greedy pair-drop in :func:`deduped_corpus`:
    connected components over the minhash-LSH pair graph, every document
    labelled with the smallest doc_id of its component (itself when it
    has no near-dup). → (doc_id, cluster_id). Keeping
    ``cluster_id == doc_id`` rows reproduces one-survivor-per-cluster
    dedup even when similarity is non-transitive (A~B, B~C, A≁C)."""
    pairs = minhash_lsh_pairs(docs, text_col, threshold=threshold).select(
        "doc_a", "doc_b"
    )
    cc = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(cc.withColumnRenamed("u", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH

NUM_HASHES = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS

# Universal-hash family over a 32-bit md5-derived base hash:
# mh_i(s) = (A_i·h32(s) + B_i) mod P. One md5 per shingle (not one per
# shingle×seed — 16× less digest work, the sf0.1 hot spot), then 16
# integer mixes that stay far below int64 overflow (A < 2^24, h < 2^32).
MINHASH_P = 4294967311  # smallest prime > 2^32
MINHASH_AB: tuple[tuple[int, int], ...] = tuple(
    (1000003 + 7919 * i, 12345 + 69069 * i) for i in range(NUM_HASHES)
)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """→ (doc_id, *keep_cols, sh: array<string>, sig: array<long>). The
    signature is computed entirely array-side: zero shuffles, zero
    Python, one codegen stage over the scan. ``keep_cols`` pass through
    untouched (e.g. an event-time column for streaming watermarks)."""
    base = F.transform(
        F.col("sh"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )

    def mix(a: int, b: int):
        return lambda h: (h * a + b) % MINHASH_P

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("hs"), mix(a, b)))
            for a, b in MINHASH_AB
        ]
    )
    return (
        _doc_shingles(docs, text_col, k, keep_cols, min_tokens=k)
        .withColumn("hs", base)
        .select("doc_id", *keep_cols, "sh", sig.alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 2,
    threshold: float = 0.5,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    verify: str = "exact",
) -> DataFrame:
    """Near-dup pairs: banded-LSH candidates, then a jaccard verify.
    → (doc_a, doc_b, jaccard). Deterministic (md5 hashes), so the DuckDB
    oracle reproduces the *same* candidates — LSH false negatives affect
    recall (measured in tests), never oracle parity.

    ``verify`` picks the verification payload:

    - ``exact`` (default, the oracle-checked path): candidates are
      joined back to the full shingle SETS and scored with exact
      jaccard — the reported value is the true similarity.
    - ``signatures`` (the 100 TB path): candidates are joined back to
      the 16-long minhash SIGNATURES only, and jaccard is estimated as
      the fraction of agreeing components (the standard unbiased
      minhash estimator, stderr ≈ sqrt(j(1-j)/num_hashes)). The two
      verify joins then ship 16 longs per doc instead of every shingle
      of every candidate — at web-corpus scale the shingle arrays are
      the dominant shuffle payload of this operator. Same candidates,
      estimated values; raise num_hashes to tighten the estimate.
    """
    if verify not in ("exact", "signatures"):
        raise ValueError(f"verify must be 'exact' or 'signatures', got {verify!r}")
    rows = num_hashes // num_bands
    sigs = minhash_signatures(docs, text_col, k)
    sigs.persist()

    bands = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice(F.col("sig"), b * rows + 1, rows).alias("band_sig"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_sig")

    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    if verify == "signatures":
        sg_a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
        sg_b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
        est = F.round(
            F.aggregate(
                F.zip_with(
                    "sig_a",
                    "sig_b",
                    lambda x, y: F.when(x == y, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.lit(num_hashes),
            6,
        )
        return tag_cached_inputs(
            cand.join(sg_a, "doc_a")
            .join(sg_b, "doc_b")
            .select("doc_a", "doc_b", est.alias("jaccard"))
            .where(F.col("jaccard") >= threshold),
            sigs,
        )
    sh_a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return tag_cached_inputs(
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold),
        sigs,
    )


# ---------------------------------------------------------------------------
# Incremental dedup: persisted LSH index + new-batch probe


def _band_key_col(num_bands: int, rows: int):
    """Exploded (band, band_key) from a ``sig`` column: one md5 string
    key per band, portable to the DuckDB oracle (no engine-specific
    hash). Collisions across distinct band signatures are md5-rare and
    only ever ADD candidates, which verification then scores."""
    return F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_bands - 1)),
            lambda b: F.md5(
                F.concat_ws(
                    ",",
                    b.cast("string"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * rows + 1, rows),
                            lambda x: x.cast("string"),
                        ),
                    ),
                )
            ),
        )
    )


def build_minhash_index(
    docs: DataFrame,
    name: str,
    text_col: str = "text",
    k: int = 2,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    n_buckets: int | None = None,
) -> str:
    """Persist a corpus's LSH dedup index ONCE as two bucketed tables,
    so later batches dedup AGAINST the corpus without recomputing or
    reshuffling it — the incremental shape a rolling 100 TB corpus
    needs (each new crawl probes the standing index; rebuilding
    signatures for the full corpus per batch would dwarf the batch):

    - ``<name>_bands`` (doc_id, band_key) BUCKETED on band_key — the
      candidate join key, so probe joins read it pre-partitioned with
      no index-side exchange;
    - ``<name>_sigs`` (doc_id, sig array<long>) BUCKETED on doc_id —
      the verification payload (16 longs/doc, the minhash-estimator
      tier of ``minhash_lsh_pairs``), likewise exchange-free on its
      join key.

    Returns ``name``. Same deterministic md5 hash family as
    ``minhash_signatures`` — index and probe agree byte-for-byte with
    the DuckDB oracle.
    """
    spark = docs.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rows = num_hashes // num_bands
    sigs = minhash_signatures(docs, text_col, k).select("doc_id", "sig")
    sigs = sigs.persist()
    sigs.count()
    (
        sigs.select("doc_id", _band_key_col(num_bands, rows).alias("band_key"))
        .repartition(n_buckets, "band_key")
        .write.bucketBy(n_buckets, "band_key")
        .sortBy("band_key")
        .format("parquet")
        .saveAsTable(f"{name}_bands")
    )
    (
        sigs.repartition(n_buckets, "doc_id")
        .write.bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .format("parquet")
        .saveAsTable(f"{name}_sigs")
    )
    sigs.unpersist()
    return name


def drop_minhash_index(spark, name: str) -> None:
    for suffix in ("_bands", "_sigs"):
        spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")


def dedup_against_index(
    new_docs: DataFrame,
    name: str,
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = 2,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """Probe a new batch against a standing :func:`build_minhash_index`
    → (doc_id, dup_of, jaccard_est): new docs estimated ≥ threshold
    similar to an indexed corpus doc (minhash-estimator tier, stderr ≈
    sqrt(j(1-j)/num_hashes)). Both index joins (band candidates, sig
    verification) satisfy their distribution from the bucketed layout:
    ONLY the new batch is exchanged — index-side shuffle is zero
    regardless of corpus size. Doc-id spaces of batch and corpus are
    assumed disjoint (same-id rows are filtered defensively)."""
    spark = new_docs.sparkSession
    rows = num_hashes // num_bands
    sigs = minhash_signatures(new_docs, text_col, k).select("doc_id", "sig")
    sigs = sigs.persist()
    bands = sigs.select(
        "doc_id", _band_key_col(num_bands, rows).alias("band_key")
    )
    idx_bands = spark.table(f"{name}_bands")
    cand = (
        bands.alias("n")
        .join(idx_bands.alias("c"), "band_key")
        .where(F.col("n.doc_id") != F.col("c.doc_id"))
        .select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("c.doc_id").alias("dup_of"),
        )
        .distinct()
    )
    idx_sigs = spark.table(f"{name}_sigs").select(
        F.col("doc_id").alias("dup_of"), F.col("sig").alias("sig_c")
    )
    new_sigs = sigs.select(
        F.col("doc_id"), F.col("sig").alias("sig_n")
    )
    est = F.round(
        F.aggregate(
            F.zip_with(
                "sig_n", "sig_c", lambda x, y: F.when(x == y, 1).otherwise(0)
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(num_hashes),
        6,
    )
    return tag_cached_inputs(
        cand.join(idx_sigs, "dup_of")
        .join(new_sigs, "doc_id")
        .select("doc_id", "dup_of", est.alias("jaccard_est"))
        .where(F.col("jaccard_est") >= threshold),
        sigs,
    )


# ---------------------------------------------------------------------------
# SimHash

SIMHASH_BITS = 64
SIMHASH_BAND_BITS = 16
SIMHASH_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit simhash over distinct whitespace tokens (md5-derived token
    hashes → per-bit ±1 vote sums → sign vector packed to a long).
    → (doc_id, fp).

    The 64-bit token hash is taken as two 32-bit halves of md5 (chars
    1-8 / 9-16): a single 16-hex-char conv() would exceed signed-BIGINT
    range in the DuckDB oracle, and both engines handle 32-bit halves
    exactly. Sign bit 63 is set by adding Long.MIN_VALUE (two's
    complement) because neither engine can shift a literal 1 into it.

    Deliberately explode → groupBy(doc_id), NOT array-side: the 64 vote
    sums stay inside whole-stage codegen with map-side partial
    aggregation (rows of a doc are co-located in the scan, so the
    shuffle carries ~1 combined row per doc). The tempting zero-shuffle
    formulation (interpreted filter() passes per row) measured 3×
    SLOWER at sf0.1 — HOFs don't codegen.

    The pruned projection fans out before tokenize/md5 (layout.py) so a
    single-split source doesn't serialize the per-token digest work."""
    tok = fan_out_scan(
        docs.select("doc_id", F.col(text_col)), "doc_id"
    ).select(
        "doc_id", F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("h_lo"),
        F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long").alias("h_hi"),
    )

    def _bit(i: int) -> Column:
        half, sh = ("h_lo", i) if i < 32 else ("h_hi", i - 32)
        return F.shiftright(F.col(half), sh).bitwiseAND(F.lit(1))

    votes = [
        F.sum(F.when(_bit(i) == 1, 1).otherwise(-1)).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    fp = None
    for i in range(SIMHASH_BITS):
        weight = -(1 << 63) if i == 63 else (1 << i)
        bit = F.when(F.col(f"v{i}") > 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = bit if fp is None else fp + bit
    return agg.select("doc_id", fp.alias("fp"))


def simhash_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 6
) -> DataFrame:
    """Near-dup pairs with hamming(fp_a, fp_b) ≤ max_hamming, candidates
    from a 16-bit band join (a pair within distance 3 shares ≥1 of 4
    bands exactly — pigeonhole; wider distances are best-effort, like
    production simhash). → (doc_a, doc_b, hamming).

    Scale shape: 4×16-bit bands give 4·65536 join keys, so expected
    band-join candidate volume is O(n²/65536) per band under uniform
    fingerprints — vs O(n²/256) at the earlier 32-bit/8-bit width,
    which saturated (36% of all pairs became candidates at 500 docs).
    The arithmetic shiftright sign-extension on band 3 is masked off by
    the & 0xFFFF, identically in Spark and the DuckDB oracle."""
    fps = simhash_fingerprints(docs, text_col)
    fps.persist()
    bands = fps.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("fp"), b * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "fp", "bb.band", "bb.band_val")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    return tag_cached_inputs(
        cand.select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming),
        fps,
    )


# ---------------------------------------------------------------------------
# Eval-set decontamination


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at
    least ``min_hits`` distinct word ``k``-grams with any document of
    the (small) eval set. → (doc_id, eval_id, n_shared) for every
    contaminated (training, eval) pair.

    Scale shape: the eval set is benchmark-sized (thousands of rows),
    so its exploded shingle postings BROADCAST; the corpus-side
    posting explode then streams through a broadcast hash join — the
    100 TB corpus is never shuffled, and the only exchange is the
    final (doc_id, eval_id) count aggregation over matched postings
    (already pruned to eval-overlapping shingles). This mirrors the
    standard n-gram decontamination used for LLM training corpora,
    with k configurable (production uses 8-13; tests use small k to
    match the synthetic corpus).
    """
    train_posting = _doc_shingles(docs, text_col, k).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    eval_posting = (
        _doc_shingles(eval_docs, text_col, k)
        .select(F.col("doc_id").alias("eval_id"), F.explode("sh").alias("shingle"))
    )
    return (
        train_posting.join(F.broadcast(eval_posting), "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_hits)
    )
